package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Ordered exactly-once stream cursor over a Table
  * (/root/reference/patterns/node/node.py:18-81, 191-214):
  * consuming yields records strictly greater than the persisted offset
  * in `orderBy` order; *yielding marks consumed* (in-memory offset
  * advances per record); `checkpoint` persists mid-run; `rollback`
  * restores the last persisted offset; `rewind` restarts from the
  * beginning; `seek(v)` continues strictly after `v`. Progress is keyed
  * by (node, table, ordering) so "a table may have multiple
  * simultaneous streams with different orderings" (node.py:196-198).
  *
  * Scale: the incremental slice is expressed as a pushdown-friendly
  * `col(orderBy) > offset` filter *before* the scan, so parquet
  * row-group stats prune old data; the sort only orders the new tail.
  */
final class StreamCursor(
    table: TableHandle,
    state: State,
    orderBy: String,
    startingValue: Option[Any] = None) {

  private val stateKey = s"stream:${table.name}:$orderBy"

  /** offset persisted as string + recovered through the column type. */
  private var persisted: Option[String] =
    state.get(stateKey).map(_.toString).orElse(startingValue.map(_.toString))
  private var current: Option[String] = persisted

  private def orderCol: StructField =
    table.read.schema.find(_.name == orderBy).getOrElse(
      throw new IllegalArgumentException(
        s"stream ordering column '$orderBy' not in table '${table.name}'"))

  private def offsetLit(v: String): org.apache.spark.sql.Column =
    lit(v).cast(orderCol.dataType)

  /** The unconsumed slice as a DataFrame (incremental batch read). */
  def df(): DataFrame = {
    val base = table.read
    current match {
      case Some(v) => base.filter(col(orderBy) > offsetLit(v)).orderBy(col(orderBy))
      case None => base.orderBy(col(orderBy))
    }
  }

  /** One-record-at-a-time consumption; each yielded record advances the
    * in-memory offset (node.py:40-52).
    */
  def records(): Iterator[Map[String, Any]] = {
    val slice = df()
    val cols = slice.columns
    val idx = cols.indexOf(orderBy)
    slice.toLocalIterator().asScala.map { r: Row =>
      current = Some(String.valueOf(r.get(idx)))
      cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }
  }

  /** Typed consumption helper for Dataset-style processing. */
  def consumeRows(f: Row => Unit): Unit = {
    val slice = df()
    val idx = slice.columns.indexOf(orderBy)
    slice.toLocalIterator().asScala.foreach { r =>
      current = Some(String.valueOf(r.get(idx)))
      f(r)
    }
  }

  /** Persist progress now (node.py:54-58). */
  def checkpoint(): Unit = {
    current.foreach(v => state.set(stateKey, v))
    persisted = current
  }

  /** Revert to last checkpoint / start of execution (node.py:60-63). */
  def rollback(): Unit = { current = persisted }

  /** Back to the beginning (node.py:65-68). */
  def rewind(): Unit = { current = None; persisted = None; state.delete(stateKey) }

  /** Continue strictly after `value` — exclusive (node.py:70-76). */
  def seek(value: Any): Unit = { current = Some(String.valueOf(value)) }

  def position: Option[String] = current
}

object StreamCursor {
  /** as_stream(order_by=None): default ordering from schema roles —
    * strictly-monotonic first, else created; error if neither
    * (node.py:191-214).
    */
  def forTable(
      table: TableHandle,
      state: State,
      orderBy: Option[String] = None,
      startingValue: Option[Any] = None): StreamCursor = {
    val ord = orderBy
      .orElse(table.meta.orderings.get("monotonic"))
      .orElse(table.meta.orderings.get("created"))
      .getOrElse(throw new IllegalArgumentException(
        s"table '${table.name}' has no ordering role; pass order_by"))
    // Offsets round-trip through strings (State stores them as text):
    // lossless for numeric/string/date/timestamp/boolean, silently
    // corrupting for binary/struct/array/map — reject those up front.
    // (Schema check only once the table has data; a cursor may be
    // created ahead of the first append.)
    (if (table.exists) table.read.schema else StructType(Nil)).find(_.name == ord).foreach { f =>
      f.dataType match {
        case _: NumericType | StringType | DateType | TimestampType |
            TimestampNTZType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"stream ordering column '$ord' of table '${table.name}' has " +
            s"unsupported type ${other.simpleString}: offsets persist as " +
            "strings, which round-trips only atomic numeric/string/" +
            "date/timestamp/boolean columns")
      }
    }
    new StreamCursor(table, state, ord, startingValue)
  }
}
