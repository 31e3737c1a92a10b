package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the single right row with the greatest
  * `rightTime <= leftTime` among rows sharing the join key (the
  * "latest state at-or-before t" lookup; reference semantics derive
  * from the stream-cursor model of /root/reference/patterns/node/node.py:191-214,
  * where consumers ask for state as of an ordering value).
  *
  * Spark has no as-of primitive. The naive formulation
  * (`join on key and rt <= lt` + `row_number = 1`) shuffles twice and
  * materializes every (left, earlier-right) pair — O(n·m) per key.
  * This implementation instead unions both sides tagged with a side
  * marker, shuffles ONCE on the key, sorts each partition by
  * (time, side, tie-break) and takes a running `last(payload)` with
  * `ignoreNulls` — right rows sort before left rows at equal
  * timestamps, so "at-or-before" is inclusive. O(n+m) rows, one
  * shuffle, linear scan: survives a 100× scale-up as long as single
  * keys fit a partition (salt the key upstream for heavy hitters).
  */
object AsOfJoin {

  def latestAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      payload: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadType = right.schema(payload).dataType
    val tbType = right.schema(rightTieBreak).dataType

    val l = left
      .withColumn("_t", col(leftTime).cast("timestamp"))
      .withColumn("_tb", lit(null).cast(tbType))
      .withColumn("_p", lit(null).cast(payloadType))
      .withColumn("_side", lit(1))

    val nullLeftCols: Seq[Column] = leftCols.filterNot(_ == leftKey)
      .map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val r = right.select(
      (col(rightKey).as(leftKey) +: nullLeftCols) ++ Seq(
        col(rightTime).cast("timestamp").as("_t"),
        col(rightTieBreak).as("_tb"),
        col(payload).as("_p"),
        lit(0).as("_side")): _*)

    val w = Window.partitionBy(leftKey)
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(payload, last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(payload): _*)
  }
}
