package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time stopword counting kernel. The HOF formulation
  * (`size(filter(split(...), w => array_contains(array(...), w)))` /
  * `size(array_intersect(array_distinct(...), array(...)))`) is
  * CodegenFallback: per-word lambda binding plus per-word array
  * allocation, which is both slow in steady state and — measured in
  * the round-9 full-suite bench — up to 6× slower again under
  * late-suite heap pressure (l76 6.0 s in-suite vs 0.33 s isolated,
  * the allocation-heavy interpreted path degrading under GC load).
  * One static call per row, a fixed handful of UTF8String.equals per
  * word, zero lambda machinery.
  */
object StopwordOps {

  private val lists =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()

  private def listFor(key: String): Array[Array[Byte]] =
    lists.computeIfAbsent(key,
      k => k.split(',').map(_.getBytes("UTF-8")))

  // Java-regex \s (ASCII): space, tab, LF, VT, FF, CR. Multi-byte
  // UTF-8 continuation/lead bytes are negative as signed bytes and
  // fall through — correct, they are never whitespace.
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 9 && b <= 13)

  /** Occurrences of any list word among the whitespace tokens of
    * `text` (`distinct = false`), or the number of DISTINCT list words
    * present (`distinct = true`) — the two semantics of the previous
    * HOF formulations (`filter` + `array_contains`, and
    * `array_intersect(array_distinct(...))`), exactly: empty tokens
    * from leading separators can never match a non-empty list word,
    * and `\s+`-run separation is byte-equivalent for ASCII whitespace.
    * One byte scan, one getBytes copy, zero per-word allocation.
    */
  def hits(text: UTF8String, listKey: String, distinct: Boolean): Int = {
    val list = listFor(listKey)
    val b = text.getBytes
    val n = b.length
    var i = 0
    var count = 0
    var mask = 0L
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isWs(b(i))) i += 1
        var j = 0
        var matched = -1
        while (matched < 0 && j < list.length) {
          val w = list(j)
          if (w.length == i - s) {
            var k = 0
            var ok = true
            while (ok && k < w.length) {
              if (w(k) != b(s + k)) ok = false
              k += 1
            }
            if (ok) matched = j
          }
          j += 1
        }
        if (matched >= 0) {
          if (distinct) mask |= 1L << matched else count += 1
        }
      }
    }
    if (distinct) java.lang.Long.bitCount(mask) else count
  }
}

/** Codegen'd stopword-hit count over a string column. */
case class StopwordHitsExpr(child: Expression, words: Seq[String],
    distinct: Boolean) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private val key = words.mkString(",")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && words.nonEmpty && words.size <= 64 &&
        words.forall(w => w.nonEmpty && !w.contains(',')))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_hits needs (string, non-empty comma-free words), " +
        s"got ${child.dataType.sql}, words=$words")

  override def nullSafeEval(t: Any): Any =
    StopwordOps.hits(t.asInstanceOf[UTF8String], key, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("stopwordKey", key, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StopwordOps.hits($c, $keyRef, $distinct)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
    copy(child = newChild)
}

object StopwordCount {
  /** Occurrence count of list words among whitespace tokens. */
  def occurrences(text: Column, words: Seq[String]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(StopwordHitsExpr(
      GraftShim.toExpression(spark, text), words, distinct = false))
  }

  /** Number of distinct list words present among whitespace tokens. */
  def distinctHits(text: Column, words: Seq[String]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(StopwordHitsExpr(
      GraftShim.toExpression(spark, text), words, distinct = true))
  }
}
