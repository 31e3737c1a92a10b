package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin segment keys (Li, Deng, Feng 2011): the candidate scheme
  * for COMPLETE edit-distance joins. Pigeonhole: k edits cannot touch
  * all k+1 contiguous segments of a string, so for any pair within
  * distance k at least one segment of the indexed string appears
  * VERBATIM in the other string, start-shifted by at most k. The
  * index side emits its k+1 (segIdx, ownLen, segment) keys; the probe
  * side emits, for every possible partner length in [len−k, len+k],
  * the substrings matching each segment span within the ±k shift
  * window. Keys are ~len/(k+1)-char strings pinned to a segment index
  * AND a partner length — selective where a bare q-gram join fans out
  * on stop-grams (the measured failure: 50 s at sf0.1 from " the"
  * buckets).
  *
  * Segment widths for length L: base = L/(k+1) floor; the LAST
  * (L mod (k+1)) segments take base+1 — a fixed convention both
  * kernels share. Positions are code points (matches Spark's
  * `length`/`levenshtein`).
  */
object PassJoinOps {

  private def spans(len: Int, k: Int): Array[(Int, Int)] = {
    val parts = k + 1
    val base = len / parts
    val rem = len % parts
    val out = new Array[(Int, Int)](parts)
    var p = 0
    var i = 0
    while (i < parts) {
      val w = if (i >= parts - rem) base + 1 else base
      out(i) = (p, w)
      p += w
      i += 1
    }
    out
  }

  private val segType = StructType(Seq(
    StructField("seg_i", IntegerType, nullable = false),
    StructField("seg_len", IntegerType, nullable = false),
    StructField("seg_s", StringType, nullable = false)))

  def structType: StructType = segType

  /** Index-side keys: (i, ownLen, segment) for the k+1 segments. */
  def segKeys(s: UTF8String, k: Int): ArrayData = {
    val len = s.numChars()
    if (len < k + 1) return new GenericArrayData(Array.empty[Any])
    val sp = spans(len, k)
    val out = new Array[Any](sp.length)
    var i = 0
    while (i < sp.length) {
      val (p, w) = sp(i)
      out(i) = new GenericInternalRow(
        Array[Any](i, len, s.substringSQL(p + 1, w)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Probe-side keys: for every candidate partner length
    * ll ∈ [len−k, len+k] with ll ≥ k+1, the substrings of `s` lying on
    * each of ll's segment spans shifted by −k..k (clipped to the
    * string). Deduplicated within the row.
    */
  def probeKeys(s: UTF8String, k: Int): ArrayData = {
    val len = s.numChars()
    val seen = new java.util.LinkedHashSet[(Int, Int, UTF8String)]()
    var ll = math.max(len - k, k + 1)
    while (ll <= len + k) {
      val sp = spans(ll, k)
      var i = 0
      while (i < sp.length) {
        val (p, w) = sp(i)
        if (w >= 1 && w <= len) {
          var d = -k
          while (d <= k) {
            val q = p + d
            if (q >= 0 && q + w <= len)
              seen.add((i, ll, s.substringSQL(q + 1, w)))
            d += 1
          }
        }
        i += 1
      }
      ll += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      val (i, ll, sub) = it.next()
      out(j) = new GenericInternalRow(Array[Any](i, ll, sub))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class PassJoinSegKeys(child: Expression, k: Int, probe: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(PassJoinOps.structType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_passjoin needs (string, k>=1), got ${child.dataType.sql}, k=$k")
  override def nullSafeEval(t: Any): Any =
    if (probe) PassJoinOps.probeKeys(t.asInstanceOf[UTF8String], k)
    else PassJoinOps.segKeys(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (probe) "probeKeys" else "segKeys"
    defineCodeGen(ctx, ev, c => s"graft.functions.PassJoinOps.$fn($c, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): PassJoinSegKeys =
    copy(child = newChild)
}

object PassJoin {
  def segKeys(s: Column, k: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(PassJoinSegKeys(GraftShim.toExpression(spark, s), k, probe = false))
  }
  def probeKeys(s: Column, k: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(PassJoinSegKeys(GraftShim.toExpression(spark, s), k, probe = true))
  }
}
