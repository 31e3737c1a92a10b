package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every k-gram, slide
  * a window of `w` consecutive hashes, keep the minimum of each window
  * (distinct, first-occurrence order). The GUARANTEE fixed sampling
  * lacks: any shared substring of at least w+k-1 words contributes at
  * least one COMMON fingerprint to both documents, so an
  * equi-join on fingerprints finds every sufficiently long overlap —
  * the plagiarism/attribution primitive between MinHash (whole-doc
  * similarity) and exact substring dedup.
  *
  * Hashes are md5 hex strings: the hash's only role is ORDERING within
  * a window (+ equality across documents), and md5 exists verbatim in
  * the DuckDB oracle, so fingerprint selection is engine-portable. A
  * production swap to xxhash64 changes constants, not structure.
  * One static kernel call per row (O(grams·w), w is small), no HOF
  * lambda overhead; scan-shaped, no shuffle — the fingerprint table
  * (id, fp) is what shuffles, and the overlap join is equi on fp.
  */
object WinnowOps {

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: UTF8String): UTF8String = {
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HEX((d(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct window minima of the per-gram md5 hashes, first-
    * occurrence order; a gram list shorter than `w` yields its single
    * overall minimum; empty in → empty out.
    */
  def winnow(grams: ArrayData, w: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[UTF8String](n)
    var i = 0
    while (i < n) { hashes(i) = md5Hex(md, grams.getUTF8String(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val lastStart = math.max(n - w, 0)
    var s = 0
    while (s <= lastStart) {
      var m = hashes(s)
      var j = s + 1
      val end = math.min(s + w, n)
      while (j < end) {
        if (hashes(j).compareTo(m) < 0) m = hashes(j)
        j += 1
      }
      seen.add(m)
      s += 1
    }
    new GenericArrayData(seen.toArray())
  }
}

/** Codegen'd winnowing fingerprint set over a gram-array column. */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow needs (array<string>, w>=1), got ${t.sql}, w=$w")
  }

  override def nullSafeEval(t: Any): Any =
    WinnowOps.winnow(t.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowOps.winnow($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object Winnow {
  def fingerprints(grams: Column, w: Int = 4): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(
      WinnowFingerprints(GraftShim.toExpression(spark, grams), w))
  }
}
