package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid 2011): split a
  * d-dim vector into `m` subvectors, quantize each against its own
  * `ksub`-centroid codebook (L2 nearest, k-means-trained), store only
  * the m byte codes — `d·4 / m` bytes-to-bytes compression (64-dim
  * float → 8 bytes at m=8). Search is ADC (asymmetric distance
  * computation): per query, one dot-product table of m×ksub entries;
  * each corpus code then scores with m table lookups — no float
  * vector is touched until the exact rerank of the shortlist.
  *
  * All three kernels are one static call per row from generated code;
  * codebooks are driver-trained (centroids only — the
  * [[graft.llm.Similarity.trainIvfCentroids]] contract) and reach the
  * generated code as expression-captured references.
  */
object PqOps {

  @inline private def read(vec: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)

  /** m byte codes: per subspace, the L2-nearest codebook centroid
    * (ties to the lower index). Codebooks index as cb(j)(c)(dim).
    */
  /** Total dimensionality the codebooks expect. */
  private def totalDim(cb: Array[Array[Array[Double]]]): Int = {
    var d = 0
    var j = 0
    while (j < cb.length) { d += cb(j)(0).length; j += 1 }
    d
  }

  def encode(vec: ArrayData, isFloat: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    // a vector shorter than the trained dimensionality cannot encode —
    // null, not an out-of-bounds read on a ragged corpus
    if (vec.numElements() < totalDim(cb)) return null
    val m = cb.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val book = cb(j)
      val dsub = book(0).length
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val ct = book(c)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = read(vec, isFloat, off + t) - ct(t)
          d += diff * diff
          t += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-query ADC dot table, flat layout `tbl(j·ksub + c) =
    * dot(q_subⱼ, cb(j)(c))`.
    */
  def adcTable(vec: ArrayData, isFloat: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    if (vec.numElements() < totalDim(cb)) return null
    val m = cb.length
    val ksub = cb(0).length
    val out = new Array[Double](m * ksub)
    var j = 0
    var off = 0
    while (j < m) {
      val book = cb(j)
      val dsub = book(0).length
      var c = 0
      while (c < ksub) {
        val ct = book(c)
        var d = 0.0
        var t = 0
        while (t < dsub) { d += read(vec, isFloat, off + t) * ct(t); t += 1 }
        out(j * ksub + c) = d
        c += 1
      }
      off += dsub
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC approximate cosine numerator/denominator fold:
    * `Σⱼ tbl(j·ksub + codeⱼ) / sqrt(Σⱼ |cb(j)(codeⱼ)|²)` — the
    * reconstructed-vector cosine against the query, missing only the
    * query norm (a plain column the caller divides by). `normsSq` is
    * the constant per-centroid squared-norm table, flat like the dot
    * table.
    */
  def score(tbl: ArrayData, code: ArrayData, normsSq: Array[Double],
      ksub: Int): Double = {
    // codes may come from PERSISTED postings — treat them as untrusted:
    // a code outside the trained book or a code/table length mismatch
    // yields NaN (callers filter !isnan), never an out-of-bounds read
    val m = math.min(code.numElements(), tbl.numElements() / ksub)
    if (m < code.numElements()) return Double.NaN
    var dot = 0.0
    var n2 = 0.0
    var j = 0
    while (j < m) {
      val c = code.getByte(j) & 0xff
      if (c >= ksub) return Double.NaN
      dot += tbl.getDouble(j * ksub + c)
      n2 += normsSq(j * ksub + c)
      j += 1
    }
    val denom = math.sqrt(n2)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if cb.nonEmpty && cb.forall(b => b.length == cb(0).length && b.length <= 128) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double> and <=128 centroids/book, got ${other.sql}")
  }
  override def nullSafeEval(t: Any): Any =
    PqOps.encode(t.asInstanceOf[ArrayData], isFloat, cb)
  // nullSafeCodeGen, not defineCodeGen: the kernel returns null for
  // vectors shorter than the trained dimensionality, and the simple
  // variant's generated assignment assumes non-null results
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PqOps.encode($c, $isFloat, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class PqAdcTable(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if cb.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table needs array<float|double>, got ${other.sql}")
  }
  override def nullSafeEval(t: Any): Any =
    PqOps.adcTable(t.asInstanceOf[ArrayData], isFloat, cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PqOps.adcTable($c, $isFloat, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

case class PqScore(left: Expression, right: Expression,
    normsSq: Array[Double], ksub: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) if ksub >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_score needs (array<double> table, array<tinyint> code), got $other")
    }
  override def nullSafeEval(t: Any, c: Any): Any =
    PqOps.score(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], normsSq, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNormsSq", normsSq, "double[]")
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.functions.PqOps.score($t, $c, $ref, $ksub)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqScore =
    copy(left = newLeft, right = newRight)
}

object Pq {
  def encode(vec: Column, cb: Array[Array[Array[Double]]]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(PqEncode(GraftShim.toExpression(spark, vec), cb))
  }
  def adcTable(vec: Column, cb: Array[Array[Array[Double]]]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(PqAdcTable(GraftShim.toExpression(spark, vec), cb))
  }
  def score(table: Column, code: Column, cb: Array[Array[Array[Double]]]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val ksub = cb(0).length
    val normsSq = cb.flatMap(_.map(ct => ct.map(x => x * x).sum))
    GraftShim.toColumn(PqScore(
      GraftShim.toExpression(spark, table),
      GraftShim.toExpression(spark, code), normsSq, ksub))
  }
}
