package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-at-a-time kernel computing ALL sign-LSH table codes of a vector
  * in one pass. The Column formulation (`when(dot(vec, array(lit...)) >
  * 0, ...)` per bit) builds nTables×nBits dot expressions each carrying
  * a dim-element literal array — a ~10k-node Catalyst tree whose
  * analysis/codegen dominated l12b's runtime (6.6 s for 600 vectors);
  * here the planes live in a process-level cache and the per-row work
  * is a tight double loop.
  */
object SignLshOps {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Int, Int, Int), Array[Array[Double]]]()

  /** Table t uses the same deterministic Gaussian planes as
    * `Similarity.hyperplanes(dim, nBits, seed + t)` — bit b of table
    * t's code is set iff dot(vec, plane[b]) > 0, matching
    * `Similarity.lshBucket`.
    */
  private def planes(seed: Long, nTables: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nTables, nBits, dim), _ =>
      (0 until nTables).toArray.flatMap { t =>
        val rng = new scala.util.Random(seed + t)
        Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
      })

  def codes(vec: ArrayData, isFloat: Boolean, nTables: Int, nBits: Int,
      seed: Long): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val pl = planes(seed, nTables, nBits, dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0L
      var b = 0
      while (b < nBits) {
        val p = pl(t * nBits + b)
        var d = 0.0
        var k = 0
        while (k < dim) { d += v(k) * p(k); k += 1 }
        if (d > 0) code |= (1L << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd array<long> of `nTables` sign-LSH bucket codes (`nBits`
  * bits each) for a float/double vector column — the candidate-
  * generation kernel of `Similarity.nearDupPairs`.
  */
case class SignLshCodes(child: Expression, nTables: Int, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if nTables >= 1 && nBits >= 1 && nBits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_lsh needs (array<float|double>, tables>=1, 1<=bits<=62), " +
        s"got ${other.sql}, tables=$nTables, bits=$nBits")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    SignLshOps.codes(a.asInstanceOf[ArrayData], isFloat, nTables, nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshOps.codes($c, $isFloat, $nTables, $nBits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SignLshCodes =
    copy(child = newChild)
}

object SignLsh {
  def codes(vec: Column, nTables: Int, nBits: Int, seed: Long = 42L): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(
      SignLshCodes(GraftShim.toExpression(spark, vec), nTables, nBits, seed))
  }
}
