package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-at-a-time kernel for IVF cell assignment: the indices of the
  * `n` centroids most cosine-similar to a vector. Centroids arrive
  * pre-normalized (unit length), so argmax over plain dot products is
  * argmax over cosine — no per-row norm work. Ties break on the lower
  * centroid index for determinism.
  */
object IvfOps {
  def nearestCells(vec: ArrayData, isFloat: Boolean,
      unitCentroids: Array[Array[Double]], n: Int): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val k = unitCentroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = unitCentroids(c)
      val m = math.min(dim, ct.length)
      var d = 0.0
      var j = 0
      while (j < m) { d += v(j) * ct(j); j += 1 }
      scores(c) = d
      c += 1
    }
    val out = new Array[Int](math.min(n, k))
    val used = new Array[Boolean](k)
    var o = 0
    while (o < out.length) {
      var best = -1
      var bs = Double.NegativeInfinity
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && scores(c2) > bs) { bs = scores(c2); best = c2 }
        c2 += 1
      }
      if (best < 0) {
        // all remaining scores NaN (bad vector) — fall back to the
        // lowest unused index instead of crashing the job
        var c3 = 0
        while (best < 0 && c3 < k) { if (!used(c3)) best = c3; c3 += 1 }
      }
      used(best) = true
      out(o) = best
      o += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Codegen'd array<int> of the `n` nearest (by cosine) centroid
  * indices for a vector column. Centroids are captured in the
  * expression instance (driver-collected coarse quantizer — small by
  * design) and reach generated code via a reference object, never as
  * literal trees (see SignLshCodes for why that matters).
  */
case class NearestCells(child: Expression, unitCentroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if n >= 1 && unitCentroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs (array<float|double>, >=1 centroids, n>=1), got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    IvfOps.nearestCells(a.asInstanceOf[ArrayData], isFloat, unitCentroids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", unitCentroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfOps.nearestCells($c, $isFloat, $ref, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object Ivf {
  /** Normalize centroid rows to unit length (zero vectors pass through). */
  def normalize(centroids: Array[Array[Double]]): Array[Array[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(_ / n)
    }

  def nearestCells(vec: Column, unitCentroids: Array[Array[Double]], n: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(
      NearestCells(GraftShim.toExpression(spark, vec), unitCentroids, n))
  }
}
