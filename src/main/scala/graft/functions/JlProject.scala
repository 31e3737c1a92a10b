package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sparse Johnson-Lindenstrauss random projection (Achlioptas 2003,
  * "Database-friendly random projections"): project `array<float>`
  * embeddings to `k` dimensions with a {+1, −1, 0}-valued matrix
  * (probabilities 1/6, 1/6, 2/3) scaled by √(3/k). The matrix entry
  * for (output j, input i) derives from a deterministic integer
  * congruence of (seed, j, i) — nothing is stored, any engine can
  * regenerate it, and 2/3 sparsity means ~d·k/3 additions per row
  * (no multiplications: entries are signs).
  *
  * Determinism contract (what makes the result hash-checkable across
  * engines): inputs quantize to integer thousandths with half-AWAY-
  * FROM-ZERO rounding (DuckDB/engine-portable, unlike Math.round's
  * half-up), the signed sum is exact 64-bit integer arithmetic, and
  * only the final rescale touches floating point — two IEEE ops in a
  * fixed order, so the doubles are bit-identical everywhere.
  *
  * Scale shape: pure scan-time codegen'd kernel, no shuffle, no state;
  * the 100 TB path for shrinking an embedding column before ANN
  * indexing or clustering (pairwise distances preserved within the JL
  * ε for k = O(ln n / ε²)).
  */
object JlProjectOps {
  def project(vec: ArrayData, k: Int, seed: Long): ArrayData = {
    val d = vec.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var s = 0L
      var i = 0
      while (i < d) {
        // (seed, j, i)-keyed Lehmer mix: two MINSTD multiplicative
        // rounds mod the Mersenne prime decorrelate the %6 residues —
        // a plain linear congruence has arithmetic-progression
        // structure mod 6 (constant-sign runs) that wrecks the JL
        // isometry
        // floorMod, not %: a negative seed (or seed*1234567 overflow)
        // would otherwise keep h negative through the Lehmer rounds and
        // collapse h%6 into [-5,0] — nearly all entries become -1,
        // destroying the {1/6,1/6,2/3} distribution and the engine
        // congruence (which assumes nonnegative residues)
        var h = java.lang.Math.floorMod(
          seed * 1234567L + i * 69069L + j * 9876543L, 2147483647L)
        h = h * 48271L % 2147483647L
        h = h * 48271L % 2147483647L
        val m = h % 6
        if (m < 2) {
          val x = vec.getFloat(i).toDouble * 1000.0
          val q = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
          s += (if (m == 0) q else -q)
        }
        i += 1
      }
      out(j) = (s / 1000.0) * math.sqrt(3.0 / k)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd JL projection over an `array<float>` column →
  * `array<double>` of `k` values.
  */
case class JlProject(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jl_project needs (array<float>, k>=1), got ${other.sql}, k=$k")
  }

  override def nullSafeEval(t: Any): Any =
    JlProjectOps.project(t.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JlProjectOps.project($c, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProjectFn {
  def jlProject(vec: Column, k: Int, seed: Long = 42L): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(JlProject(GraftShim.toExpression(spark, vec), k, seed))
  }
}
