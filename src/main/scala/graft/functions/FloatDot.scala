package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over numeric array columns (float, double,
  * or tinyint elements per side — the int8 posting codes of the IVF
  * index score WITHOUT a per-pair cast-to-double array allocation,
  * which would also rebuild the array as a generic one and forfeit
  * the word-level null scan), accumulating in double with a sequential
  * left-to-right fold — the same order `aggregate(zip_with(...))`
  * folds in and the same order DuckDB's `list_sum(list_transform(
  * list_zip(...)))` oracle folds in, so results stay bit-identical
  * while the evaluation moves from the interpreted CodegenFallback
  * higher-order-function path into whole-stage codegen (~4× on the
  * brute-force KNN scan; see BASELINE.md).
  *
  * NULL semantics match the zip_with formulation exactly: a length
  * mismatch (zip_with pads the shorter side with null) or a null
  * element propagates NULL — never a silently-truncated number.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Ragged lengths / null elements yield NULL even when the array
  // columns themselves are non-nullable.
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(ByteType, _) => Some(ByteType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double|tinyint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, ta, i) * get(b, tb, i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // The null test must NOT touch individual elements on the hot
      // path: per-element isNullAt (whether interleaved in the FMA loop
      // or as its own scan) costs the similarity family 50-60 % — see
      // VectorKernels.anyNullFn, which decides a whole UnsafeArrayData
      // in (n+63)/64 word loads. Elided entirely when both sides are
      // statically containsNull=false.
      val nullScan =
        if (!VectorKernels.mayHaveNullElements(left, right)) ""
        else {
          val fn = VectorKernels.anyNullFn(ctx)
          s"if ($fn($a, $n) || $fn($b, $n)) { ${ev.isNull} = true; }"
        }
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ${getter(elemType(left).get, a, i)} * ${getter(elemType(right).get, b, i)};
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Shared codegen helpers for the elementwise vector kernels. */
private[functions] object VectorKernels {
  /** False only when BOTH array types statically declare
    * containsNull=false — then the per-element null scan can be elided
    * at codegen time (literal `array(...)` columns, post-filter
    * constructions). Parquet-sourced arrays arrive containsNull=true
    * even when no element is ever null, so the common path keeps the
    * (word-level, FP-free) runtime scan.
    */
  def mayHaveNullElements(left: Expression, right: Expression): Boolean = {
    def cn(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, c) => c
      case _ => true
    }
    cn(left) || cn(right)
  }

  /** Registers (once per codegen context) and returns the name of a
    * static helper `boolean <fn>(ArrayData a, int n)` that answers
    * "does any of the first n elements carry a null?".
    *
    * Per-element `isNullAt` inside (or next to) the multiply-accumulate
    * loop costs the similarity family 50-60 % (round-12 A/B: l12
    * 2.11 s clean vs 3.10 s interleaved vs 3.37 s split-scan on the
    * same host) — a bitmap bit-test per element is as expensive as the
    * FMA itself. Instead, for [[UnsafeArrayData]] — the post-shuffle /
    * post-join representation, i.e. every all-pairs hot path — OR the
    * null-bitmap WORDS directly: the format is [8-byte numElements]
    * [null bits, 8-byte-word aligned, zero-initialized by
    * UnsafeArrayWriter] [values], so `(n+63)/64` long loads decide the
    * whole array (~1.5 % of the FMA loop, amortized). Other impls
    * (ColumnarArray from a vectorized parquet scan, GenericArrayData
    * from interpreted HOFs) keep the per-element scan, still OUTSIDE
    * the FP loop. KernelProperties pins the layout assumption against
    * the interpreted eval across word boundaries (n = 63/64/65…).
    */
  def anyNullFn(ctx: CodegenContext): String = {
    // The word-OR fast path below hard-codes UnsafeArrayData's byte
    // layout (null-bitmap words at baseOffset+8, tail bits beyond
    // numElements zero-initialized by UnsafeArrayWriter). That holds
    // for every Spark 4.x writer and is pinned at runtime by
    // KernelProperties' word-boundary tests (n = 63/64/65…) — but a
    // Spark major upgrade could change the format or leave garbage
    // tail bits and silently flip results to spurious NULLs. Fail
    // LOUDLY on an unvalidated Spark line instead.
    require(org.apache.spark.SPARK_VERSION.startsWith("4."),
      s"VectorKernels.anyNullFn assumes the Spark 4.x UnsafeArrayData " +
        s"layout; re-validate KernelProperties against Spark " +
        s"${org.apache.spark.SPARK_VERSION} before lifting this check")
    // freshName per expression instance: addNewFunction does not dedupe
    // by name, so a plan with several kernels would otherwise generate
    // duplicate methods.
    val fn = ctx.freshName("graftAnyNullInArray")
    ctx.addNewFunction(fn,
      s"""
         |private boolean $fn(
         |    org.apache.spark.sql.catalyst.util.ArrayData arr, int n) {
         |  if (n == 0) return false;
         |  if (arr instanceof org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) {
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData u =
         |      (org.apache.spark.sql.catalyst.expressions.UnsafeArrayData) arr;
         |    Object bo = u.getBaseObject();
         |    long off = u.getBaseOffset() + 8L;
         |    int words = (n + 63) >>> 6;
         |    long bits = 0L;
         |    for (int w = 0; w < words; w++) {
         |      bits |= org.apache.spark.unsafe.Platform.getLong(bo, off + (((long) w) << 3));
         |    }
         |    return bits != 0L;
         |  }
         |  for (int i = 0; i < n; i++) {
         |    if (arr.isNullAt(i)) return true;
         |  }
         |  return false;
         |}
       """.stripMargin)
  }
}

object FloatDot {
  def dot(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(FloatDot(
      GraftShim.toExpression(spark, a), GraftShim.toExpression(spark, b)))
  }
}

/** Codegen'd squared Euclidean distance Σ(aᵢ−bᵢ)² over numeric array
  * columns — the elementwise-fold sibling of [[FloatDot]], with the
  * SAME left-to-right accumulation order as the interpreted
  * `aggregate(zip_with(a, b, (p,q) => (p−q)²))` formulation it
  * replaces, so results are bit-identical while the evaluation joins
  * whole-stage codegen. (Expanding into dot(a,a) − 2·dot(a,b) +
  * dot(b,b) would be faster still but changes the floating-point
  * rounding — not worth breaking the determinism contract.)
  *
  * NULL semantics match the zip_with formulation exactly: a length
  * mismatch or a null element propagates NULL (see [[FloatDot]]).
  */
case class FloatSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(ByteType, _) => Some(ByteType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist needs array<float|double|tinyint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = get(a, ta, i) - get(b, tb, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      // Word-level null scan kept out of the FP loop — see
      // FloatDot.doGenCode / VectorKernels.anyNullFn.
      val nullScan =
        if (!VectorKernels.mayHaveNullElements(left, right)) ""
        else {
          val fn = VectorKernels.anyNullFn(ctx)
          s"if ($fn($a, $n) || $fn($b, $n)) { ${ev.isNull} = true; }"
        }
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $d = ${getter(elemType(left).get, a, i)} - ${getter(elemType(right).get, b, i)};
         |      $acc += $d * $d;
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSqDist =
    copy(left = newLeft, right = newRight)
}

object FloatSqDist {
  def sqDist(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(FloatSqDist(
      GraftShim.toExpression(spark, a), GraftShim.toExpression(spark, b)))
  }
}

/** Fused single-pass cosine similarity: Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) with
  * all three sums accumulated in ONE loop over the pair of arrays.
  *
  * Bit-identical to the `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * composition it replaces — each of the three accumulators still folds
  * left-to-right independently, and the final expression applies the
  * same `java.lang.Math.sqrt` / double division in the same order — but
  * one pass instead of three (the composition re-reads both arrays
  * three times per pair; on the all-pairs scans — l12, l05, l115 — the
  * array element loads ARE the workload), and one null scan per side
  * instead of three. NULL semantics match the composition: ragged
  * lengths or a null element propagate NULL (in the composition the
  * dot(a,b) term already nulls the division). One DELIBERATE divergence:
  * the division is IEEE double division (zero-norm / empty vectors →
  * NaN or Inf, same as the DuckDB list-fold oracle), whereas the
  * Column-level composition under Spark 4's default ANSI mode THROWS
  * DIVIDE_BY_ZERO on a zero-norm vector — a per-row crash hazard at
  * corpus scale (vecAudit counts n_zero_norm for exactly this reason).
  * Callers that guard NaN (e.g. nan-robust KNN) keep their guards.
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(ByteType, _) => Some(ByteType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine needs array<float|double|tinyint> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, ta, i); val y = get(b, tb, i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nullScan =
        if (!VectorKernels.mayHaveNullElements(left, right)) ""
        else {
          val fn = VectorKernels.anyNullFn(ctx)
          s"if ($fn($a, $n) || $fn($b, $n)) { ${ev.isNull} = true; }"
        }
      s"""
         |int $n = $a.numElements();
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = ${getter(elemType(left).get, a, i)};
         |      double $y = ${getter(elemType(right).get, b, i)};
         |      $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |    }
         |  }
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}

object FloatCosine {
  def cosine(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(FloatCosine(
      GraftShim.toExpression(spark, a), GraftShim.toExpression(spark, b)))
  }
}
