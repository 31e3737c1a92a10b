package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over numeric array columns (float or double
  * elements per side), accumulating in double with a sequential
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
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
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
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getter(elemType(left).get, a, i)} * ${getter(elemType(right).get, b, i)};
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
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
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
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${getter(elemType(left).get, a, i)} - ${getter(elemType(right).get, b, i)};
         |    $acc += $d * $d;
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
