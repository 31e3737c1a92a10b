package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions.{lit, monotonically_increasing_id, concat}
import org.apache.spark.sql.GraftShim

/** Fixed-width base-32 (base32hex alphabet, lowercase) encoding of a
  * non-negative long: 13 characters, zero-padded, so LEXICOGRAPHIC
  * order equals numeric order. Building block for the reference's
  * "unique, strictly monotonically increasing base32 string" record id
  * (/root/reference/patterns/node/node.py:291-294).
  *
  * Codegen'd Catalyst expression (not a Scala UDF) so it stays inside
  * whole-stage codegen on the write path.
  */
case class Base32Fixed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"Base32Fixed needs BIGINT, got ${child.dataType.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Base32Fixed.encode(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Base32Fixed.encode($c))")

  override protected def withNewChildInternal(c: Expression): Base32Fixed = copy(c)
}

object Base32Fixed {
  private val alphabet = "0123456789abcdefghijklmnopqrstuv".toCharArray

  /** 13 chars encode 65 bits > the 63 usable bits of a Long. */
  def encode(v: Long): String = {
    val out = new Array[Char](13)
    var x = v
    var i = 12
    while (i >= 0) { out(i) = alphabet((x & 31L).toInt); x = x >>> 5; i -= 1 }
    new String(out)
  }

  def base32(c: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(Base32Fixed(GraftShim.toExpression(spark, c)))
  }

  /** Strictly monotonic id across executions: fixed-width batch sequence
    * (catalog-issued, strictly increasing per flush) concatenated with
    * the fixed-width encoding of `monotonically_increasing_id()`
    * (partitionId << 33 | rowInPartition — increasing within the batch).
    * 26-char string; lexicographic order == (batch, partition, row).
    */
  def monotonicId(batchSeq: Long): Column =
    concat(base32(lit(batchSeq)), base32(monotonically_increasing_id()))
}
