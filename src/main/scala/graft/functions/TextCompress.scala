package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time DEFLATE kernel for the compression-ratio quality
  * signal (CCNet/RefinedWeb-style "compression filtering"): highly
  * repetitive or templated text compresses far below natural prose,
  * random/encoded junk barely compresses at all, so
  * deflated_size / raw_size separates both failure modes with one
  * cheap, language-agnostic scan — no model, no vocabulary.
  */
object TextCompressOps {

  /** DEFLATE(BEST_SPEED, raw) size over raw size; 1.0 for empty text.
    * Deterministic for a given JVM zlib (same input → same output), and
    * the signal is used with coarse thresholds, so minor zlib-version
    * drift cannot flip a verdict in practice.
    */
  def deflateRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](4096)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** Codegen'd DEFLATE compression ratio of a text column (double;
  * 1.0 for empty strings). One static call per row — the kernel
  * pattern of [[WordShingles]]/[[MinHashSig]].
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio needs string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    TextCompressOps.deflateRatio(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextCompressOps.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object TextCompress {
  def deflateRatio(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(DeflateRatio(GraftShim.toExpression(spark, text)))
  }
}
