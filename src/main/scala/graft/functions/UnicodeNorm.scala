package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels (NFC / NFKC), called once per row
  * from generated code — the text-canonicalization pass an LLM corpus
  * runs before fingerprinting and dedup (the same byte sequence can
  * encode visually identical text many ways; un-normalized corpora
  * under-dedup and inflate the tokenizer's vocabulary with composed/
  * decomposed twins).
  *
  * Scale shape: scan-time, embarrassingly parallel, zero shuffle. The
  * `isNormalized` fast path matters at 100 TB: real web text is
  * overwhelmingly already NFC, and the check is a single pass with no
  * allocation, so the common case costs a scan while only the rare
  * denormalized row pays the rewrite.
  */
object UnicodeNormOps {

  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** NFKC also folds compatibility forms (ligatures, fullwidth forms,
    * superscripts) — the variant tokenizer pipelines (e.g. GPT-2's
    * byte-level BPE preprocessing, SentencePiece's default) apply.
    */
  def nfkc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFKC))
  }
}

/** Codegen'd Unicode normalization of a string column. `form` is one
  * of "NFC" | "NFKC" (bound at plan time — the kernel call is a static
  * dispatch in generated code, no per-row form lookup).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && (form == "NFC" || form == "NFKC"))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize needs (string, NFC|NFKC), got ${child.dataType.sql}, form=$form")

  private def kernel: String = if (form == "NFC") "nfc" else "nfkc"

  override def nullSafeEval(t: Any): Any =
    if (form == "NFC") UnicodeNormOps.nfc(t.asInstanceOf[UTF8String])
    else UnicodeNormOps.nfkc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormOps.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNorm {
  def nfc(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(UnicodeNormalize(GraftShim.toExpression(spark, text), "NFC"))
  }

  def nfkc(text: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(UnicodeNormalize(GraftShim.toExpression(spark, text), "NFKC"))
  }
}
