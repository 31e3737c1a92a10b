package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (gear-hash CDC, the rolling-hash boundary
  * rule behind rsync/LBFS/FastCDC-style dedup): cut a byte stream
  * where a rolling hash of the trailing bytes hits a mask — so chunk
  * boundaries are a function of CONTENT, not position, and inserting
  * or deleting a prefix re-synchronizes after at most one chunk
  * (fixed-size chunking — [[graft.llm.Corpus.chunkDocuments]] — loses
  * every boundary after a one-byte shift). The storage/transfer-dedup
  * primitive for corpus snapshots and re-crawls: shared chunk
  * fingerprints between document versions are bytes that need not be
  * stored or shipped twice.
  *
  * The rolling state is `h = (h << 1) + gear(byte)` — a 64-bit shift
  * register, so `h` depends on only the last 64 bytes and boundary
  * decisions are position-local (deliberately NOT reset per chunk:
  * resetting would make downstream boundaries depend on the chunk
  * start and break re-synchronization). A boundary cuts when
  * `(h & mask) == 0` and the chunk has at least `minLen` bytes;
  * `maxLen` force-cuts pathological runs (e.g. constant bytes whose
  * hash never fires). Offsets/lengths are UTF-8 BYTE positions.
  *
  * Scale shape: one O(bytes) pass per row from generated code, no
  * shuffle; the chunk table (id, offset, len, fp) is what shuffles —
  * grouping it by fp is the dedup report, and that aggregation is
  * bounded by distinct content, not corpus size.
  */
object CdcOps {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic per-byte gear table (public-formula splitmix64). */
  private val gear: Array[Long] =
    Array.tabulate(256)(b => splitmix64(b.toLong + 1))

  private def fnv64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var f = 0xcbf29ce484222325L
    var i = off
    while (i < off + len) { f = (f ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    f
  }

  /** Chunks of `text` as (offset, len, fp) structs; fp = FNV-1a 64 of
    * the chunk bytes. Empty array for empty text.
    */
  def chunks(text: UTF8String, minLen: Int, maxLen: Int,
      maskBits: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out.add(new GenericInternalRow(
          Array[Any](start, len, fnv64(bytes, start, len))))
        start = i + 1
      }
      i += 1
    }
    if (start < n)
      out.add(new GenericInternalRow(
        Array[Any](start, n - start, fnv64(bytes, start, n - start))))
    new GenericArrayData(out.toArray())
  }
}

/** Codegen'd content-defined chunk list of a string column. */
case class CdcChunksExpr(child: Expression, minLen: Int, maxLen: Int,
    maskBits: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && minLen >= 1 && maxLen >= minLen &&
        maskBits >= 1 && maskBits <= 48)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks needs (string, 1<=minLen<=maxLen, 1<=maskBits<=48), " +
        s"got ${child.dataType.sql}, minLen=$minLen, maxLen=$maxLen, maskBits=$maskBits")

  override def nullSafeEval(t: Any): Any =
    CdcOps.chunks(t.asInstanceOf[UTF8String], minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcOps.chunks($c, $minLen, $maxLen, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunks {
  def chunks(text: Column, minLen: Int = 16, maxLen: Int = 256,
      maskBits: Int = 6): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(
      CdcChunksExpr(GraftShim.toExpression(spark, text), minLen, maxLen, maskBits))
  }
}
