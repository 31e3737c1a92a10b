package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.6 L5): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract steps are per-partition batch operators.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): `fakeFeatures` derives a deterministic feature vector
  * from the bytes so the Spark-side plumbing — schema, partitioning,
  * batch shape, metadata — is real and testable. Swap `decodeStub` for
  * a real decoder (e.g. a JNI/ONNX call) without touching the plumbing.
  */
object Multimodal {

  /** Metadata carried per media payload. */
  val payloadMeta: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", IntegerType),
    StructField("source_col", StringType)))

  /** Attach a binary payload column (+ metadata struct) derived from a
    * text column — stands in for reading real media files; the column
    * shapes are exactly what a real ingest would produce.
    */
  def attachPayload(df: DataFrame, textCol: String, mime: String = "application/octet-stream"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast(BinaryType))
      .withColumn("payload_meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        lit(textCol).as("source_col")))

  /** STUB — deterministic fake decode. A real implementation would
    * decode the media here (per partition, batched); this derives
    * `dim` floats from the payload bytes so downstream operators
    * (similarity, clustering) run end-to-end.
    */
  def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
    bytes.foreach { b => h = h * 31 + (b & 0xff) }
    var i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      i += 1
    }
    out
  }

  /** Per-partition batched "decode" over the payload column: the real
    * pattern for media feature extraction (one decoder instance per
    * partition, rows processed in a batch loop). Deterministic stub
    * features; real decoders drop in at the marked line.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val schema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // real pipeline: initialize decoder ONCE per partition here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val feats = fakeFeatures(bytes, dim) // <- STUB: real decode goes here
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(encoder)
  }

  /** Frame-sampling stub for video-like payloads: emits `n` (offset,
    * chunk) rows per payload — the explode shape a real frame sampler
    * produces.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int = 4): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame", expr(
        s"substring($payloadCol, frame_idx * greatest(octet_length($payloadCol) div $n, 1) + 1, " +
          s"greatest(octet_length($payloadCol) div $n, 1))"))
}
