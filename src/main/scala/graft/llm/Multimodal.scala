package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.6 L5): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract steps are per-partition batch operators.
  *
  * Images decode for REAL via the JDK's `javax.imageio` (PNG/JPEG/BMP/
  * GIF): `imageMeta` reads width/height/format from the container
  * header without materializing pixels, and `extractFeatures` with an
  * image mime fully decodes and derives features from actual pixel
  * data. Audio/video decode is STUBBED (no media libraries in this
  * environment): `fakeFeatures` derives a deterministic feature vector
  * from the bytes so the Spark-side plumbing — schema, partitioning,
  * batch shape, metadata — is real and testable. Swap the stub for a
  * real decoder (e.g. a JNI/ONNX call) without touching the plumbing.
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

  /** Deterministic tiny RGB PNG — a real image container, used to put
    * honest decodable bytes in the payload column (pixel (x,y) color is
    * an integer function of (seed, x, y), so pixel statistics are
    * reproducible in any engine that knows the formula).
    */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((seed + x * 31 + y * 17) % 256).toInt
        val g = ((seed * 7 + x * 13 + y * 29) % 256).toInt
        val b = ((seed * 3 + x * 11 + y * 23) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Attach a REAL image payload per row: a PNG whose dimensions are a
    * known function of the id column (`w = id%16+1`, `h = id*7%16+1`) so
    * downstream decode results are oracle-checkable. Encoded per
    * partition — the ingest shape of a real media pipeline.
    */
  def attachImagePayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val metaSource = idCol
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = pngBytes((id % 16).toInt + 1, ((id * 7) % 16).toInt + 1, id)
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("image/png", bytes.length, metaSource)))
      }
    }(encoder)
  }

  /** Direct container-header parse for the common formats: PNG (IHDR
    * at fixed offset), GIF (logical screen descriptor), BMP (info
    * header), JPEG (first SOF marker scan). Dimensions live at known
    * offsets in real container bytes — no decoder object, no SPI scan.
    * Returns null for anything unrecognized (caller falls back to
    * ImageIO).
    */
  private[llm] def headerMeta(bytes: Array[Byte]): (Int, Int, String) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val n = bytes.length
    if (n >= 24 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a)
      (be32(16), be32(20), "png")                     // PNG: IHDR w/h
    else if (n >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
      (le16(6), le16(8), "gif")                       // GIF: screen descriptor
    else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M')
      (le32(18), math.abs(le32(22)), "bmp")           // BMP: BITMAPINFOHEADER
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first start-of-frame
      var i = 2
      while (i + 9 < n && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return (be16(i + 7), be16(i + 5), "jpeg")   // SOFn: h then w
        i += 2 + be16(i + 2)
      }
      null
    } else null
  }

  /** Header-only image metadata decode: width / height / format read
    * from the container header WITHOUT decoding pixel data — the
    * scale-correct way to harvest image metadata from 100 TB of media
    * (IO-bound, never pixel-bound). The common containers (PNG/GIF/
    * BMP/JPEG) parse at fixed header offsets via [[headerMeta]];
    * per-image `ImageIO.getImageReaders` SPI discovery costs ~0.3 ms/
    * image, which IS the operator's cost at scale, so ImageIO is only
    * the fallback for exotic containers. Undecodable payloads yield
    * nulls rather than failing the batch.
    */
  def imageMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("img_width", IntegerType))
      .add(StructField("img_height", IntegerType))
      .add(StructField("img_format", StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val fast = headerMeta(bytes)
        val extra: Seq[Any] = if (fast != null)
          Seq(fast._1, fast._2, fast._3)
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val rd = readers.next()
            try {
              rd.setInput(iis)
              Seq(rd.getWidth(0), rd.getHeight(0), rd.getFormatName.toLowerCase)
            } catch {
              case _: java.io.IOException => Seq(null, null, null)
            } finally { rd.dispose(); iis.close() }
          } else { iis.close(); Seq(null, null, null) }
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Per-partition batched decode over the payload column: the real
    * pattern for media feature extraction (one decoder instance per
    * partition, rows processed in a batch loop). Image mimes decode for
    * REAL (`javax.imageio`): features are [width, height, mean R, mean
    * G, mean B] from actual pixels, padded with a byte-fold tail. Other
    * mimes fall back to the deterministic stub features.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 16,
      mimeCol: Option[String] = None): DataFrame = {
    val schema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val mimeIdx = mimeCol.map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      // real pipeline: initialize decoder ONCE per partition here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val mime = mimeIdx.map(r.getString).getOrElse("")
        val feats =
          if (mime.startsWith("image/")) imageFeatures(bytes, dim)
          else fakeFeatures(bytes, dim) // <- STUB: real audio/video decode goes here
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(encoder)
  }

  /** Real image decode → feature vector: [w, h, mean R, mean G, mean B]
    * from decoded pixels (0-255 scale), byte-fold tail past index 4.
    */
  def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return fakeFeatures(bytes, dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    val out = fakeFeatures(bytes, dim)
    val head = Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n)
    System.arraycopy(head, 0, out, 0, math.min(head.length, dim))
    out
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
