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
  * data. Audio decodes for REAL too (zero-dependency RIFF/WAVE parse:
  * `audioMeta` walks chunk headers, `wavFeatures` folds the actual PCM
  * samples); video parses its REAL container timing (`videoMeta` walks
  * the ISO-BMFF box tree to `mvhd`) while frame/pixel decode remains
  * STUBBED (no video codec in this environment): `fakeFeatures`
  * derives a deterministic feature vector from the bytes so the
  * Spark-side plumbing — schema, partitioning, batch shape, metadata —
  * is real and testable. Swap the stub for a real decoder (e.g. a
  * JNI/ONNX call) without touching the plumbing.
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

  /** Deterministic PCM WAV — a real RIFF/WAVE container (16-bit PCM,
    * canonical 44-byte header + data chunk; sample i of channel c is an
    * integer function of (seed, i, c), so sample statistics are
    * reproducible in any engine that knows the formula).
    */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Int,
      seed: Long): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)         // PCM, channels
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples * channels) {
      bb.putShort((((seed + i * 2654435761L) % 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Attach a REAL audio payload per row: a PCM WAV whose header fields
    * are a known function of the id column (`sample_rate = 8000·(id%3+1)`,
    * `channels = id%2+1`, `n_samples = 800·(id%5+1)`) so downstream
    * decode results are oracle-checkable.
    */
  def attachAudioPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = wavBytes(8000 * ((id % 3).toInt + 1), (id % 2).toInt + 1,
          800 * ((id % 5).toInt + 1), id)
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("audio/wav", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** Deterministic mono 16-bit sine-tone WAV (sample i =
    * round(A·sin(2π·f·i/sr))) — the planted fixture for
    * [[audioBandEnergy]]'s decode-verified tone detection.
    */
  def toneWavBytes(sampleRate: Int, nSamples: Int, freqHz: Double,
      amplitude: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(nSamples * 2)
    var i = 0
    while (i < nSamples) {
      bb.putShort(math.round(
        amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Attach a mono sine-tone payload per row, tone frequency
    * `400·(id%8+1)` Hz at 8 kHz (all under Nyquist) — downstream band
    * detection is verifiable against the plant.
    */
  def attachTonePayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = toneWavBytes(8000, 2000, 400.0 * (id % 8 + 1), 12000)
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("audio/wav", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** Per-payload spectral band energy via the Goertzel algorithm (the
    * single-bin DFT used when only a handful of frequencies matter —
    * tone/DTMF detection, hum checks, bandwidth QC): for each target
    * frequency, one O(N) recurrence over the decoded PCM samples; no
    * FFT library, no copy of the sample array. Emits the per-band
    * power (normalized so the strongest band is 1.0), the dominant
    * band index, and its frequency; null row-stats on undecodable
    * payloads (same liveness rules as [[audioStats]]).
    *
    * Scale shape: pure per-row CPU linear in media bytes × bands, no
    * shuffle — embarrassingly parallel scan work like every decode op
    * here. Detection results are spec-verified against planted tones
    * (trig is not bit-portable across engines, so no SQL oracle — the
    * argmax, unlike the raw powers, is stable).
    */
  def audioBandEnergy(df: DataFrame, payloadCol: String,
      bandsHz: Array[Double]): DataFrame = {
    require(bandsHz.nonEmpty, "at least one target band required")
    val schema = df.schema
      .add(StructField("band_power", ArrayType(DoubleType)))
      .add(StructField("dominant_band", IntegerType))
      .add(StructField("dominant_freq", DoubleType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val m = wavMeta(bytes)
        val dc = if (m == null || m._3 != 16) null else wavDataChunk(bytes)
        val extra: Seq[Any] =
          if (dc == null || dc(1) < 2) Seq(null, null, null)
          else {
            val bb = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val (dataOff, dataSize) = (dc(0), dc(1))
            val channels = m._2
            val sr = m._1.toDouble
            val nFrames = dataSize / 2 / channels
            val powers = bandsHz.map { f =>
              val coeff = 2.0 * math.cos(2.0 * math.Pi * f / sr)
              var (s1, s2) = (0.0, 0.0)
              var i = 0
              while (i < nFrames) {
                // mono-fold: average channels at frame i
                var acc = 0.0
                var c = 0
                while (c < channels) {
                  acc += bb.getShort(dataOff + (i * channels + c) * 2)
                  c += 1
                }
                val s0 = acc / channels + coeff * s1 - s2
                s2 = s1; s1 = s0
                i += 1
              }
              s1 * s1 + s2 * s2 - coeff * s1 * s2
            }
            val maxP = powers.max
            val dom = powers.indexOf(maxP)
            val norm =
              if (maxP > 0) powers.map(_ / maxP).toSeq else powers.toSeq
            Seq(norm, dom, bandsHz(dom))
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** RIFF/WAVE chunk walk: (sampleRate, channels, bitsPerSample,
    * nSamples) from the fmt and data chunk headers — no sample data is
    * touched. Null for anything that isn't a WAV.
    *
    * Corrupt media is the NORM in crawled corpora, so the walk is
    * hardened for liveness: chunk sizes are untrusted 32-bit values — a
    * negative size (e.g. 0xFFFFFFF8) would make the cursor non-advance
    * (infinite loop: a hung executor task at 100 TB), so it returns
    * null instead; the cursor advances in 64-bit arithmetic (no Int
    * overflow wraparound); and a declared data size larger than the
    * remaining payload is clamped to the actual bytes, so n_samples is
    * honest on truncated files.
    */
  private[llm] def wavMeta(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def fourcc(i: Int): String =
      new String(bytes, i, 4, "US-ASCII")
    val n = bytes.length
    if (n < 12 || fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return null
    var (sr, ch, bits, dataSize) = (-1, -1, -1, -1L)
    var i = 12L
    while (i + 8 <= n) {
      val p = i.toInt
      val (id, size) = (fourcc(p), le32(p + 4))
      if (size < 0) return null // corrupt unsigned-32 size
      if (id == "fmt " && i + 24 <= n) {
        ch = le16(p + 10); sr = le32(p + 12); bits = le16(p + 22)
      } else if (id == "data")
        dataSize = math.min(size.toLong, n - i - 8)
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    // sr == 0 is as corrupt as a negative size: downstream consumers
    // divide by it (resample's frame math) or seed trig with ∞
    // (Goertzel's 2πf/sr → NaN powers → argmax -1)
    if (sr <= 0 || ch <= 0 || bits <= 0 || dataSize < 0) return null
    val bytesPerFrame = ch.toLong * bits / 8
    if (bytesPerFrame <= 0) null
    else (sr, ch, bits, dataSize / bytesPerFrame)
  }

  /** Locate the PCM data chunk: (offset, size clamped to the payload),
    * or null if absent/corrupt — the shared hardened walk behind
    * [[wavFeatures]] and [[audioStats]] (same liveness rules as
    * [[wavMeta]]).
    */
  private[llm] def wavDataChunk(bytes: Array[Byte]): Array[Int] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val n = bytes.length
    var i = 12L
    while (i + 8 <= n) {
      val p = i.toInt
      val id = new String(bytes, p, 4, "US-ASCII")
      val size = le32(p + 4)
      if (size < 0) return null
      if (id == "data")
        return Array(p + 8, math.min(size.toLong, n - i - 8).toInt)
      i += 8L + size + (size & 1)
    }
    null
  }

  /** Header-only audio metadata decode: sample rate / channels / bit
    * depth / sample count read from the container header WITHOUT
    * touching sample data — the scale-correct metadata harvest over
    * binary audio columns (IO-bound, never decoder-bound), sibling of
    * [[imageMeta]]. Unrecognized payloads yield nulls.
    */
  def audioMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("audio_channels", IntegerType))
      .add(StructField("bit_depth", IntegerType))
      .add(StructField("n_samples", LongType))
      .add(StructField("audio_format", StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = wavMeta(r.getAs[Array[Byte]](payloadIdx))
        val extra: Seq[Any] = if (m != null)
          Seq(m._1, m._2, m._3, m._4, "wav") else Seq(null, null, null, null, null)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Real WAV decode → feature vector: [sample_rate, channels,
    * n_samples, mean amplitude, RMS] from the actual PCM samples,
    * byte-fold tail past index 4 — the audio sibling of
    * [[imageFeatures]] (the former stub branch).
    */
  def wavFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val m = wavMeta(bytes)
    if (m == null || m._3 != 16) return fakeFeatures(bytes, dim)
    val dc = wavDataChunk(bytes)
    if (dc == null) return fakeFeatures(bytes, dim)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val (dataOff, dataSize) = (dc(0), dc(1))
    var (sum, sumSq, k) = (0.0, 0.0, 0)
    val nVals = dataSize / 2
    while (k < nVals) {
      val v = bb.getShort(dataOff + k * 2).toDouble
      sum += v; sumSq += v * v; k += 1
    }
    val out = fakeFeatures(bytes, dim)
    val head = Array[Float](m._1.toFloat, m._2.toFloat, m._4.toFloat,
      if (nVals > 0) (sum / nVals).toFloat else 0f,
      if (nVals > 0) math.sqrt(sumSq / nVals).toFloat else 0f)
    System.arraycopy(head, 0, out, 0, math.min(head.length, dim))
    out
  }

  /** FULL PCM decode → per-payload signal statistics: every sample of
    * the data chunk is read and folded into integer sums, so the
    * derived doubles (mean / RMS / clip fraction / silence fraction)
    * are bit-reproducible in any engine that decodes the same samples
    * — which is what makes this the first hash-checkable full-decode
    * media operator (the planted fixtures' samples are an integer
    * formula of (seed, i), so a SQL oracle can regenerate them).
    *
    * Scale shape: pure per-row CPU linear in media bytes, no shuffle,
    * embarrassingly parallel — at 100 TB the cost IS the decode, which
    * is the honest floor for signal-level audio QC (unlike the
    * header-only [[audioMeta]] harvest). Clip = |s| >= `clipAbs`
    * (near full-scale 16-bit), silence = |s| < `silenceAbs`.
    */
  def audioStats(df: DataFrame, payloadCol: String,
      clipAbs: Int = 32000, silenceAbs: Int = 512): DataFrame = {
    val schema = df.schema
      .add(StructField("n_vals", LongType))
      .add(StructField("mean_amp", DoubleType))
      .add(StructField("rms_amp", DoubleType))
      .add(StructField("clip_frac", DoubleType))
      .add(StructField("silence_frac", DoubleType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val m = wavMeta(bytes)
        val dc = if (m == null || m._3 != 16) null else wavDataChunk(bytes)
        val extra: Seq[Any] = if (dc == null)
          Seq(null, null, null, null, null)
        else if (dc(1) < 2)
          // structurally valid WAV with an empty data chunk: report the
          // zero sample count but null stats (0.0/0 would be NaN)
          Seq[Any](0L, null, null, null, null)
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val (dataOff, dataSize) = (dc(0), dc(1))
          // integer sums are exact (|s| <= 2^15, counts << 2^23), so
          // the double divisions below are order-independent
          var (sum, sumSq, clip, silent, k) = (0L, 0L, 0L, 0L, 0)
          val nVals = dataSize / 2
          while (k < nVals) {
            val v = bb.getShort(dataOff + k * 2).toLong
            sum += v; sumSq += v * v
            val a = math.abs(v)
            if (a >= clipAbs) clip += 1
            if (a < silenceAbs) silent += 1
            k += 1
          }
          val n = nVals.toDouble
          // Seq[Any] — a bare Seq would numerically widen the Long to
          // Double and break the BIGINT column at encode time
          Seq[Any](nVals.toLong, sum / n, math.sqrt(sumSq / n), clip / n,
            silent / n)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Deterministic "speech-like" PCM WAV: sine bursts separated by
    * true silence — nBursts = id%3+1, burst i spans
    * [200+i·500, 500+i·500) ms at 8 kHz — so a voice-activity
    * detector's output is verifiable against the plant.
    */
  def speechWavBytes(docId: Long): Array[Byte] = {
    val sr = 8000
    val nBursts = (docId % 3 + 1).toInt
    val totalMs = 200 + nBursts * 500
    val n = sr * totalMs / 1000
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sr).putInt(sr * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val ms = i * 1000L / sr
      val inBurst = (ms - 200) >= 0 && ((ms - 200) % 500) < 300 &&
        ms < 200 + nBursts * 500 - 200
      val v = if (inBurst)
        math.round(12000 * math.sin(2 * math.Pi * 440.0 * i / sr)).toShort
      else 0.toShort
      bb.putShort(v)
      i += 1
    }
    bb.array()
  }

  /** Attach the speech-like payload per row (see [[speechWavBytes]]). */
  def attachSpeechPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = speechWavBytes(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("audio/wav", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** Energy-threshold voice-activity segmentation over decoded PCM:
    * the audio corpus-prep step that finds speech spans (and drops
    * dead air) before transcription or alignment. Windows of
    * `frameMs`; a window is ACTIVE iff its mean-square amplitude meets
    * `thresholdAmp`² — decided in exact integer arithmetic
    * (`sumSq ≥ thr²·nWindowSamples`), so the segmentation is
    * bit-reproducible; runs of active windows shorter than
    * `minSegFrames` are dropped (blip suppression). Emits window
    * counts, the active fraction, and the merged [start_ms, end_ms)
    * segment list; null columns on undecodable payloads, zero counts
    * on a valid-but-empty data chunk (the [[audioStats]] liveness
    * rules).
    *
    * Scale shape: one O(samples) pass per row inside `mapPartitions`
    * (binary decode has no expression form), no shuffle, no state —
    * embarrassingly parallel scan work, the honest floor for
    * signal-level audio segmentation at 100 TB.
    */
  def vadSegments(df: DataFrame, payloadCol: String,
      frameMs: Int = 20, thresholdAmp: Int = 1000,
      minSegFrames: Int = 2): DataFrame = {
    require(frameMs > 0 && thresholdAmp >= 0 && minSegFrames >= 1)
    val segType = ArrayType(StructType(Seq(
      StructField("start_ms", LongType),
      StructField("end_ms", LongType))), containsNull = false)
    val schema = df.schema
      .add(StructField("n_frames", LongType))
      .add(StructField("n_active", LongType))
      .add(StructField("active_frac", DoubleType))
      .add(StructField("n_segments", LongType))
      .add(StructField("segments", segType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val thrSq = thresholdAmp.toLong * thresholdAmp
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val m = wavMeta(bytes)
        val dc = if (m == null || m._3 != 16) null else wavDataChunk(bytes)
        val extra: Seq[Any] = if (dc == null)
          Seq(null, null, null, null, null)
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val (dataOff, dataSize) = (dc(0), dc(1))
          val channels = m._2
          val sr = m._1
          val nAudioFrames = dataSize / 2 / channels
          val winFrames = math.max(sr * frameMs / 1000, 1)
          val nWin = (nAudioFrames + winFrames - 1) / winFrames
          val active = new Array[Boolean](nWin)
          var w = 0
          var nActive = 0L
          while (w < nWin) {
            val lo = w * winFrames
            val hi = math.min(lo + winFrames, nAudioFrames)
            var sumSq = 0L
            var i = lo
            while (i < hi) {
              var c = 0
              while (c < channels) {
                val v = bb.getShort(dataOff + (i * channels + c) * 2).toLong
                sumSq += v * v
                c += 1
              }
              i += 1
            }
            // integer decision: meanSq >= thr^2  <=>  sumSq >= thr^2 * n
            if (sumSq >= thrSq * ((hi - lo).toLong * channels)) {
              active(w) = true; nActive += 1
            }
            w += 1
          }
          // merge runs, drop blips shorter than minSegFrames
          val segs = scala.collection.mutable.ArrayBuffer.empty[Row]
          var s = 0
          while (s < nWin) {
            if (active(s)) {
              var e = s
              while (e + 1 < nWin && active(e + 1)) e += 1
              if (e - s + 1 >= minSegFrames)
                segs += Row(s.toLong * frameMs, (e + 1).toLong * frameMs)
              s = e + 1
            } else s += 1
          }
          val frac: Any =
            if (nWin == 0) null else nActive.toDouble / nWin
          Seq[Any](nWin.toLong, nActive, frac, segs.length.toLong, segs.toSeq)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Linear-interpolation PCM resample → a re-encoded WAV payload at
    * `targetRate` (mono-folded: channels average into one output
    * channel, the normalization audio-training pipelines apply before
    * feature extraction — one canonical rate, one channel). Output
    * sample j reads source position j·srcRate/targetRate and
    * interpolates the two neighboring frames; 16-bit PCM in, 16-bit
    * PCM out, exact same RIFF/WAVE layout the fixtures use, so every
    * downstream operator here (audioStats, Goertzel bands, VAD) runs
    * unchanged on the resampled payload. Null columns on undecodable
    * payloads (audioStats liveness rules).
    *
    * Scale shape: per-row O(samples) CPU inside `mapPartitions`, no
    * shuffle — scan work like every decode op here. Linear
    * interpolation is the deliberate baseline (deterministic, zero
    * dependencies); a windowed-sinc upgrade swaps the kernel, not the
    * plumbing.
    */
  def resampleAudio(df: DataFrame, payloadCol: String,
      targetRate: Int): DataFrame = {
    // upper bound keeps nOut = nIn·target/src inside Int for any
    // payload-bounded nIn (no NegativeArraySizeException on a crafted
    // tiny srcRate + huge targetRate combination)
    require(targetRate > 0 && targetRate <= 1000000,
      s"targetRate out of range: $targetRate")
    val schema = df.schema
      .add(StructField("src_rate", IntegerType))
      .add(StructField("n_in", LongType))
      .add(StructField("n_out", LongType))
      .add(StructField("resampled", BinaryType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val m = wavMeta(bytes)
        val dc = if (m == null || m._3 != 16) null else wavDataChunk(bytes)
        val extra: Seq[Any] = if (dc == null)
          Seq(null, null, null, null)
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val (dataOff, dataSize) = (dc(0), dc(1))
          val channels = m._2
          val srcRate = m._1
          val nIn = dataSize / 2 / channels
          val nOut =
            if (nIn == 0) 0
            else math.max((nIn.toLong * targetRate / srcRate).toInt, 1)
          @inline def monoAt(i: Int): Double = {
            var acc = 0.0
            var c = 0
            while (c < channels) {
              acc += bb.getShort(dataOff + (i * channels + c) * 2); c += 1
            }
            acc / channels
          }
          val out = java.nio.ByteBuffer.allocate(44 + nOut * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nOut * 2)
            .put("WAVE".getBytes("US-ASCII"))
          out.put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)
            .putInt(targetRate).putInt(targetRate * 2)
            .putShort(2).putShort(16)
          out.put("data".getBytes("US-ASCII")).putInt(nOut * 2)
          var j = 0
          while (j < nOut) {
            val p = j.toDouble * srcRate / targetRate
            val i0 = math.min(p.toInt, nIn - 1)
            val i1 = math.min(i0 + 1, nIn - 1)
            val frac = p - i0
            val v = monoAt(i0) * (1.0 - frac) + monoAt(i1) * frac
            out.putShort(math.max(math.min(math.rint(v), 32767.0), -32768.0).toShort)
            j += 1
          }
          Seq[Any](srcRate, nIn.toLong, nOut.toLong, out.array())
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Deterministic minimal MP4 — a real ISO-BMFF box layout (`ftyp` +
    * `moov`>`mvhd` v0) with planted timescale/duration, enough for any
    * box-walking parser to read movie timing.
    */
  def mp4Bytes(timescale: Int, durationUnits: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 116) // big-endian default
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(116).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0)                                   // version 0 + flags
      .putInt(0).putInt(0)                         // ctime, mtime
      .putInt(timescale).putInt(durationUnits.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
    bb.position(bb.position() + 10 + 36 + 24)      // reserved+matrix+predef
    bb.putInt(1)                                   // next track id
    bb.array()
  }

  /** Attach a REAL video payload per row: a minimal MP4 whose movie
    * header is a known function of the id column
    * (`timescale = 600·(id%4+1)`, `duration = timescale·(id%10+1)` so
    * the duration in seconds is exactly `id%10+1`).
    */
  def attachVideoPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val ts = 600 * ((id % 4).toInt + 1)
        val bytes = mp4Bytes(ts, ts.toLong * ((id % 10) + 1))
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("video/mp4", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** ISO-BMFF box walk: movie timescale, duration (units), and derived
    * duration in seconds from `moov`>`mvhd` (v0 or v1) — header-only,
    * no track or sample data touched. Null for non-MP4 payloads.
    */
  private[llm] def mp4Meta(bytes: Array[Byte]): (Int, Long, Double) = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    @inline def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    @inline def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    // Untrusted sizes, hardened like the RIFF walk: 64-bit cursors (no
    // Int wraparound on huge declared sizes), size < 8 (including the
    // size==1 largesize form) → null, moovEnd clamped to the payload so
    // a truncated moov box yields null rather than reading past the
    // buffer, and the mvhd field reads are bounds-checked per version.
    val n = bytes.length
    var i = 0L
    var moov = -1L
    var moovEnd = -1L
    while (i + 8 <= n && moov < 0) {          // top-level boxes
      val size = be32(i.toInt)
      if (size < 8) return null
      if (fourcc(i.toInt + 4) == "moov") {
        moov = i + 8; moovEnd = math.min(i + size, n.toLong)
      }
      i += size
    }
    if (moov < 0) return null
    var j = moov
    while (j + 8 <= moovEnd) {                // moov children
      val size = be32(j.toInt)
      if (size < 8) return null
      if (fourcc(j.toInt + 4) == "mvhd") {
        if (j + 9 > moovEnd) return null
        val version = u8(j.toInt + 8)
        val need = if (version == 1) 40L else 28L
        if (j + need > moovEnd) return null
        val p = j.toInt
        val (ts, dur) =
          if (version == 1) (be32(p + 28).toInt, be64(p + 32))
          else (be32(p + 20).toInt, be32(p + 24))
        if (ts <= 0) return null
        return (ts, dur, dur.toDouble / ts)
      }
      j += size
    }
    null
  }

  /** Header-only video metadata decode: movie timescale / duration from
    * the MP4 box tree WITHOUT touching track data — the video sibling
    * of [[imageMeta]]/[[audioMeta]]. Unrecognized payloads yield nulls.
    */
  def videoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("timescale", IntegerType))
      .add(StructField("duration_units", LongType))
      .add(StructField("duration_s", DoubleType))
      .add(StructField("video_format", StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = mp4Meta(r.getAs[Array[Byte]](payloadIdx))
        val extra: Seq[Any] = if (m != null)
          Seq(m._1, m._2, m._3, "mp4") else Seq(null, null, null, null)
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(encoder)
  }

  /** Solid-gray JPEG frame (REAL ImageIO encode) — the MJPEG frame
    * fixture. A constant-luma plane survives JPEG quantization within
    * ±2 gray levels, so frame statistics bucketed at 64-level width are
    * exactly engine-reproducible while the decode stays honest.
    */
  def grayJpegBytes(width: Int, height: Int, gray: Int): Array[Byte] = {
    // RGB, not TYPE_BYTE_GRAY: a gray raster is a LINEAR colorspace, so
    // sRGB value g written through Graphics2D lands as a different
    // sample (and getRGB converts back non-identically — sRGB 32 reads
    // as 99); an RGB image keeps the sRGB value end-to-end and the JPEG
    // YCbCr round-trip of a constant plane is exact to ±2
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(gray, gray, gray))
    g2.fillRect(0, 0, width, height)
    g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Deterministic motion-JPEG AVI: a real RIFF `AVI ` container
    * (`LIST hdrl` with a minimal `avih`, `LIST movi` with one `00dc`
    * JPEG chunk per frame). Planted formulas, all mod-id so any engine
    * can reproduce them: `n_frames = 3 + id%5`,
    * `frame_w = 24 + (id%3)·8`, `frame_h = 24`, frame f's luma =
    * `32 + 64·((id+f)%4)`. MJPEG is the one video codec whose frames
    * decode with the stock ImageIO JPEG reader — no external codec —
    * which closes the "video frame decode stubbed" gap honestly.
    */
  def aviMjpegBytes(docId: Long): Array[Byte] = {
    val nFrames = (3 + docId % 5).toInt
    val w = (24 + (docId % 3) * 8).toInt
    val h = 24
    val frames = (0 until nFrames).map(f =>
      grayJpegBytes(w, h, (32 + 64 * ((docId + f) % 4)).toInt))
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array() // word-aligned: trailing pad byte stays zero
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ payload)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000)        // microseconds per frame (25 fps)
        .putInt(0).putInt(0)  // max bytes/s, padding granularity
        .putInt(0)            // flags
        .putInt(nFrames)      // total frames
        .putInt(0).putInt(1)  // initial frames, streams
        .putInt(0)            // suggested buffer
        .putInt(w).putInt(h)  // width, height
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(chunk("00dc", _)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  /** Attach a REAL motion-JPEG AVI payload per row ([[aviMjpegBytes]]'
    * planted formulas). The frame alphabet has period lcm(3,4,5)=60, so
    * each distinct container encodes once per partition.
    */
  def attachMjpegPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      val cache = new java.util.HashMap[Long, Array[Byte]]()
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = cache.computeIfAbsent(id % 60, aviMjpegBytes(_))
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("video/x-msvideo", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** Extract the `00dc` frame payloads from a motion-JPEG AVI — the
    * same hardened-walk rules as [[wavMeta]] (untrusted 32-bit sizes:
    * negative → null, 64-bit cursors, payloads clamped to the buffer).
    * Null for anything that isn't a RIFF AVI.
    */
  private[llm] def aviFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    val n = bytes.length
    if (n < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 12L
    while (i + 8 <= n) {
      val p = i.toInt
      val size = le32(p + 4)
      if (size < 0) return null
      if (fourcc(p) == "LIST" && i + 12 <= n && fourcc(p + 8) == "movi") {
        val listEnd = math.min(i + 8 + size, n.toLong)
        var j = i + 12
        while (j + 8 <= listEnd) {
          val q = j.toInt
          val fsize = le32(q + 4)
          if (fsize < 0) return null
          if (fourcc(q) == "00dc") {
            val len = math.min(fsize.toLong, listEnd - j - 8).toInt
            out += java.util.Arrays.copyOfRange(bytes, q + 8, q + 8 + len)
          }
          j += 8L + fsize + (fsize & 1)
        }
      }
      i += 8L + size + (size & 1)
    }
    out.toArray
  }

  /** Per-thread cached image decode — the SPI-registry bypass for the
    * pixel-decode hot paths ([[videoFrames]], [[imageDHash]],
    * [[imagePHash]], [[imageFeatures]]). `ImageIO.read` performs a
    * synchronized IIORegistry service lookup (stream SPI + reader SPI)
    * PER CALL; at 32 decode threads the round-12 100× multimodal probe
    * measured that contention as a ~1.2× overage on 2.5 M frame
    * decodes (SCALING round-12). Instead: sniff the container from its
    * magic bytes, lease a per-thread per-format [[javax.imageio.ImageReader]]
    * (readers are stateful and NOT thread-safe — hence the
    * ThreadLocal), and feed it a directly-constructed
    * MemoryCacheImageInputStream, so the steady-state decode touches no
    * global registry at all. Unrecognized containers fall back to stock
    * `ImageIO.read`. Decode failures return null (= skip row), matching
    * the callers' undecodable-payload contract.
    */
  private[llm] object ThreadLocalImageDecoder {
    private val readers =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
        override def initialValue() =
          new java.util.HashMap[String, javax.imageio.ImageReader]()
      }

    private def sniff(bytes: Array[Byte]): String =
      if (bytes == null || bytes.length < 8) null
      else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N'
        && bytes(3) == 'G') "png"
      else null

    def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val fmt = sniff(bytes)
      if (fmt == null) {
        if (bytes == null) return null
        // exotic container: the stock registry path, null on failure
        return try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      }
      val m = readers.get()
      var rd = m.get(fmt)
      if (rd == null) {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) return null // no reader installed for a sniffed format
        rd = it.next()
        m.put(fmt, rd)
      }
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        rd.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
        rd.read(0)
      } catch { case _: Exception => null }
      finally {
        // drop the reference to the dead stream; the reader itself is
        // reused (setInput fully resets its state)
        try rd.setInput(null) catch { case _: Exception => () }
        // swallow close failures too: an IOException escaping the
        // finally would override the null-on-decode-failure contract
        // and fail the whole Spark task (ADVICE r13)
        try iis.close() catch { case _: Exception => () }
      }
    }
  }

  /** Per-frame video decode: explode each MJPEG AVI payload into one
    * row per frame with REAL ImageIO-decoded width/height and the
    * 64-level luma bucket `round((mean_gray − 32) / 64)` (quantization-
    * robust for the planted fixture, honest for any input). Payloads
    * that aren't MJPEG AVIs, and frames that don't decode, contribute
    * no rows.
    *
    * Scale shape: per-row decode CPU inside one scan — the same
    * embarrassingly-parallel shape as [[imageDHash]]; downstream
    * aggregations see only (id, small ints).
    */
  def videoFrames(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add(StructField("frame_idx", IntegerType))
      .add(StructField("frame_w", IntegerType))
      .add(StructField("frame_h", IntegerType))
      .add(StructField("gray_bucket", IntegerType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = aviFrames(r.getAs[Array[Byte]](payloadIdx))
        if (frames == null) Iterator.empty
        else frames.iterator.zipWithIndex.flatMap { case (fb, idx) =>
          val img = ThreadLocalImageDecoder.read(fb)
          if (img == null) Iterator.empty
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            val mean = sum.toDouble / (w.toLong * h)
            val bucket = math.round((mean - 32.0) / 64.0).toInt
            Iterator.single(Row.fromSeq(r.toSeq ++ Seq(idx, w, h, bucket)))
          }
        }
      }
    }(encoder)
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

  /** Deterministic RGB PNG with hash-mixed pixels: pixel (x, y) channels
    * come from a splitmix64-style finalizer over (seed, x, y), so images
    * from different seeds are statistically uncorrelated (unlike
    * [[pngBytes]]'s linear gradients, whose dHashes would nearly
    * collide across seeds) — the right fixture for perceptual-hash
    * dedup, where only identical seeds may match.
    */
  def noisePngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var h = seed * 0x9e3779b97f4a7c15L + x * 0xbf58476d1ce4e5b9L +
          y * 0x94d049bb133111ebL
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Attach a REAL image payload keyed by `id % groups`: every row in a
    * group carries byte-identical noise PNGs, so a perceptual-hash
    * dedup's expected output is exactly the within-group pairs —
    * decode-verified AND oracle-checkable (identical bytes must hash
    * identically; cross-group noise images collide with probability
    * ~2^-59 at Hamming <= 2).
    */
  def attachGroupedImagePayload(df: DataFrame, idCol: String, groups: Int,
      width: Int = 36, height: Int = 32): DataFrame = {
    val schema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("payload_meta", payloadMeta))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // group alphabet is tiny: encode each group's PNG once per partition
      val cache = new java.util.HashMap[Long, Array[Byte]]()
      rows.map { r =>
        val g = r.getLong(idIdx) % groups
        val bytes = cache.computeIfAbsent(g, noisePngBytes(width, height, _))
        Row.fromSeq(r.toSeq ++ Seq(bytes, Row("image/png", bytes.length, idCol)))
      }
    }(encoder)
  }

  /** Perceptual 64-bit difference hash (dHash) from REAL decoded
    * pixels: grayscale block-average the image onto a 9×8 grid, then
    * bit (cy·8 + cx) = [cell(cx+1, cy) brighter than cell(cx, cy)] —
    * the standard gradient fingerprint, robust to resizing and small
    * edits. Cell comparisons cross-multiply integer sums (sumA·nB >
    * sumB·nA), so the hash is exactly reproducible on any decoder that
    * yields the same pixels. Undecodable payloads hash to null.
    *
    * Scale shape: per-row decode CPU, no shuffle; pair generation is
    * [[TextDedup.hammingPairs]]' banded join over the resulting codes —
    * the image sibling of SimHash text dedup.
    */
  def imageDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema.add(StructField("dhash", LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val img = ThreadLocalImageDecoder.read(bytes)
        val extra: Any = if (img == null) null else {
          val (w, h) = (img.getWidth, img.getHeight)
          if (w < 9 || h < 8) null else {
            // 9x8 grid of (gray sum, pixel count) with floor boundaries
            val sums = Array.ofDim[Long](8, 9)
            val counts = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val cx = x * 9 / w
                val p = img.getRGB(x, y)
                sums(cy)(cx) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                counts(cy)(cx) += 1
                x += 1
              }
              y += 1
            }
            var code = 0L
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                if (sums(cy)(cx + 1) * counts(cy)(cx) >
                    sums(cy)(cx) * counts(cy)(cx + 1))
                  code |= 1L << (cy * 8 + cx)
                cx += 1
              }
              cy += 1
            }
            code
          }
        }
        Row.fromSeq(r.toSeq :+ extra)
      }
    }(encoder)
  }

  /** Perceptual 64-bit DCT hash (pHash) from REAL decoded pixels:
    * grayscale block-average onto a 32×32 grid, 2-D DCT-II, keep the
    * 8×8 low-frequency block minus the DC term, bit i = [coefficient i
    * above the median of the 63]. Median thresholding makes the code
    * invariant to global brightness/contrast shifts — the failure mode
    * of [[imageDHash]]'s gradient code under uniform re-exposure — at
    * the cost of the DCT. The two hashes are complementary, exactly as
    * in production near-dup stacks (pHash recall, dHash speed).
    * Undecodable or too-small payloads hash to null.
    *
    * Scale shape: per-row decode + a fixed 32³-mult DCT, no shuffle;
    * pair generation is the same banded Hamming join as dHash
    * ([[graft.llm.TextDedup.hammingPairs]]).
    */
  def imagePHash(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema.add(StructField("phash", LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // DCT basis is fixed 32-point: precompute once per executor
    val N = 32
    df.mapPartitions { rows =>
      val cos = Array.tabulate(N, N)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val img = ThreadLocalImageDecoder.read(bytes)
        val extra: Any = if (img == null) null else {
          val (w, h) = (img.getWidth, img.getHeight)
          if (w < N || h < N) null else {
            val sums = Array.ofDim[Long](N, N)
            val counts = Array.ofDim[Long](N, N)
            var y = 0
            while (y < h) {
              val cy = y * N / h
              var x = 0
              while (x < w) {
                val cx = x * N / w
                val p = img.getRGB(x, y)
                sums(cy)(cx) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                counts(cy)(cx) += 1
                x += 1
              }
              y += 1
            }
            val g = Array.ofDim[Double](N, N)
            var i = 0
            while (i < N) {
              var j = 0
              while (j < N) {
                g(i)(j) = sums(i)(j).toDouble / (3.0 * counts(i)(j)); j += 1
              }
              i += 1
            }
            // separable DCT-II: rows then columns (unnormalized — the
            // median threshold is scale-invariant)
            val t1 = Array.ofDim[Double](N, N)
            var yy = 0
            while (yy < N) {
              var u = 0
              while (u < N) {
                var acc = 0.0
                var x = 0
                while (x < N) { acc += g(yy)(x) * cos(u)(x); x += 1 }
                t1(yy)(u) = acc
                u += 1
              }
              yy += 1
            }
            val coeffs = new Array[Double](63)
            var k = 0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                if (!(u == 0 && v == 0)) {
                  var acc = 0.0
                  var y2 = 0
                  while (y2 < N) { acc += t1(y2)(u) * cos(v)(y2); y2 += 1 }
                  coeffs(k) = acc
                  k += 1
                }
                u += 1
              }
              v += 1
            }
            val sorted = coeffs.clone(); java.util.Arrays.sort(sorted)
            val median = sorted(31) // lower median of 63
            var code = 0L
            var b = 0
            while (b < 63) {
              if (coeffs(b) > median) code |= 1L << b
              b += 1
            }
            code
          }
        }
        Row.fromSeq(r.toSeq :+ extra)
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
        val mime = Option(mimeIdx.map(r.getString).orNull).getOrElse("")
        val feats =
          if (bytes == null) null // null payload (crawl gap) → null features
          else if (mime.startsWith("image/")) imageFeatures(bytes, dim)
          else if (mime == "audio/wav" || mime == "audio/x-wav")
            wavFeatures(bytes, dim)
          else fakeFeatures(bytes, dim) // <- STUB: real video FRAME decode
                                        // goes here (mvhd timing parses
                                        // for real via videoMeta)
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(encoder)
  }

  /** Real image decode → feature vector: [w, h, mean R, mean G, mean B]
    * from decoded pixels (0-255 scale), byte-fold tail past index 4.
    */
  def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = ThreadLocalImageDecoder.read(bytes)
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
