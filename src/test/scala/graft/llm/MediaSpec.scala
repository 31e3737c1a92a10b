package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 media/tokenizer kernels: CharGrams, BPE pair census, WAV
  * chunk-walk decode, MP4 box-walk parse.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("charGrams pairs by code point, handles short tokens and unicode") {
    val df = Seq("abcd", "x", "", "héllo").toDF("w")
      .select(col("w"),
        graft.functions.TextShingles.charGrams(col("w"), 2).as("p"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("abcd") == Seq("ab", "bc", "cd"))
    assert(got("x") == Seq.empty)
    assert(got("") == Seq.empty)
    assert(got("héllo") == Seq("hé", "él", "ll", "lo")) // é is ONE char
  }

  test("bpePairStats counts every adjacent pair occurrence, ranks deterministically") {
    val docs = Seq((1L, "aba ab"), (2L, "ba x")).toDF("doc_id", "text")
    // pairs: "aba" -> ab, ba; "ab" -> ab; "ba" -> ba; "x" -> (too short)
    val out = TextAnalysis.bpePairStats(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("ab", 2L, 1L), ("ba", 2L, 2L))) // tie: pair asc
  }

  test("bpeTrain learns the Sennrich example merges in order") {
    // vocab {low:5, lower:2, newest:6, widest:3}; hand-computed pair
    // census: e-s 9 ties s-t 9 -> pair-asc picks (e,s); then (es,t) 9,
    // (l,o) 7 ties (o,w) 7 -> (l,o); then (lo,w) 7
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("bpeTrain stops early when no pair repeats") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // a-b and c-d each occur once; nothing reaches the count-2 floor
    assert(TextAnalysis.bpeTrain(docs, "text", nMerges = 10).isEmpty)
  }

  test("bpeEncode applies merges by rank, leftmost-first") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "lowest newest"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getLong(2))).toMap
    assert(got(1L) == ((Seq("low", "est", "n", "e", "w", "est"), 6L)))
    assert(got(2L) == ((Seq.empty, 0L)))
    assert(got(3L) == ((Seq("x"), 1L)))
  }

  test("corpusDiff labels added/removed/changed/unchanged; normalization-aware") {
    val oldV = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newV = Seq((2L, "Beta "), (3L, "gamma edited"), (4L, "delta"))
      .toDF("doc_id", "text")
    val out = Corpus.corpusDiff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fingerprints normalize case/whitespace, so "Beta " == "beta"
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("vocabDrift ranks the injected token first; shared vocab stays near zero") {
    val oldV = (1L to 10L).map(i => Tuple1("x y")).toDF("text")
    val newV = (1L to 10L).map(i => Tuple1("x z")).toDF("text")
    val out = TextAnalysis.vocabDrift(oldV, newV, "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getLong(6)))
    // the measure is symmetric: the removed token drifts as much as the
    // injected one; the tie breaks on token asc (y before z)
    assert(out.take(2).map(_._1).toSeq == Seq("y", "z"))
    assert(out(0)._4 == out(1)._4) // equal-magnitude movers tie exactly
    val z = out.find(_._1 == "z").get
    assert(z._2 == 0L && z._3 == 10L)
    // x appears identically in both versions: zero drift contribution
    assert(out.find(_._1 == "x").get._4 == 0.0)
    assert(out.map(_._4).sorted.reverse.toSeq == out.map(_._4).toSeq) // ranked desc
  }

  test("scriptMix classifies pure and mixed scripts with exact fractions") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "Привет мир"),
      (3L, "中文 测试"),
      (4L, "مرحبا"),
      (5L, "12345"),
      (6L, "!!! ???"),          // nothing recognized → other
      (7L, "ab 中文"),          // 2 latin vs 2 han: tie → latin (fixed order)
      (8L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getString(r.fieldIndex("dominant_script")))).toMap
    assert(out(1L) == ((10L, 1.0, "latin")))
    assert(out(2L)._3 == "cyrillic" && out(3L)._3 == "han")
    assert(out(4L)._3 == "arabic" && out(5L)._3 == "digit")
    assert(out(6L)._3 == "other")
    assert(out(7L)._3 == "latin" && out(7L)._2 == 0.5)
    assert(out(8L) == ((0L, 0.0, "other"))) // empty doc: safe division, other
  }

  test("bigramLogProb: shuffled text scores below natural text, counts exact") {
    val natural = "the cat sat on the mat"
    val shuffled = "cat the mat sat the on" // same unigrams, rare transitions
    val docs = ((1L to 5L).map(i => (i, natural)) :+ (6L, shuffled))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 5L && out(6L)._1 == 5L)
    // a unigram model cannot separate these two docs; the bigram model must
    assert(out(6L)._2 < out(1L)._2,
      s"shuffled ${out(6L)._2} should score below natural ${out(1L)._2}")
    // single-token and empty docs have no transitions and drop out
    val edge = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramLogProb(edge, "doc_id", "text").count() == 0)
  }

  test("ngramTopKApprox: separated heads exact, bounds sandwich truth, memory bounded") {
    // skewed corpus: "x y" dominates, mid grams repeat, long tail unique
    val docs = (
      (1L to 50L).map(i => (i, "x y")) ++
      (51L to 60L).map(i => (i, "mid one")) ++
      (61L to 66L).map(i => (i, "mid two")) ++
      (100L to 160L).map(i => (i, s"tail$i only$i"))).toDF("doc_id", "text")
    // eviction regime: m=8 churns the unique tail; the dominant head
    // stays resident in every partition, so its bounds are TIGHT and
    // it must rank first (junk upper bounds are always < 50)
    val out = TextAnalysis.ngramTopKApprox(docs.repartition(4),
        "doc_id", "text", n = 2, k = 3, m = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head._1 == "x y" && out.head._4 == 1L)
    assert(out.head._2 == 50L && out.head._3 == 50L) // hi == lo == truth
    // all reported bounds are consistent (lo <= hi, hi bounded by N)
    out.foreach { case (g, hi, lo, _) =>
      assert(lo <= hi && hi <= 127L, s"$g: [$lo, $hi]") }
    // no-eviction regime (m >= per-partition distinct grams): the
    // sketch degenerates to the exact census with zero-width bounds
    val exactRegime = TextAnalysis.ngramTopKApprox(docs.repartition(4),
        "doc_id", "text", n = 2, k = 3, m = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(exactRegime.map(x => (x._1, x._2, x._4)).toSeq == Seq(
      ("x y", 50L, 1L), ("mid one", 10L, 2L), ("mid two", 6L, 3L)))
    assert(exactRegime.forall(x => x._2 == x._3)) // hi == lo everywhere
  }

  test("ngramTopKAudit: exact head, theorems hold even in heavy-eviction regime") {
    import spark.implicits._
    val docs = (
      (1L to 50L).map(i => (i, "x y")) ++
      (51L to 60L).map(i => (i, "mid one")) ++
      (61L to 66L).map(i => (i, "mid two")) ++
      (100L to 160L).map(i => (i, s"tail$i only$i"))).toDF("doc_id", "text")
    // m=8 forces constant eviction across 4 partitions — the worst
    // case for the sketch — yet sketch_ok must be ALL true (the bounds
    // are theorems under any layout, the l56 promotion's load-bearing
    // fact) and the anchor columns are the exact census
    val out = TextAnalysis.ngramTopKAudit(docs.repartition(4),
        "doc_id", "text", n = 2, k = 3, m = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(x => (x._1, x._2, x._3)).toSeq == Seq(
      ("x y", 50L, 1L), ("mid one", 10L, 2L), ("mid two", 6L, 3L)))
    assert(out.forall(_._4), s"sketch bound violated: ${out.mkString(", ")}")
  }

  test("wavMeta round-trips the synthesized header; rejects non-WAV") {
    val bytes = Multimodal.wavBytes(16000, 2, 1234, seed = 7L)
    assert(Multimodal.wavMeta(bytes) == ((16000, 2, 16, 1234L)))
    assert(Multimodal.wavMeta("not audio at all".getBytes) == null)
    assert(Multimodal.wavMeta(Multimodal.pngBytes(3, 3, 1)) == null)
  }

  test("wavFeatures folds the actual PCM samples") {
    val n = 100
    val seed = 5L
    val bytes = Multimodal.wavBytes(8000, 1, n, seed)
    val feats = Multimodal.wavFeatures(bytes, 8)
    assert(feats(0) == 8000f && feats(1) == 1f && feats(2) == n.toFloat)
    // recompute mean/rms from the synthesis formula
    val samples = (0 until n).map(i =>
      (((seed + i * 2654435761L) % 65536L) - 32768L).toDouble)
    assert(math.abs(feats(3) - samples.sum / n) < 0.5)
    assert(math.abs(feats(4) - math.sqrt(samples.map(v => v * v).sum / n)) < 0.5)
  }

  test("mp4Meta walks ftyp+moov to mvhd v0, reads v1 too, rejects junk") {
    val bytes = Multimodal.mp4Bytes(1200, 6000L)
    assert(Multimodal.mp4Meta(bytes) == ((1200, 6000L, 5.0)))
    assert(Multimodal.mp4Meta("RIFFnope".getBytes) == null)
    // hand-build an mvhd v1 (64-bit times): moov>mvhd with 8-byte
    // ctime/mtime/duration and 4-byte timescale at offset 28
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 112)
    bb.putInt(8).put("free".getBytes("US-ASCII"))
    bb.putInt(120).put("moov".getBytes("US-ASCII"))
    bb.putInt(112).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0x01000000)            // version 1, flags 0
    bb.putLong(0L).putLong(0L)       // ctime, mtime (64-bit)
    bb.putInt(90000)                 // timescale
    bb.putLong(45000L)               // duration (64-bit)
    val m = Multimodal.mp4Meta(bb.array())
    assert(m == ((90000, 45000L, 0.5)))
  }

  test("MJPEG AVI: planted frames decode to exact counts, dims, luma buckets") {
    for (id <- Seq(0L, 7L, 59L)) {
      val avi = Multimodal.aviMjpegBytes(id)
      val frames = Multimodal.aviFrames(avi)
      assert(frames != null && frames.length == (3 + id % 5).toInt)
      frames.zipWithIndex.foreach { case (fb, f) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
        assert(img != null, s"frame $f of doc $id must decode")
        assert(img.getWidth == 24 + (id % 3) * 8 && img.getHeight == 24)
        var sum = 0L
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          sum += (img.getRGB(x, y) & 0xff)
        val mean = sum.toDouble / (img.getWidth * img.getHeight)
        val bucket = math.round((mean - 32.0) / 64.0).toInt
        assert(bucket == ((id + f) % 4).toInt,
          s"doc $id frame $f mean $mean bucket $bucket")
      }
    }
    // videoFrames explodes through the DataFrame surface too
    val df = Seq((3L, Multimodal.aviMjpegBytes(3L)),
      (4L, "not an avi".getBytes.toArray)).toDF("doc_id", "payload")
    val out = Multimodal.videoFrames(df, "payload")
      .select("doc_id", "frame_idx", "gray_bucket").collect()
    assert(out.length == 6) // doc 3: 3+3%5=6 frames; junk row: none
    assert(out.forall(_.getLong(0) == 3L))

    // hardened walk: negative chunk size and truncation return null/partial
    val bad = Multimodal.aviMjpegBytes(1L)
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8) // the hdrl LIST's own top-level chunk size
    assert(Multimodal.aviFrames(bad) == null)
    val cut = java.util.Arrays.copyOf(Multimodal.aviMjpegBytes(1L), 40)
    assert(Multimodal.aviFrames(cut) != null) // truncated: no movi → 0 frames
    assert(Multimodal.aviFrames(cut).isEmpty)
  }

  test("corrupt media: negative chunk sizes, truncation, empty data — no hangs") {
    // negative RIFF chunk size (0xFFFFFFF8 = -8): a trusting walk never
    // advances its cursor (hung executor task); must return null fast
    val negSize = Multimodal.wavBytes(8000, 1, 100, seed = 1L)
    val bbn = java.nio.ByteBuffer.wrap(negSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbn.putInt(40, -8) // data chunk size
    assert(Multimodal.wavMeta(negSize) == null)
    assert(Multimodal.wavDataChunk(negSize) == null)

    // declared data size beyond the payload (truncated file): n_samples
    // must reflect the bytes actually present, not the declared size
    val trunc = Multimodal.wavBytes(8000, 1, 100, seed = 1L)
    val bbt = java.nio.ByteBuffer.wrap(trunc)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbt.putInt(40, 100 * 2 + 5000)
    val mt = Multimodal.wavMeta(trunc)
    assert(mt != null && mt._4 == 100L, s"clamped n_samples: $mt")
    val dct = Multimodal.wavDataChunk(trunc)
    assert(dct(1) == 200)

    // huge unsigned size in a leading chunk: cursor must not wrap Int
    val huge = Multimodal.wavBytes(8000, 1, 4, seed = 1L)
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 2) // fmt chunk claims ~2^31 bytes
    assert(Multimodal.wavMeta(huge) == null) // walk exits, no wraparound

    // structurally valid WAV, EMPTY data chunk: stats are null (not
    // NaN), n_vals reports 0
    val empty = Multimodal.wavBytes(8000, 1, 0, seed = 1L)
    val df = Seq((1L, empty)).toDF("doc_id", "payload")
    val st = Multimodal.audioStats(df, "payload").collect()(0)
    assert(st.getLong(st.fieldIndex("n_vals")) == 0L)
    assert(st.isNullAt(st.fieldIndex("mean_amp")))
    assert(st.isNullAt(st.fieldIndex("rms_amp")))

    // truncated moov: mvhd fields would read past the buffer; null, not
    // an exception
    val mp4 = Multimodal.mp4Bytes(1200, 6000L)
    assert(Multimodal.mp4Meta(java.util.Arrays.copyOf(mp4, 40)) == null)
    // and a zero timescale must not produce Infinity
    val zt = Multimodal.mp4Bytes(0, 6000L)
    assert(Multimodal.mp4Meta(zt) == null)
  }

  test("audioMeta/videoMeta emit nulls for undecodable payloads, not failures") {
    val df = Seq((1L, "junk bytes".getBytes)).toDF("doc_id", "payload")
    val a = Multimodal.audioMeta(df, "payload").collect()(0)
    assert(a.isNullAt(a.fieldIndex("sample_rate")))
    val v = Multimodal.videoMeta(df, "payload").collect()(0)
    assert(v.isNullAt(v.fieldIndex("timescale")))
  }

  test("audioStats matches the sample formula exactly (full decode)") {
    val docs = Seq(3L).toDF("doc_id")
    val out = Multimodal.audioStats(
      Multimodal.attachAudioPayload(docs, "doc_id"), "payload").collect()(0)
    // id=3: sr plant irrelevant here; nVals = 800*(3%5+1)*(3%2+1) = 6400
    val nVals = 6400
    val samples = (0 until nVals).map(i =>
      ((3L + i * 2654435761L) % 65536L) - 32768L)
    assert(out.getLong(out.fieldIndex("n_vals")) == nVals.toLong)
    assert(out.getDouble(out.fieldIndex("mean_amp")) ==
      samples.sum.toDouble / nVals)
    assert(out.getDouble(out.fieldIndex("rms_amp")) ==
      math.sqrt(samples.map(v => v * v).sum.toDouble / nVals))
    assert(out.getDouble(out.fieldIndex("clip_frac")) ==
      samples.count(v => math.abs(v) >= 32000).toDouble / nVals)
    assert(out.getDouble(out.fieldIndex("silence_frac")) ==
      samples.count(v => math.abs(v) < 512).toDouble / nVals)
  }

  test("Goertzel band energy detects every planted tone; corrupt payload yields nulls") {
    val docs = (0L until 16L).toDF("doc_id")
    val bands = (1 to 8).map(_ * 400.0).toArray
    val got = Multimodal.audioBandEnergy(
      Multimodal.attachTonePayload(docs, "doc_id"), "payload", bands)
    val rows = got.select("doc_id", "dominant_band", "dominant_freq", "band_power")
      .collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(2) == 400.0 * (id % 8 + 1),
        s"doc $id detected ${r.getDouble(2)} Hz, planted ${400.0 * (id % 8 + 1)}")
      val powers = r.getSeq[Double](3)
      assert(powers(r.getInt(1)) == 1.0) // normalized: dominant is 1.0
      // the tone bin dwarfs every other bin (clean sine, exact bin freq)
      assert(powers.zipWithIndex.filter(_._2 != r.getInt(1)).forall(_._1 < 0.05))
    }
    // undecodable payload: null detection columns, row survives
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val j = Multimodal.audioBandEnergy(junk, "payload", bands).collect()(0)
    assert(j.isNullAt(j.fieldIndex("dominant_band")))
  }

  test("imageDHash: identical bytes hash identically; small edits stay near") {
    val base = Multimodal.noisePngBytes(36, 32, seed = 11L)
    val again = Multimodal.noisePngBytes(36, 32, seed = 11L)
    val other = Multimodal.noisePngBytes(36, 32, seed = 12L)
    // a small edit: darken one 4x4 cell of the decoded image, re-encode
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0)
    val outS = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", outS)
    val edited = outS.toByteArray
    val df = Seq((1L, base), (2L, again), (3L, other), (4L, edited))
      .toDF("id", "payload")
    val h = Multimodal.imageDHash(df, "payload").select("id", "dhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "identical bytes must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(4L)) <= 4, "one edited cell flips at most its two comparisons")
    assert(ham(h(1L), h(3L)) > 8, "independent noise images should be far apart")
  }

  test("ThreadLocalImageDecoder decodes pixel-identically to ImageIO.read; null on junk") {
    // the SPI-registry-bypassing decoder must be a drop-in: same pixels
    // for PNG and JPEG, reader state fully reset between reuses (decode
    // the same thread twice with DIFFERENT images), null for garbage
    def pixels(img: java.awt.image.BufferedImage): Seq[Int] =
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y)
    val png1 = Multimodal.noisePngBytes(17, 13, seed = 3L)
    val png2 = Multimodal.noisePngBytes(9, 21, seed = 4L)
    val jpg = Multimodal.grayJpegBytes(24, 24, gray = 96)
    for (bytes <- Seq(png1, png2, jpg, png1)) { // png1 twice: reader reuse
      val got = Multimodal.ThreadLocalImageDecoder.read(bytes)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(got != null && ref != null)
      assert(got.getWidth == ref.getWidth && got.getHeight == ref.getHeight)
      assert(pixels(got) == pixels(ref), "decoded pixels diverge from ImageIO.read")
    }
    assert(Multimodal.ThreadLocalImageDecoder.read(null) == null)
    assert(Multimodal.ThreadLocalImageDecoder.read(Array[Byte](1, 2, 3)) == null)
    // sniffed-as-JPEG but truncated: must yield null, not throw
    assert(Multimodal.ThreadLocalImageDecoder.read(
      jpg.take(20).toArray) == null)
    // concurrent decode from many threads (the contention scenario)
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map(_ => new Thread(() => {
      var i = 0
      while (i < 20) {
        val img = Multimodal.ThreadLocalImageDecoder.read(png1)
        if (img != null && img.getWidth == 17) ok.incrementAndGet()
        i += 1
      }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ok.get() == 16 * 20, s"concurrent decodes: ${ok.get()}/320 succeeded")
  }

  test("hammingPairs equals brute force at radius 0..3") {
    val codes = Seq(
      1L -> 0x0123456789abcdefL,
      2L -> 0x0123456789abcdefL,               // ham 0 from 1
      3L -> 0x0123456789abcdeeL,               // ham 1 from 1/2
      4L -> 0x0123456789abcd00L,               // ham ~6
      5L -> 0x7654321089abcdefL).toDF("id", "code")
    for (r <- 0 to 3) {
      val got = TextDedup.hammingPairs(codes, "id", "code", r)
        .select("id_a", "id_b", "hamming").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val rows = codes.collect().map(x => (x.getLong(0), x.getLong(1)))
      val brute = (for {
        (ia, ca) <- rows; (ib, cb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ca ^ cb) if d <= r
      } yield (ia, ib, d)).toSet
      assert(got == brute, s"radius $r mismatch")
    }
  }

  test("VAD recovers every planted speech burst with frame-aligned boundaries") {
    val docs = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val out = Multimodal.vadSegments(
        Multimodal.attachSpeechPayload(docs, "doc_id"), "payload")
      .select("doc_id", "n_segments", "segments").collect()
      .map { r =>
        r.getLong(0) -> (r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => (s.getLong(0), s.getLong(1))).toList)
      }.toMap
    out.foreach { case (id, (n, segs)) =>
      val expected = (0 until (id % 3 + 1).toInt)
        .map(i => (200L + i * 500, 500L + i * 500)).toList
      assert(n == expected.length, s"doc $id: $n segments, want ${expected.length}")
      assert(segs == expected, s"doc $id: $segs != $expected")
    }
  }

  test("VAD: silence-only audio yields zero segments; corrupt payload yields nulls") {
    val silent = Multimodal.toneWavBytes(8000, 800, 440.0, 0) // amplitude 0
    val junk = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, silent), (2L, junk)).toDF("doc_id", "payload")
    val rows = Multimodal.vadSegments(df, "payload")
      .select("doc_id", "n_frames", "n_segments", "active_frac")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) > 0 && rows(1L).getLong(2) == 0L)
    assert(rows(1L).getDouble(3) == 0.0)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2) && rows(2L).isNullAt(3))
  }

  test("pHash: identical bytes hash identically; brightness shift stays near; groups differ") {
    def brighten(png: Array[Byte], delta: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        def c(v: Int) = math.min(v + delta, 255)
        out.setRGB(x, y,
          (c((p >> 16) & 0xff) << 16) | (c((p >> 8) & 0xff) << 8) | c(p & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    val a = Multimodal.noisePngBytes(36, 32, seed = 7)
    val b = Multimodal.noisePngBytes(36, 32, seed = 8)
    val rows = Seq((1L, a), (2L, a.clone()), (3L, b), (4L, brighten(a, 40)),
      (5L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val codes = Multimodal.imagePHash(rows, "payload")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(codes(1L) == codes(2L) && codes(1L).isDefined)
    assert(codes(5L).isEmpty)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val interGroup = ham(codes(1L).get, codes(3L).get)
    val brightShift = ham(codes(1L).get, codes(4L).get)
    assert(interGroup > 12, s"different noise groups too close: $interGroup")
    assert(brightShift <= 6,
      s"median-threshold pHash should survive brightness shift: $brightShift")
  }

  test("resample preserves the planted tone's dominant band and scales duration") {
    val docs = Seq(1L, 2L, 5L).toDF("doc_id")
    val toned = Multimodal.attachTonePayload(docs, "doc_id") // 8 kHz, 400*(id%8+1) Hz
    val res = Multimodal.resampleAudio(toned, "payload", targetRate = 16000)
    val meta = res.select("doc_id", "src_rate", "n_in", "n_out").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    meta.foreach { case (id, (sr, nIn, nOut)) =>
      assert(sr == 8000 && nIn == 2000 && nOut == 4000, s"doc $id: $sr $nIn $nOut")
    }
    // Goertzel on the RESAMPLED payload still finds the planted tone
    val dom = Multimodal.audioBandEnergy(
        res.select(col("doc_id"), col("resampled").as("payload")),
        "payload", bandsHz = (1 to 8).map(_ * 400.0).toArray)
      .select("doc_id", "dominant_freq").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(1L, 2L, 5L).foreach { id =>
      assert(dom(id) == 400.0 * (id % 8 + 1),
        s"doc $id: dominant ${dom(id)} after resample")
    }
    // corrupt payload -> null columns
    val junk = Seq((9L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val row = Multimodal.resampleAudio(junk, "payload", 16000).head()
    assert(row.isNullAt(2) && row.isNullAt(4))
    // a crafted WAV declaring sample_rate = 0 is corrupt, not a
    // division-by-zero (or a NaN-power argmax in Goertzel)
    val zeroRate = Multimodal.toneWavBytes(8000, 100, 440.0, 1000)
    java.util.Arrays.fill(zeroRate, 24, 28, 0.toByte)
    val zr = Seq((10L, zeroRate)).toDF("doc_id", "payload")
    assert(Multimodal.resampleAudio(zr, "payload", 16000).head().isNullAt(2))
    assert(Multimodal.vadSegments(zr, "payload").head().isNullAt(2))
    assert(Multimodal.audioBandEnergy(zr, "payload", Array(440.0))
      .head().isNullAt(2))
  }

  test("extractFeatures decodes wav payloads for real (audio branch)") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val withAudio = Multimodal.attachAudioPayload(docs, "doc_id")
      .withColumn("mime", col("payload_meta.mime"))
    val feats = Multimodal.extractFeatures(withAudio, "payload",
        dim = 8, mimeCol = Some("mime"))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // head = [sample_rate, channels, n_samples, ...] per the plant
    assert(feats(1L)(0) == 16000f && feats(1L)(1) == 2f && feats(1L)(2) == 1600f)
    assert(feats(2L)(0) == 24000f && feats(2L)(1) == 1f && feats(2L)(2) == 2400f)
  }
}
