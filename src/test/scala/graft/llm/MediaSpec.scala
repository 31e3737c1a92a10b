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

  test("audioMeta/videoMeta emit nulls for undecodable payloads, not failures") {
    val df = Seq((1L, "junk bytes".getBytes)).toDF("doc_id", "payload")
    val a = Multimodal.audioMeta(df, "payload").collect()(0)
    assert(a.isNullAt(a.fieldIndex("sample_rate")))
    val v = Multimodal.videoMeta(df, "payload").collect()(0)
    assert(v.isNullAt(v.fieldIndex("timescale")))
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
