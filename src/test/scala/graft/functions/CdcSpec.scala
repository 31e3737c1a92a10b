package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking: reassembly, determinism, boundary
  * contracts, and the shift-resynchronization property that makes CDC
  * a dedup primitive (l83/l84).
  */
class CdcSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def chunksOf(texts: Seq[String], minLen: Int = 16,
      maxLen: Int = 256, maskBits: Int = 6): Map[String, List[(Int, Int, Long)]] = {
    import spark.implicits._
    texts.toDF("t")
      .select(col("t"), CdcChunks.chunks(col("t"), minLen, maxLen, maskBits).as("ch"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Row](1)
        .map(c => (c.getInt(0), c.getInt(1), c.getLong(2))).toList)
      .toMap
  }

  private def lorem(n: Int): String = {
    // deterministic pseudo-text, no RNG (varied bytes so the gear hash fires)
    val sb = new StringBuilder
    var x = 12345L
    while (sb.length < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(((x >>> 33) % 26 + 'a').toChar)
      if ((x >>> 17) % 7 == 0) sb.append(' ')
    }
    sb.toString.take(n)
  }

  test("chunks tile the text exactly and respect min/max length") {
    val text = lorem(5000)
    val ch = chunksOf(Seq(text))(text)
    assert(ch.nonEmpty)
    // contiguous tiling: offsets/lengths reassemble the byte range
    var pos = 0
    ch.foreach { case (off, len, _) =>
      assert(off == pos, s"gap at $pos"); pos += len
    }
    assert(pos == text.getBytes("UTF-8").length)
    // every chunk except the trailing remainder honors [minLen, maxLen]
    ch.init.foreach { case (_, len, _) =>
      assert(len >= 16 && len <= 256, s"len $len out of bounds")
    }
    assert(ch.last._2 <= 256)
  }

  test("chunking is deterministic and fingerprints are content-addressed") {
    val text = lorem(2000)
    val a = chunksOf(Seq(text))(text)
    val b = chunksOf(Seq(text))(text)
    assert(a == b)
    // same content at different offsets -> same fp (content-addressed)
    val doubled = text + text
    val d = chunksOf(Seq(doubled))(doubled)
    val fpsA = a.map(_._3).toSet
    val shared = d.map(_._3).count(fpsA)
    assert(shared >= d.length / 2,
      s"doubled text should mostly reuse fingerprints ($shared of ${d.length})")
  }

  test("boundaries re-synchronize after a prefix insertion (the CDC property)") {
    val text = lorem(5000)
    val shifted = "INSERTED-PREFIX-" + text
    val base = chunksOf(Seq(text))(text).map(_._3)
    val shift = chunksOf(Seq(shifted))(shifted).map(_._3)
    val sharedTail = base.toSet.intersect(shift.toSet).size
    // all but the first chunk (where the edit landed) should survive
    assert(sharedTail >= base.length - 2,
      s"only $sharedTail of ${base.length} chunk fps survived a prefix shift")
    // the contrast: fixed-size chunking loses every boundary
    val fixedBase = text.getBytes("UTF-8").grouped(64).map(_.toSeq).toSet
    val fixedShift = shifted.getBytes("UTF-8").grouped(64).map(_.toSeq).toSet
    assert(fixedBase.intersect(fixedShift).size <= 2)
  }

  test("max-length force-cut fires on constant bytes; empty text yields no chunks") {
    val constant = "a" * 1000
    val ch = chunksOf(Seq(constant))(constant)
    assert(ch.nonEmpty && ch.forall(_._2 <= 256))
    assert(ch.init.forall(_._2 == 256), "constant bytes should hit maxLen cuts")
    assert(chunksOf(Seq(""))("").isEmpty)
  }

  test("cdcDedupReport quantifies planted duplication") {
    import spark.implicits._
    val shared = lorem(3000)
    val docs = Seq(
      (1L, shared),
      (2L, shared),                      // exact copy
      (3L, "UNIQUE-HEAD-" + lorem(500))) // mostly distinct
      .toDF("doc_id", "text")
    val r = graft.llm.Corpus.cdcDedupReport(docs, "doc_id", "text").head()
    val (total, distinct, totalB, uniqueB, ratio) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(total > distinct)
    assert(totalB > uniqueB)
    // the exact copy alone makes ~half the bytes redundant
    assert(ratio > 0.4 && ratio < 0.7, s"ratio $ratio")
  }
}
