package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (l87): the overlap guarantee, windowing
  * edge cases, and determinism.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpsOf(texts: Seq[(Long, String)], w: Int = 4): Map[Long, Set[String]] = {
    val df = texts.toDF("id", "t")
      .select(col("id"), TextShingles.grams(col("t"), 3).as("g"))
      .select(col("id"), Winnow.fingerprints(col("g"), w).as("fps"))
    df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
  }

  test("any shared run of >= w+k-1 words yields a common fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot" // 6 words = w+k-1
    val m = fpsOf(Seq(
      (1L, s"one two $shared nine ten eleven twelve"),
      (2L, s"completely different prefix words here $shared and a different tail"),
      (3L, "unrelated text with no overlap at all whatsoever present")))
    assert(m(1L).intersect(m(2L)).nonEmpty,
      "documents sharing a 6-word run must share a fingerprint")
    assert(m(1L).intersect(m(3L)).isEmpty)
    assert(m(2L).intersect(m(3L)).isEmpty)
  }

  test("fingerprints are window minima: counts bounded, short docs degrade gracefully") {
    val longDoc = (1 to 200).map(i => s"w${i}x${i * 7 % 13}").mkString(" ")
    val m = fpsOf(Seq((1L, longDoc), (2L, "just two"), (3L, "one two three"),
      (4L, "")))
    // density: ~2/(w+1) windows select a new min; distinct <= windows
    val grams = 200 - 2
    assert(m(1L).size <= grams - 4 + 1)
    assert(m(1L).size >= grams / 8, s"suspiciously few fps: ${m(1L).size}")
    // < k words -> no grams -> no fingerprints
    assert(m(2L).isEmpty)
    // k..k+w-2 grams -> exactly one fingerprint (single window)
    assert(m(3L).size == 1)
    assert(m(4L).isEmpty)
  }

  test("winnowing is deterministic and insensitive to unrelated suffix edits far away") {
    val body = (1 to 100).map(i => s"t${i * 13 % 89}").mkString(" ")
    val a = fpsOf(Seq((1L, body)))(1L)
    val b = fpsOf(Seq((1L, body)))(1L)
    assert(a == b)
    // appending a suffix preserves all interior fingerprints
    val c = fpsOf(Seq((1L, body + " zz1 zz2 zz3 zz4 zz5")))(1L)
    assert(a.diff(c).isEmpty, "suffix append must not lose interior fingerprints")
  }
}
