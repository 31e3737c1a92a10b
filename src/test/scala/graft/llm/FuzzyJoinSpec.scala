package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Complete banded edit-distance join (l91): equality with brute
  * force across the q-gram and short-string paths.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic mixed-length strings: short (< (k+1)·q) through long
  private def corpus(n: Int, tag: String): Seq[(Long, String)] =
    (1 to n).map { i =>
      val len = 2 + (i * 7) % 38
      val sb = new StringBuilder
      var x = i.toLong * 2654435761L + tag.hashCode
      while (sb.length < len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append((math.floorMod(x >>> 33, 26) + 'a').toChar)
      }
      (i.toLong, sb.toString)
    }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(l: Seq[(Long, String)], r: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Int)] =
    (for { (il, sl) <- l; (ir, sr) <- r; d = lev(sl, sr) if d <= k }
      yield (il, ir, d)).toSet

  test("banded join equals brute force at maxDist 1 and 2 (mixed lengths)") {
    val l = corpus(60, "L")
    // right side: 40 independent strings + 20 one-char-dropped copies
    val r = corpus(40, "R").map { case (i, s) => (i + 1000L, s) } ++
      l.take(20).map { case (i, s) =>
        (i + 2000L, s.substring(0, s.length / 2) + s.substring(s.length / 2 + 1))
      }
    val lDf = l.toDF("id", "s")
    val rDf = r.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = TextDedup.editDistancePairs(lDf, rDf, "id", "s", "id", "s", k)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val expected = brute(l, r, k)
      assert(got == expected, s"maxDist=$k: ${got.size} vs ${expected.size}")
      // every planted one-char drop must be found at distance 1
      assert(l.take(20).forall { case (i, _) => got.contains((i, i + 2000L, 1)) })
    }
  }
}
