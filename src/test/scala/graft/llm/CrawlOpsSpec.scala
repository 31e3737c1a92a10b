package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wave-12 crawl/profiling operators: robots.txt, JSON profile, HITS. */
class CrawlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def judge(robotsTxt: String, paths: Seq[String],
      agent: String = "graftbot"): Map[String, Boolean] = {
    val robots = Seq(("h.example", robotsTxt)).toDF("host", "txt")
    val urls = paths.zipWithIndex.map { case (p, i) =>
      (i.toLong, s"https://h.example$p") }.toDF("id", "url")
    Corpus.robotsFilter(robots, "host", "txt", urls, "id", "url", agent)
      .select("url", "blocked").as[(String, Boolean)].collect()
      .map { case (u, b) => u.stripPrefix("https://h.example") -> b }.toMap
  }

  test("robotsFilter: longest prefix wins and Allow beats Disallow on ties") {
    val txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /a/b/c"
    val out = judge(txt, Seq("/a/x", "/a/b/x", "/a/b/c/x", "/other", ""))
    assert(out("/a/x"))            // /a disallow
    assert(!out("/a/b/x"))         // /a/b allow overrides /a
    assert(out("/a/b/c/x"))        // /a/b/c disallow overrides /a/b
    assert(!out("/other"))         // no rule -> allowed
    assert(!out(""))               // bare host -> path '/', no rule
  }

  test("robotsFilter: an agent-specific group overrides the wildcard group") {
    val txt = "User-agent: *\nDisallow: /\nUser-agent: graftbot\nDisallow: /only"
    val out = judge(txt, Seq("/anything", "/only/x"))
    assert(!out("/anything")) // '*' group (Disallow /) is IGNORED for graftbot
    assert(out("/only/x"))
    // an unknown agent falls back to the wildcard group
    val other = judge(txt, Seq("/anything"), agent = "otherbot")
    assert(other("/anything"))
  }

  test("robotsFilter: case-insensitive directives, agent match is exact") {
    val txt = "user-AGENT: GraftBot\ndisALLOW: /x"
    val out = judge(txt, Seq("/x/1", "/y"))
    assert(out("/x/1") && !out("/y"))
  }

  test("jsonProfile counts presence and type classes, tolerates corrupt rows") {
    val df = Seq(
      """{"a": 1, "b": "s"}""",
      """{"a": "str", "c": true}""",
      """{"a": null}""",
      """broken{""").toDF("j")
    val prof = Corpus.jsonProfile(df, "j").collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    val a = prof("a")
    assert(a.getAs[Long]("n_present") == 3)
    assert(a.getAs[Long]("n_number") == 1)
    assert(a.getAs[Long]("n_string") == 1)
    assert(a.getAs[Long]("n_null") == 1)
    assert(math.abs(a.getAs[Double]("present_pct") - 0.75) < 1e-9)
    assert(prof("c").getAs[Long]("n_boolean") == 1)
    assert(!prof.contains("broken"))
  }

  test("mojibake: detect the double-encoding, spare healthy accents, repair exactly") {
    val corrupt = "caf\u00C3\u00A9 menu"     // UTF-8 'é' read as Latin-1
    val healthy = "caf\u00E9 menu"           // a real é — NOT mojibake
    val ascii = "plain ascii"
    val df = Seq((1L, corrupt), (2L, healthy), (3L, ascii)).toDF("id", "t")
      .select(col("id"), Corpus.mojibakeDetected(col("t")).as("det"),
        Corpus.repairMojibake(col("t")).as("rep"))
    val out = df.collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == (true, healthy)) // repaired to the true é
    assert(out(2L) == (false, healthy)) // untouched: repair would corrupt it
    assert(out(3L) == (false, ascii))
    // idempotence: repairing repaired text changes nothing
    val again = Seq(Tuple1(out(1L)._2)).toDF("t")
      .select(Corpus.repairMojibake(col("t"))).as[String].head()
    assert(again == healthy)
  }

  test("mojibake: mixed rows pass through untouched (no mangle, no throw)") {
    // flagged rows whose FULL round trip is unsafe must come back
    // verbatim — Spark 4's strict encode/decode would otherwise raise
    // MALFORMED_CHARACTER_CODING mid-query (unmappable CJK) or mangle
    // the healthy accent (lone é is an invalid UTF-8 byte)
    val cjkMix = "cafÃ© 世界"      // mojibake + CJK
    val emojiMix = "cafÃ© 😀"    // mojibake + emoji
    val strayMix = "ok é and cafÃ©"   // mojibake + real é
    val contBare = "odd Ã alone"                // flagged, C3 + space
    val rows = Seq((1L, cjkMix), (2L, emojiMix), (3L, strayMix), (4L, contBare))
    val out = rows.toDF("id", "t")
      .select(col("id"), Corpus.mojibakeDetected(col("t")).as("det"),
        Corpus.repairMojibake(col("t")).as("rep"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    rows.foreach { case (id, t) => assert(out(id)._2 == t,
      s"row $id must be untouched") }
    assert(out(1L)._1 && out(2L)._1 && out(3L)._1) // still FLAGGED for triage
  }

  test("HITS: a pure hub and a pure authority score on their own axes") {
    // 1,2,3 all point at 9 (authority); 5 points at 1,2,3,9 (hub)
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L),
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 9L)).toDF("src", "dst")
    val out = graft.operators.PageRank.hits(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(9L)._2 > out(1L)._2 * 2) // 9 dominates authority (ratio ~2.7)
    assert(out(5L)._1 > out(1L)._1)     // 5 dominates hubs
    assert(out(9L)._1 == 0.0)           // 9 points at nothing
    // sum normalization holds
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
  }
}
