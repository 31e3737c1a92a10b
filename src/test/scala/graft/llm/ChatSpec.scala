package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chat/conversation stats, cluster-balanced sampling, and margin
  * mining — round 9 wave 7.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def stats(convs: (Long, String)*) =
    Chat.conversationStats(convs.toSeq.toDF("id", "conv"), "id", "conv")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("conversationStats counts turns, roles, and chars") {
    val conv =
      """[{"role":"user","content":"hi there"},
        | {"role":"assistant","content":"hello"},
        | {"role":"user","content":"bye"},
        | {"role":"assistant","content":"see you"}]""".stripMargin
    val r = stats(1L -> conv)(1L)
    assert(r.getAs[Long]("n_turns") == 4)
    assert(r.getAs[Long]("n_user") == 2)
    assert(r.getAs[Long]("n_assistant") == 2)
    assert(r.getAs[Long]("user_chars") == 11) // "hi there" + "bye"
    assert(r.getAs[Long]("assistant_chars") == 12) // "hello" + "see you"
    assert(r.getAs[Boolean]("alternation_ok"))
    assert(r.getAs[Boolean]("ends_assistant"))
    assert(r.getAs[Boolean]("valid_json"))
  }

  test("conversationStats flags broken alternation and wrong terminal role") {
    val r = stats(
      1L -> """[{"role":"user","content":"a"},{"role":"user","content":"b"}]""",
      2L -> """[{"role":"assistant","content":"a"}]""",
      3L -> """[{"role":"user","content":"a"}]""")
    assert(!r(1L).getAs[Boolean]("alternation_ok")) // user,user
    assert(!r(2L).getAs[Boolean]("alternation_ok")) // starts assistant
    assert(r(2L).getAs[Boolean]("ends_assistant"))
    assert(r(3L).getAs[Boolean]("alternation_ok"))
    assert(!r(3L).getAs[Boolean]("ends_assistant"))
  }

  test("conversationStats survives malformed JSON and empty arrays") {
    val r = stats(
      1L -> """not json at all""",
      2L -> """[]""",
      3L -> """{"role":"user"}""") // bare object: from_json wraps it
    assert(!r(1L).getAs[Boolean]("valid_json"))
    assert(r(1L).getAs[Long]("n_turns") == 0)
    assert(!r(1L).getAs[Boolean]("alternation_ok"))
    assert(!r(1L).getAs[Boolean]("ends_assistant"))
    assert(r(2L).getAs[Boolean]("valid_json"))
    assert(r(2L).getAs[Long]("n_turns") == 0)
    assert(!r(2L).getAs[Boolean]("alternation_ok"))
    // Spark's from_json parses a bare object against an array schema as
    // a ONE-ELEMENT array (documented engine behavior): a single user
    // turn with null content → zero chars, valid alternation prefix
    assert(r(3L).getAs[Boolean]("valid_json"))
    assert(r(3L).getAs[Long]("n_turns") == 1)
    assert(r(3L).getAs[Long]("user_chars") == 0)
    assert(r(3L).getAs[Boolean]("alternation_ok"))
    assert(!r(3L).getAs[Boolean]("ends_assistant"))
  }

  // -------------------------------------------------- clusterBalancedSample

  private def fixtureEmb = {
    val sf = "/root/testdata/sf0.001"
    graft.Fixtures.table(spark, sf, "embeddings")
  }

  test("clusterBalancedSample takes an exact per-cell quota and covers all cells") {
    val out = Similarity.clusterBalancedSample(
      fixtureEmb, "vec_id", "embedding", nCells = 8, perCell = 5)
      .cache()
    val perCell = out.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(perCell.values.forall(_ <= 5))
    assert(perCell.values.exists(_ == 5)) // big cells hit the quota exactly
    assert(out.select("pick").as[Int].collect().forall(p => p >= 1 && p <= 5))
    // quota rows are distinct ids
    assert(out.select("vec_id").distinct().count() == out.count())
    out.unpersist()
  }

  test("clusterBalancedSample is deterministic under repartitioning") {
    val a = Similarity.clusterBalancedSample(
      fixtureEmb, "vec_id", "embedding", nCells = 8, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val b = Similarity.clusterBalancedSample(
      fixtureEmb.repartition(7), "vec_id", "embedding", nCells = 8, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(a == b)
  }

  // -------------------------------------------------- marginMining

  test("marginMining deflates hub targets and mines the axis partners") {
    // 2-d embeddings. Sources s1=(1,0), s2=(0,1). Targets: a hub at
    // (0.8, 0.8) (equally high cosine to BOTH sources — margin ≈ 0.91,
    // below the mining threshold of 1) and two axis-aligned partners
    // whose margins come out ≈ 1.42; each source mines its partner.
    val src = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("s_id", "sv")
    val tgt = Seq(
      (10L, Array(0.8f, 0.8f)), // hub
      (11L, Array(0.95f, 0.1f)),
      (12L, Array(0.1f, 0.95f))).toDF("t_id", "tv")
    val out = Similarity.marginMining(src, tgt, "s_id", "t_id", "sv", "tv",
        k = 2, minMargin = 0.0)
      .select("s_id", "t_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 11L, 2L -> 12L))
  }

  test("marginMining minMargin drops below-threshold pairs") {
    val src = Seq((1L, Array(1f, 0f))).toDF("s_id", "sv")
    val tgt = Seq((10L, Array(0.7f, 0.7f)), (11L, Array(0.6f, 0.8f)))
      .toDF("t_id", "tv")
    // both targets score near the neighbor average → margin ≈ 1; a
    // high threshold filters everything
    val none = Similarity.marginMining(src, tgt, "s_id", "t_id", "sv", "tv",
      k = 2, minMargin = 1.5)
    assert(none.count() == 0)
  }

  test("turnPairDedup: repeated (user, assistant) pairs flag past first occurrence") {
    import spark.implicits._
    def conv(pairs: (String, String)*): String =
      pairs.flatMap { case (u, a) => Seq(
        s"""{"role":"user","content":"$u"}""",
        s"""{"role":"assistant","content":"$a"}""") }
        .mkString("[", ",", "]")
    val df = Seq(
      (1L, conv(("hi there", "hello"), ("bye", "cya"))),
      (2L, conv(("HI  THERE", "Hello"), ("other", "stuff"))), // pair 1 dup (normalized)
      (3L, conv(("hi there", "hello"), ("hi there", "hello"))), // both dup
      (4L, "not json")).toDF("id", "conv")
    val out = Chat.turnPairDedup(df, "id", "conv").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 0L))) // first occurrences
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((2L, 2L))) // both its pairs repeat conv 1's first
    assert(!out.contains(4L))     // invalid json has no pairs
  }

  test("responseTemplateScan counts assistant turns with canned phrases") {
    import spark.implicits._
    val df = Seq(
      (1L, """[{"role":"user","content":"q"},{"role":"assistant","content":"As an AI language model, no."}]"""),
      (2L, """[{"role":"user","content":"As an AI language model"},{"role":"assistant","content":"sure thing"}]"""),
      (3L, "broken")).toDF("id", "conv")
    val out = Chat.responseTemplateScan(df, "id", "conv",
        Seq("as an AI language model"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((1L, 1L, true)))
    assert(out(2L) == ((1L, 0L, false))) // user-side phrase doesn't flag
    assert(out(3L) == ((0L, 0L, false))) // invalid json -> zero turns
  }
}
