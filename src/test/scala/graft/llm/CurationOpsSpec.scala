package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wave-8 curation operators: weighted sampling, TrustRank, MaxSim. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------- weightedSample

  test("weightedSample takes exactly k per group and is repartition-invariant") {
    val df = (0L until 200L).map(i => (s"g${i % 4}", i, (i % 7 + 1).toDouble))
      .toDF("grp", "id", "w")
    val a = Corpus.weightedSample(df, "grp", "id", col("w"), k = 5)
    assert(a.groupBy("grp").count().as[(String, Long)].collect()
      .forall(_._2 == 5))
    val b = Corpus.weightedSample(df.repartition(7), "grp", "id", col("w"), k = 5)
    assert(a.select("grp", "id", "pick").as[(String, Long, Int)].collect().toSet ==
      b.select("grp", "id", "pick").as[(String, Long, Int)].collect().toSet)
  }

  test("weightedSample favors heavy rows at the Efraimidis-Spirakis rate") {
    // 100 groups of (heavy w=100, light w=1): P(heavy first) = 100/101
    // per group; the hash-u draw is deterministic, so the count is a
    // fixed number that must sit near the expectation, not at 50%
    val rows = (0L until 100L).flatMap(g =>
      Seq((s"g$g", 2 * g, 100.0), (s"g$g", 2 * g + 1, 1.0)))
    val df = rows.toDF("grp", "id", "w")
    val winners = Corpus.weightedSample(df, "grp", "id", col("w"), k = 1)
      .select("id").as[Long].collect()
    val heavyWins = winners.count(_ % 2 == 0)
    assert(heavyWins >= 90, s"heavy rows won only $heavyWins/100 groups")
  }

  test("weightedSample drops non-positive and null weights") {
    val df = Seq(("g", 1L, 2.0), ("g", 2L, 0.0), ("g", 3L, -1.0))
      .toDF("grp", "id", "w")
    val kept = Corpus.weightedSample(df, "grp", "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  // -------------------------------------------------- TrustRank

  test("TrustRank gives zero trust to components unreachable from seeds") {
    // two disjoint triangles; seeds only in the first
    val tri1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val tri2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val trust = graft.operators.PageRank.personalized(
      (tri1 ++ tri2).toDF("src", "dst"), seeds, "src", "dst", "id")
      .as[(Long, Double)].collect().toMap
    assert(trust(10L) == 0.0 && trust(11L) == 0.0 && trust(12L) == 0.0)
    assert(trust(1L) > 0.1) // the seed keeps its teleport share
    assert(trust(2L) > 0.0) // downstream of the seed
  }

  test("TrustRank decays with distance from the seed along a chain") {
    // 1 -> 2 -> 3 -> 4 -> 5, seed at 1: monotone decay
    val edges = (1L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val trust = graft.operators.PageRank.personalized(
      edges, Seq(Tuple1(1L)).toDF("id"), "src", "dst", "id",
      iterations = 6)
      .as[(Long, Double)].collect().toMap
    assert(trust(1L) > trust(2L) && trust(2L) > trust(3L) &&
      trust(3L) > trust(4L) && trust(4L) > trust(5L))
  }

  // -------------------------------------------------- MaxSim

  test("maxSimTopK ranks exact token overlap above partial above none") {
    def basis(i: Int): Array[Float] = {
      val a = Array.fill(4)(0f); a(i) = 1f; a
    }
    val q = Seq((100L, Array(basis(0), basis(1))))
      .toDF("q_id", "q_toks")
    val corpus = Seq(
      (1L, Array(basis(0), basis(1))), // both tokens match: score 2
      (2L, Array(basis(0), basis(2))), // one matches: score 1
      (3L, Array(basis(2), basis(3)))) // none: score 0
      .toDF("d_id", "d_toks")
    val out = Similarity.maxSimTopK(q, corpus, "q_id", "d_id",
        "q_toks", "d_toks", k = 3)
      .select("d_id", "score", "rk").as[(Long, Double, Int)]
      .collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSeq == Seq(2.0, 1.0, 0.0))
  }

  test("labelNoiseAudit flags the mislabeled point inside the wrong cluster") {
    // two tight clusters on orthogonal axes; vec 99 sits in cluster B
    // but carries label A — its neighbors all disagree
    def around(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(4)(0.01f * (i % 3)); v(axis) = 1f; v
    }
    val rows =
      (0 until 10).map(i => (i.toLong, 0, around(0, i))) ++
      (10 until 20).map(i => (i.toLong, 1, around(1, i))) :+
      ((99L, 0, around(1, 7))) // label 0, lives with cluster 1
    val out = Similarity.labelNoiseAudit(
      rows.toDF("vec_id", "label", "embedding"), "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(99L).getAs[Boolean]("flagged"))
    assert(out(99L).getAs[Double]("noise_score") == 1.0)
    // clean members are not flagged (their 5-NN include 99 at worst)
    (0L until 10L).foreach(i =>
      assert(!out(i).getAs[Boolean]("flagged"), s"vec $i"))
  }

  test("semanticContamination catches the paraphrase twin, not the orthogonal doc") {
    val bench = Seq((100L, Array(1f, 0f, 0f))).toDF("b_id", "bv")
    val corpus = Seq(
      (1L, Array(0.999f, 0.02f, 0f)), // near-copy of the bench vector
      (2L, Array(0f, 1f, 0f)),        // unrelated
      (3L, Array(0.7f, 0.7f, 0f)))    // related but below threshold
      .toDF("c_id", "cv")
    val out = Similarity.semanticContamination(
      corpus, bench, "c_id", "b_id", "cv", "bv", minCos = 0.99)
      .select("c_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("maxSimTopK rewards the best-matching token per query token (not the average)") {
    // single-vector cosine of d1 to q is mediocre on every dim, while
    // d2 holds ONE exact q-token — MaxSim must prefer d2's spike
    val q = Seq((100L, Array(Array(1f, 0f, 0f, 0f))))
      .toDF("q_id", "q_toks")
    val spread = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val corpus = Seq(
      (1L, Array(spread, spread)),
      (2L, Array(Array(1f, 0f, 0f, 0f), Array(0f, 0f, 0f, 1f))))
      .toDF("d_id", "d_toks")
    val out = Similarity.maxSimTopK(q, corpus, "q_id", "d_id",
        "q_toks", "d_toks", k = 1)
      .select("d_id").as[Long].head()
    assert(out == 2L)
  }
}
