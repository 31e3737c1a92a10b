package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("disjoint cliques and a bridge resolve to min-id labels") {
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle {1,2,3}
      (10L, 11L),                                   // pair {10,11}
      (3L, 4L)))                                    // bridge joins 4 to the triangle
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges (pointer jumping beats O(diameter))") {
    // path 0-1-2-...-40: worst case for plain propagation (diameter 40
    // > default maxIter); the jump compresses label chains so the run
    // must reach the fixpoint within the default round budget
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.keySet == (0L to 40L).toSet)
    assert(got.values.forall(_ == 0L))
  }

  test("string vertex ids cluster correctly (witness must not assume numeric labels)") {
    val got = ConnectedComponents.run(
      Seq(("b", "c"), ("a", "b"), ("d", "e"), ("c", "d")).toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "a"))
  }

  test("empty pair set terminates immediately with an empty result") {
    assert(run(Seq.empty).isEmpty)
  }

  test("duplicate and reversed edges are harmless") {
    val got = run(Seq((2L, 1L), (1L, 2L), (2L, 1L), (5L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("collapseReport attributes drops and clusters to the right stratum") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "web", "aaaa"), (2L, "web", "bb"), (3L, "books", "cccccc"),
      (7L, "web", "dd"), (9L, "books", "e")).toDF("id", "src", "text")
    // cluster {1,2,3}: survivor 1 (web); losers 2 (web, 2 chars), 3 (books, 6)
    val clusters = ConnectedComponents.run(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
    val got = ConnectedComponents.collapseReport(df, clusters, "id", "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got("web") == ((3L, 8L, 1L, 2L, 1L, 0.333333)))
    assert(got("books") == ((2L, 7L, 1L, 6L, 0L, 0.5)))
    clusters.unpersist()
  }

  test("collapseBest keeps the top-scoring member per cluster, ties to min id") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, 10), (2L, 30), (3L, 30), // cluster {1,2,3}: 2 and 3 tie on score
      (7L, 5), (8L, 9),             // cluster {7,8}: 8 wins on score
      (9L, 1)                       // unpaired: survives untouched
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val kept = ConnectedComponents.collapseBest(df, pairs, "a", "b", "id", col("score"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 8L, 9L))
    // min-id collapse on the same input keeps different survivors
    val keptMin = ConnectedComponents.collapse(df, pairs, "a", "b", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptMin == Set(1L, 7L, 9L))
  }
}
