package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval composition and evaluation: rank fusion across retrievers
  * and the standard quality metrics — the glue between the engine's
  * lexical side (BM25, l75/l80) and its dense side (cosine/ANN,
  * l05/l72) that makes them a HYBRID retriever, plus the scoreboard a
  * retrieval pipeline is tuned against.
  *
  * Scale shape: both operators consume RANKINGS (per-query top-k
  * frames — already small by construction: queries × k rows), so
  * every join here is query-keyed over bounded inputs; the corpus is
  * only touched by the upstream retrievers.
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009):
    * `score(d) = Σ_r 1/(k + rank_r(d))` over the rankings that
    * retrieved d. The standard zero-tuning hybrid-search combiner —
    * robust because it only consumes ranks, never incomparable raw
    * scores. Each input holds (queryCol, idCol, rankCol); documents
    * absent from one ranking contribute nothing from it. Output:
    * per query the fused top-`topK` with `rrf_score` (6 dp — exact
    * rational sums, identically computable in any engine) and the
    * fused `rank` (ties break to the smaller id).
    */
  def rrfFusion(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    val contribs = rankings.map(_.select(col(queryCol), col(idCol),
      (lit(1.0) / (lit(k) + col(rankCol))).as("_c")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col(queryCol), col(idCol))
      .agg(round(sum(col("_c")), 6).as("rrf_score"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_score").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Ranking-quality scoreboard against a gold relevance set:
    * per query `n_relevant`, `first_hit_rank` (null when no relevant
    * doc was retrieved), reciprocal rank (0.0 then), and hit@1/5/10.
    * Aggregate with a mean over queries for MRR — kept per-query here
    * so the report shows WHICH queries fail.
    */
  def retrievalMetrics(ranking: DataFrame, relevant: DataFrame,
      queryCol: String, idCol: String, rankCol: String): DataFrame = {
    val rel = relevant.select(col(queryCol), col(idCol))
      .distinct().withColumn("_rel", lit(true))
    val hits = ranking.select(col(queryCol), col(idCol), col(rankCol))
      .join(rel, Seq(queryCol, idCol), "left")
    hits.groupBy(col(queryCol))
      .agg(
        sum(when(col("_rel"), 1L).otherwise(0L)).as("n_relevant_retrieved"),
        min(when(col("_rel"), col(rankCol))).as("first_hit_rank"))
      .select(col(queryCol), col("n_relevant_retrieved"),
        col("first_hit_rank"),
        round(coalesce(lit(1.0) / col("first_hit_rank"), lit(0.0)), 6)
          .as("reciprocal_rank"),
        coalesce(col("first_hit_rank") <= 1, lit(false)).as("hit_at_1"),
        coalesce(col("first_hit_rank") <= 5, lit(false)).as("hit_at_5"),
        coalesce(col("first_hit_rank") <= 10, lit(false)).as("hit_at_10"))
  }
}
