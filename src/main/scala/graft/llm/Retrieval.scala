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

  /** nDCG@k with graded relevance (Järvelin & Kekäläinen 2002) — the
    * metric that rewards putting HIGHLY relevant docs first, where
    * [[retrievalMetrics]]' binary hits cannot distinguish orderings.
    * `graded` holds (queryCol, idCol, gradeCol ≥ 0); unlisted docs
    * grade 0. DCG = Σ (2^grade − 1)/log2(rank+1) over the retrieved
    * top-k; IDCG re-ranks the query's full graded set ideally (grade
    * desc, id asc). Output per query: `dcg`, `idcg`, `ndcg` (6 dp;
    * 0.0 when the query has no graded docs at all).
    */
  def ndcgAtK(ranking: DataFrame, graded: DataFrame,
      queryCol: String, idCol: String, rankCol: String, gradeCol: String,
      k: Int = 10): DataFrame = {
    def gain(g: Column): Column = (pow(lit(2.0), g.cast("double")) - 1.0)
    def discount(r: Column): Column = log(2.0, r.cast("double") + 1.0)
    val dcg = ranking.filter(col(rankCol) <= k)
      .join(graded.select(col(queryCol), col(idCol),
        col(gradeCol).as("_g")), Seq(queryCol, idCol), "left")
      .groupBy(col(queryCol))
      .agg(sum(gain(coalesce(col("_g"), lit(0))) / discount(col(rankCol)))
        .as("_dcg"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(gradeCol).desc, col(idCol))
    val idcg = graded.filter(col(gradeCol) > 0)
      .withColumn("_ir", row_number().over(w))
      .filter(col("_ir") <= k)
      .groupBy(col(queryCol))
      .agg(sum(gain(col(gradeCol)) / discount(col("_ir"))).as("_idcg"))
    dcg.join(idcg, Seq(queryCol), "left")
      .select(col(queryCol),
        round(col("_dcg"), 6).as("dcg"),
        round(coalesce(col("_idcg"), lit(0.0)), 6).as("idcg"),
        round(coalesce(col("_dcg") / col("_idcg"), lit(0.0)), 6).as("ndcg"))
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
