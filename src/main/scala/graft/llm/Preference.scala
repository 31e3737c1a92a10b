package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data (RLHF / DPO prep) audits. A preference corpus is a
  * set of per-prompt pairwise judgments (winner, loser); before
  * training a reward model on it the standard hygiene passes are a
  * CONSISTENCY audit (cyclic judgments A≻B≻C≻A cannot come from any
  * scalar reward — they mark noisy or conflicting annotation batches
  * for re-review) and a LENGTH-BIAS audit (the rate at which the
  * longer response wins — the best-documented annotation artifact;
  * a high rate means the reward model will learn verbosity).
  *
  * Scale shape: everything is keyed by (prompt, response) — the
  * triangle enumeration is two equi-joins on that compound key, so
  * candidate volume is bounded per prompt group (preference sets are
  * small per prompt by construction: one annotation batch), never a
  * corpus-wide cross product; the length-bias pass is one join onto
  * response lengths + one hash aggregation. Both are
  * straight-through Catalyst plans — no iteration, no driver state.
  */
object Preference {

  /** Directed 3-cycles (A≻B, B≻C, C≻A) within each prompt group,
    * one row per triangle in canonical rotation (`n1` = smallest
    * response id, edges n1→n2→n3→n1). Duplicate judgments collapse
    * first; a triangle is reported once regardless of how many
    * annotators asserted each edge.
    */
  def cycleAudit(prefs: DataFrame, promptCol: String,
      winCol: String, loseCol: String): DataFrame = {
    val e = prefs.select(col(promptCol).as("p"),
      col(winCol).as("w"), col(loseCol).as("l")).distinct()
    val x = e.select(col("p"), col("w").as("xw"), col("l").as("xl"))
    val y = e.select(col("p"), col("w").as("yw"), col("l").as("yl"))
    val z = e.select(col("p"), col("w").as("zw"), col("l").as("zl"))
    x.join(y, Seq("p")).filter(col("xl") === col("yw"))
      .join(z, Seq("p"))
      .filter(col("yl") === col("zw") && col("zl") === col("xw"))
      // each triangle appears under its 3 rotations; keep the one
      // anchored at the smallest id
      .filter(col("xw") < col("yw") && col("xw") < col("zw"))
      .select(col("p").as(promptCol), col("xw").as("n1"),
        col("yw").as("n2"), col("zw").as("n3"))
  }

  /** Per-prompt length-bias report: of the non-tied judgments, how
    * often did the longer response win? Output per prompt:
    * `n_pairs`, `n_longer_wins`, `n_ties` (equal lengths), and
    * `longer_win_rate` (6 dp; 0.0 when every pair tied).
    *
    * `lengths` maps response id → length (e.g. char or token count);
    * judgments whose winner or loser has no length row are dropped
    * (corrupt references — they cannot be judged either way).
    */
  def lengthBias(prefs: DataFrame, lengths: DataFrame,
      promptCol: String, winCol: String, loseCol: String,
      idCol: String, lenCol: String): DataFrame = {
    val wl = lengths.select(col(idCol).as("_w"), col(lenCol).as("w_len"))
    val ll = lengths.select(col(idCol).as("_l"), col(lenCol).as("l_len"))
    prefs.select(col(promptCol).as("p"),
        col(winCol).as("_w"), col(loseCol).as("_l"))
      .join(wl, "_w").join(ll, "_l")
      .groupBy(col("p").as(promptCol))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("w_len") > col("l_len"), 1L).otherwise(0L))
          .as("n_longer_wins"),
        sum(when(col("w_len") === col("l_len"), 1L).otherwise(0L))
          .as("n_ties"))
      .select(col(promptCol), col("n_pairs"), col("n_longer_wins"),
        col("n_ties"),
        round(col("n_longer_wins").cast("double") /
          greatest(col("n_pairs") - col("n_ties"), lit(1L)), 6)
          .as("longer_win_rate"))
  }
}
