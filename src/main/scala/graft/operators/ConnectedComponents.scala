package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list
  * (SURVEY.md §2.6 L2 "connected components (iterative join)") — the
  * pairs→clusters step of near-duplicate collapse: every vertex ends
  * up labeled with the minimum vertex id of its component.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every vertex takes the minimum label over itself and its
  * neighbors (one shuffle join + min-aggregate), then compresses
  * label chains by one self-join hop (`label(v) := label(label(v))`),
  * which halves the remaining chain length — so convergence needs
  * O(log diameter) rounds instead of O(diameter). The convergence
  * witness rides the PROPAGATE step (each labels row carries its
  * pre-round label as `prev`; neighbor rows contribute null, which
  * `min` skips) as a CollectMetrics observation folded into the one
  * materializing action per round. Detecting convergence there is
  * sound AND lets the final round skip the pointer-jump join entirely:
  * at a propagate fixpoint every edge (u,v) has label(u) ≤ label(v)
  * and label(v) ≤ label(u), so labels are constant per component and
  * the jump is a no-op. Type-agnostic (ids need only be orderable),
  * unlike a numeric label sum.
  *
  * Scale shape: per round two shuffle joins of O(|V| + |E|) rows
  * (propagate, pointer jump — the jump skipped in the final round),
  * one action, no driver-side state beyond the changed count. Near-dup
  * clusters from LSH pair emission are clique-dense (every copy pairs
  * with most others), so real corpora converge in 2-3 rounds.
  */
object ConnectedComponents {

  /** @param pairs edge list; one row per undirected edge
    * @return (`id`, `component`) for every vertex appearing in `pairs`;
    *         `component` = min vertex id of the connected component.
    *         The frame is persisted (MEMORY_AND_DISK) — callers may
    *         `unpersist()` it once downstream results are materialized.
    */
  def run(pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    // every persisted helper registers in `live` so an exception
    // mid-iteration (executor OOM, cancelled job) releases them all —
    // the output frame is removed from the set before return because
    // the CALLER owns that unpersist
    val live = scala.collection.mutable.Set.empty[DataFrame]
    def persisted(f: DataFrame): DataFrame = {
      f.persist(StorageLevel.MEMORY_AND_DISK); live += f; f
    }
    def release(f: DataFrame): Unit = { f.unpersist(); live -= f }
    try {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = persisted(
      fwd.union(fwd.select(col("dst"), col("src")).toDF("src", "dst"))
        .distinct()) // iterated over every round
    var labels: DataFrame = persisted(
      edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id")))
    var backing = labels // the cached frame behind `labels`
    // the previous round's propagate cache: released only after the
    // NEXT round's action has materialized the jump built on top of it
    var prevPropagated: DataFrame = null

    val idType = labels.schema("component").dataType

    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // min over own label and every neighbor's label; each labels row
      // also carries its pre-round label as `prev` (neighbor rows carry
      // null, which min() skips) so the convergence witness needs no
      // join back to the previous round. The witness is observed HERE
      // (CollectMetrics lands during the one materializing count), so
      // a converged round never builds the jump join at all. Works for
      // any orderable id type (a numeric label-sum would cast string
      // ids to null and falsely declare convergence).
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"),
          lit(null).cast(idType).as("prev"))
      val obs = Observation(s"cc_changed_r$round")
      val propagated = persisted(
        labels.select(col("id"), col("component"), col("component").as("prev"))
          .union(viaNeighbors)
          .groupBy("id")
          .agg(min("component").as("component"), min("prev").as("prev"))
          .observe(obs, sum(when(col("component") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
          .select("id", "component"))
      propagated.count() // materialize; metric lands during this one action
      val changed = Option(obs.get("changed")).fold(0L)(_.asInstanceOf[Number].longValue)
      // this count also forced the PREVIOUS round's jump (labels'
      // backing), so the frames it read from are now dead
      if (prevPropagated != null) release(prevPropagated)
      release(backing)
      converged = changed == 0
      if (converged) {
        backing = propagated // already component-constant; no jump needed
      } else {
        // pointer jump: follow the label one hop
        // (label(v) := label(label(v))) — both sides read the cached
        // propagate result
        val jumped = persisted(propagated.alias("x")
          .join(propagated.select(col("id").as("pid"), col("component").as("pcomp")).alias("y"),
            col("x.component") === col("y.pid"), "left")
          .select(col("x.id").as("id"),
            coalesce(col("y.pcomp"), col("x.component")).as("component")))
        // CUT THE LINEAGE: the jump self-join doubles the logical plan
        // every round (exponential analysis cost / OOM past ~8 rounds —
        // the classic iterative-Spark leak); a fresh LogicalRDD over the
        // cached partitions keeps the per-round plan O(1). The jump
        // materializes lazily inside the NEXT round's count (or the
        // caller's first action if maxIter is hit), which is why
        // `propagated` stays cached until then. Deliberately NOT
        // localCheckpoint: that would eagerly write a second copy of
        // the labels per round AND add one action per round, while
        // this cut rides the cache entry the convergence count
        // already materializes.
        labels = spark.createDataFrame(jumped.rdd, jumped.schema)
        backing = jumped
        prevPropagated = propagated
      }
      round += 1
    }
    if (!converged) {
      backing.count() // maxIter exit: materialize the dangling jump
      if (prevPropagated != null) release(prevPropagated)
    }
    release(edges)
    System.err.println(s"[graft] connectedComponents: $round rounds" +
      (if (converged) "" else s" (maxIter=$maxIter hit before fixpoint)"))
    live -= backing // ownership transfers to the caller
    backing // the persisted frame — caller owns the unpersist
    } catch {
      case t: Throwable => live.foreach(_.unpersist()); throw t
    }
  }

  /** Collapse components to survivors: keep the min-id row per
    * component plus every row of `df` that appears in no pair — the
    * shared end-game of near-duplicate dedup (text MinHash, embedding
    * LSH, image dHash). Anti-joins `df` against the LOSER set only
    * (cluster members that are not their component's min), which is
    * small — the corpus itself never rewrites.
    */
  def collapse(df: DataFrame, pairs: DataFrame, aCol: String, bCol: String,
      idCol: String): DataFrame = {
    val clusters = run(pairs, aCol, bCol)
    try {
      // eager localCheckpoint, not persist: the loser set rides the
      // returned plan indefinitely, and RDD-level storage is dropped by
      // the ContextCleaner once the result is unreferenced, while a
      // CacheManager persist entry would outlive it (the leak class
      // this module documents)
      val losers = clusters.filter(col("id") =!= col("component"))
        .select(col("id").as(idCol))
        .localCheckpoint()
      df.join(losers, Seq(idCol), "left_anti")
    } finally clusters.unpersist()
  }

  /** Quality-aware collapse: keep the BEST row per component by
    * `score` (highest wins, ties broken by smallest id) plus every row
    * of `df` in no pair. [[collapse]] keeps the min-id member — the
    * right default when members are interchangeable; real cleaning
    * pipelines instead keep the best representative (Lee et al. 2021
    * keep the LONGEST member of each exact-substring cluster, since
    * truncated re-crawls near-duplicate their full originals).
    *
    * Scale shape: identical to [[collapse]] — the only addition is a
    * per-component `row_number` over the CLUSTER MEMBERS (bounded by
    * near-dup cluster sizes, thousands of small partitions — never the
    * corpus), and the corpus still rewrites nothing: survivors come
    * from one anti-join against the loser ids.
    */
  def collapseBest(df: DataFrame, pairs: DataFrame, aCol: String,
      bCol: String, idCol: String, score: Column): DataFrame = {
    val clusters = run(pairs, aCol, bCol)
    try {
      // same eager-checkpoint loser set as [[collapse]]
      val losers = bestLosers(df, clusters, idCol, score).localCheckpoint()
      df.join(losers, Seq(idCol), "left_anti")
    } finally clusters.unpersist()
  }

  /** [[collapse]] over an ALREADY-COMPUTED clusters frame ([[run]]'s
    * output, typically a persisted artifact shared across consumers —
    * the clusters report, the collapse, and the keep-best collapse all
    * read the same component labeling instead of re-running the
    * iteration). One anti-join; the corpus never rewrites.
    */
  def collapseFromClusters(df: DataFrame, clusters: DataFrame,
      idCol: String): DataFrame =
    df.join(
      clusters.filter(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** [[collapseBest]] over an already-computed clusters frame. */
  def collapseBestFromClusters(df: DataFrame, clusters: DataFrame,
      idCol: String, score: Column): DataFrame =
    df.join(bestLosers(df, clusters, idCol, score), Seq(idCol), "left_anti")

  /** Per-stratum dedup AUDIT over a component labeling ([[run]]'s
    * output): documents in, documents/characters the min-id collapse
    * drops, clusters owned (attributed to the survivor's stratum), and
    * the dedup rate — the dataset-card numbers published after a
    * near-dup pass ("web: 12% near-dup, books: 0.4%").
    *
    * Scale shape: the labeling (near-dup members only — small) joins
    * the corpus once on the id; text lengths reduce at the scan, so
    * text never shuffles; three map-side-combined grouped aggregates
    * over stratum cardinality.
    */
  def collapseReport(df: DataFrame, clusters: DataFrame, idCol: String,
      strataCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strataCol),
      length(col(textCol)).cast("long").as("_dr_nc"))
    val aggIn = base.groupBy(strataCol)
      .agg(count(lit(1)).as("docs_in"), sum("_dr_nc").as("chars_in"))
    val aggDrop = base
      .join(clusters.filter(col("id") =!= col("component")).select("id"), "id")
      .groupBy(strataCol)
      .agg(count(lit(1)).as("docs_dropped"),
        sum("_dr_nc").as("chars_dropped"))
    val aggCl = base
      .join(clusters.filter(col("id") === col("component")).select("id"), "id")
      .groupBy(strataCol).agg(count(lit(1)).as("n_clusters"))
    aggIn.join(aggDrop, Seq(strataCol), "left")
      .join(aggCl, Seq(strataCol), "left")
      .select(col(strataCol), col("docs_in"), col("chars_in"),
        coalesce(col("docs_dropped"), lit(0L)).as("docs_dropped"),
        coalesce(col("chars_dropped"), lit(0L)).as("chars_dropped"),
        coalesce(col("n_clusters"), lit(0L)).as("n_clusters"),
        round(coalesce(col("docs_dropped"), lit(0L)) / col("docs_in"), 6)
          .as("dedup_rate"))
  }

  private def bestLosers(df: DataFrame, clusters: DataFrame,
      idCol: String, score: Column): DataFrame = {
    val members = df
      .select(col(idCol).as("id"), score.as("_cb_score"))
      .join(clusters, "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("_cb_score").desc, col("id").asc)
    members.withColumn("_cb_rn", row_number().over(w))
      .filter(col("_cb_rn") > 1)
      .select(col("id").as(idCol))
  }
}
