package graft.operators

import org.apache.spark.sql.DataFrame
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
  * witness is a changed-label count against the previous round —
  * type-agnostic (ids need only be orderable), unlike a numeric
  * label sum.
  *
  * Scale shape: per round three shuffle joins of O(|V| + |E|) rows
  * (propagate, pointer jump, changed-count witness), one action, no
  * driver-side state beyond the changed count. Near-dup clusters from
  * LSH pair emission are clique-dense (every copy pairs with most
  * others), so real corpora converge in 2-3 rounds.
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
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst"), col("src")).toDF("src", "dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // iterated over every round
    var backing = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels: DataFrame = backing

    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // min over own label and every neighbor's label
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"))
      // persisted: both sides of the pointer-jump self-join read it
      val propagated = labels.select("id", "component").union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jump: follow the label one hop (label(v) := label(label(v)))
      val next = propagated.alias("x")
        .join(propagated.select(col("id").as("pid"), col("component").as("pcomp")).alias("y"),
          col("x.component") === col("y.pid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.pcomp"), col("x.component")).as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // convergence witness: did any vertex's label change this round?
      // The full count also materializes the persisted frame. Works for
      // any orderable id type (a numeric label-sum would cast string
      // ids to null and falsely declare convergence).
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      // CUT THE LINEAGE: the jump self-join doubles the logical plan
      // every round (exponential analysis cost / OOM past ~8 rounds —
      // the classic iterative-Spark leak); a fresh LogicalRDD over the
      // cached partitions keeps the per-round plan O(1)
      labels = spark.createDataFrame(next.rdd, next.schema)
      backing.unpersist()
      propagated.unpersist()
      backing = next
      converged = changed == 0
      round += 1
    }
    edges.unpersist()
    System.err.println(s"[graft] connectedComponents: $round rounds" +
      (if (converged) "" else s" (maxIter=$maxIter hit before fixpoint)"))
    backing // the persisted frame — caller owns the unpersist
  }
}
