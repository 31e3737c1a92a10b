package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
  * witness is folded into the round itself: the previous label rides
  * along as a `prev` column (labels rows carry it, neighbor rows
  * contribute null, `min` ignores nulls), so "did anything change" is
  * a filter+count over the already-persisted round result — no extra
  * join. Type-agnostic (ids need only be orderable), unlike a numeric
  * label sum.
  *
  * Scale shape: per round two shuffle joins of O(|V| + |E|) rows
  * (propagate, pointer jump), one action, no driver-side state beyond
  * the changed count. Near-dup clusters from LSH pair emission are
  * clique-dense (every copy pairs with most others), so real corpora
  * converge in 2-3 rounds.
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

    val idType = backing.schema("component").dataType

    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // min over own label and every neighbor's label; each labels row
      // also carries its pre-round label as `prev` (neighbor rows carry
      // null, which min() skips) so the convergence witness needs no
      // join back to the previous round.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"),
          lit(null).cast(idType).as("prev"))
      // persisted: both sides of the pointer-jump self-join read it
      val propagated = labels.select(col("id"), col("component"), col("component").as("prev"))
        .union(viaNeighbors)
        .groupBy("id")
        .agg(min("component").as("component"), min("prev").as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jump: follow the label one hop (label(v) := label(label(v)))
      val jumped = propagated.alias("x")
        .join(propagated.select(col("id").as("pid"), col("component").as("pcomp")).alias("y"),
          col("x.component") === col("y.pid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.pcomp"), col("x.component")).as("component"),
          col("x.prev").as("prev"))
      // convergence witness: CollectMetrics piggy-backed on the
      // materializing count — the changed total is computed while rows
      // stream into the cache, so the round needs no witness join and
      // the persisted frame stays (id, component). Works for any
      // orderable id type (a numeric label-sum would cast string ids
      // to null and falsely declare convergence).
      val obs = Observation(s"cc_changed_r$round")
      val next = jumped
        .observe(obs, sum(when(col("component") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
        .select("id", "component")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize; metric lands during this one action
      val changed = Option(obs.get("changed")).fold(0L)(_.asInstanceOf[Number].longValue)
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
