package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over a directed edge list (Page/Brin/Motwani/
  * Winograd 1999) — the link-centrality signal a crawl-scale training
  * pipeline uses to prioritize fetches and weight document quality
  * (Common Crawl publishes exactly this ranking per crawl; CCNet-style
  * curation consumes it as a source-quality prior).
  *
  * Semantics: fixed-iteration power method with damping d,
  *   pr_{k+1}(v) = (1-d)/N + d · Σ_{(u,v)∈E} pr_k(u)/outdeg(u),
  * over the node set = every distinct edge endpoint. Self-loops are
  * legal (a node linking itself). Nodes with no out-edges contribute
  * no mass (their (1-d)/N teleport share still arrives everywhere) —
  * the common "dangling mass dropped" simplification; callers who need
  * the stochastic-matrix variant can add a sink edge per dangling node
  * first. Each iteration's ranks are rounded to 12 dp so two engines
  * summing partial aggregates in different orders stay bit-identical
  * across iterations (the project's float-determinism rule; final
  * consumers round to 6 dp).
  *
  * Scale shape: the edge list with its out-degree is built ONCE
  * (one shuffle) and persisted; each iteration is one shuffle join of
  * O(|E|) rows (contributions keyed by dst) plus a broadcast-friendly
  * left join back onto the O(|V|) node frame — no driver-side state at
  * all, no per-round action (the caller's single materialization
  * executes the whole unrolled plan; at 4-8 iterations the plan stays
  * linear because each rank frame is referenced exactly once). At
  * 100 TB the edges frame dominates: it is hash-partitioned on src by
  * the degree join and reused every round from cache.
  */
object PageRank {

  /** @param edges directed edge list (duplicate edges are collapsed)
    * @return (`id`, `pr`) for every distinct endpoint, ranks rounded
    *         to 12 dp per iteration. The result is an EAGER local
    *         checkpoint: the helper caches (edge+degree frame, node
    *         frame) are released before return — nothing accumulates
    *         across repeated calls in a long-lived session — and the
    *         result's own blocks are RDD-level storage the
    *         ContextCleaner drops once the frame is unreferenced
    *         (CacheManager entries from `persist` are never
    *         auto-dropped; that was a leak).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the per-iteration join input, built once
    val eDeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one bounded scalar; also materializes the caches
    val teleport = (1.0 - damping) / n

    var ranks = nodes.withColumn("pr", round(lit(1.0 / n), 12))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum((col("pr") / col("outdeg")).cast("decimal(28,18)")).cast("double").as("mass"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(teleport) + lit(damping) * coalesce(col("mass"), lit(0.0)), 12).as("pr"))
    }
    val out = ranks.localCheckpoint() // eager: one pass over the unrolled plan
    eDeg.unpersist(); nodes.unpersist()
    out
  }

  /** Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina &
    * Pedersen 2004): the teleport vector concentrates on a SEED set
    * instead of spreading uniformly, so rank flows outward from
    * hand-vetted trusted pages — the crawl-side spam demotion signal
    * (spam farms far from every seed end up with near-zero trust no
    * matter how densely they interlink). Initial mass and per-round
    * teleport are 1/|S| on seeds, 0 elsewhere; everything else matches
    * [[run]], including the per-iteration 12-dp rounding contract.
    *
    * Scale shape: identical to [[run]] plus one broadcast-friendly
    * left join of the O(|V|) node frame against the seed list per
    * setup (seeds are small by definition — they are manually vetted).
    */
  def personalized(edges: DataFrame, seeds: DataFrame,
      srcCol: String, dstCol: String, seedCol: String,
      iterations: Int = 4, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col(seedCol).as("id")).distinct()
    val nS = seedSet.count() // bounded: seeds are a vetted handful
    require(nS > 0, "TrustRank needs at least one seed")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(seedSet.withColumn("_t", round(lit(1.0 / nS), 12)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_t"), lit(0.0)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    var ranks = nodes.select(col("id"), col("t").as("pr"))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum((col("pr") / col("outdeg")).cast("decimal(28,18)")).cast("double").as("mass"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"), col("t"),
          round(lit(1.0 - damping) * col("t") +
            lit(damping) * coalesce(col("mass"), lit(0.0)), 12).as("pr"))
        .select(col("id"), col("t"), col("pr"))
    }
    // eager checkpoint + helper-cache release: same no-leak contract
    // as [[run]]
    val out = ranks.select(col("id"), col("pr").as("trust")).localCheckpoint()
    eDeg.unpersist(); nodes.unpersist()
    out
  }

  /** HITS hubs & authorities (Kleinberg 1999): the complementary
    * centrality pair to PageRank — an AUTHORITY is pointed at by good
    * hubs, a HUB points at good authorities. One mutual-recursion
    * iteration is two shuffle joins over the shared edge frame:
    * a(v) = Σ_{u→v} h(u), then h(u) = Σ_{u→v} a(v), each then
    * normalized. Normalization is by SUM (not the textbook L2) so the
    * values stay exactly reproducible across engines — sum
    * normalization preserves the ranking and keeps the oracle's
    * unrolled-CTE arithmetic identical; each iteration rounds to
    * 12 dp (the project's cross-engine float contract).
    *
    * Scale shape: the edge frame is built once and persisted; per
    * iteration two shuffle joins of O(|E|) + two 1-row broadcast
    * totals. No driver state.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4): DataFrame = {
    // below 1 iteration the auth frame is never built — fail loudly
    // instead of a downstream NullPointerException
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    // each half-iteration is PERSISTED before use: its frame is read
    // twice (once by the normalization total, once downstream) and the
    // next half builds on it — without the cache the doubly-referenced
    // plans replay the whole upstream recursion per reference
    // (measured 18 s vs 1 s at sf0.1 for 2 iterations)
    val spark = edges.sparkSession
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def normalized(scores: DataFrame, valCol: String): DataFrame = {
      val s = scores.persist(StorageLevel.MEMORY_AND_DISK)
      cached += s
      // the total is ONE double per half-iteration — the same driver
      // minimum as ConnectedComponents' changed-count; folding it back
      // as a literal (instead of a broadcast cross join) keeps each
      // half's plan a single cached-scan projection, and the lineage
      // cut stops the halves from stacking into one deep plan
      val total = s.agg(sum(col(valCol).cast("decimal(28,18)")).cast("double"))
        .head().getDouble(0)
      val n = s.select(col("id"), round(col(valCol) / lit(total), 12).as(valCol))
      // lineage cut via a fresh LogicalRDD over the PERSISTED frame —
      // deliberately NOT localCheckpoint here: the RDD is backed by
      // the cache entry `s` just materialized, so the cut is free,
      // while an eager checkpoint would write a SECOND copy of every
      // half-iteration's scores. (The final result below does use
      // localCheckpoint — there the extra copy is the output itself
      // and it lets every intermediate cache be released.)
      spark.createDataFrame(n.rdd, n.schema)
    }
    var hubs = nodes.withColumn("h", lit(1.0))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      auths = normalized(
        nodes.join(
          e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(sum(col("h").cast("decimal(28,18)")).cast("double").as("a")),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("a"), lit(0.0)).as("a")), "a")
      hubs = normalized(
        nodes.join(
          e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id")).agg(sum(col("a").cast("decimal(28,18)")).cast("double").as("h")),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("h"), lit(0.0)).as("h")), "h")
    }
    // eager checkpoint (not CacheManager persist: those entries are
    // never auto-dropped and leaked across calls), then release every
    // per-iteration cache — the no-leak contract shared with [[run]]
    val out = nodes.join(hubs, "id").join(auths, "id")
      .select(col("id"), col("h").as("hub"), col("a").as("authority"))
      .localCheckpoint()
    cached.foreach(_.unpersist())
    e.unpersist(); nodes.unpersist()
    out
  }
}
