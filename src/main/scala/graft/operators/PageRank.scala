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
  * the common "dangling mass dropped" simplification; pass
  * `redistributeDangling = true` for the stochastic-matrix variant
  * that spreads sink mass uniformly and conserves Σpr = 1.
  * Each iteration's ranks are rounded to 12 dp so two engines
  * summing partial aggregates in different orders stay bit-identical
  * across iterations (the project's float-determinism rule; final
  * consumers round to 6 dp).
  *
  * Scale shape: the edge list with its out-degree is built ONCE
  * (one shuffle) and persisted; each iteration is one shuffle join of
  * O(|E|) rows (contributions keyed by dst) against the previous
  * round's SPARSE mass frame (nodes with in-edges only — the rank
  * expression round(teleport + d·mass, 12) is folded into the
  * contribution sum, so the O(|V|) node frame is zero-fill-joined
  * exactly once, at the end, not per round) — no driver-side state at
  * all, no per-round action (the caller's single materialization
  * executes the whole unrolled plan; at 4-8 iterations the plan stays
  * linear because each mass frame is referenced exactly once). At
  * 100 TB the edges frame dominates: it is hash-partitioned on src by
  * the degree join and reused every round from cache.
  */
object PageRank {

  /** @param edges directed edge list (duplicate edges are collapsed)
    * @param redistributeDangling false (default) = the classic
    *        "dangling mass dropped" simplification documented above;
    *        true = the stochastic-matrix variant: each iteration the
    *        mass sitting on sink nodes (no out-edges) is redistributed
    *        uniformly, pr_{k+1}(v) = (1-d)/N + d·(mass(v) + m_k/N)
    *        with m_k = Σ_{u dangling} pr_k(u), so Σpr stays exactly 1
    *        (up to the 12-dp rounding) — the form the original paper's
    *        random surfer actually defines. Costs one bounded scalar
    *        action per iteration (the dangling total, one double — the
    *        same driver minimum as [[hits]]' normalization totals),
    *        with each iteration's ranks persisted and lineage-cut so
    *        the doubly-referenced rank frame is computed once.
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
      iterations: Int = 4, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // ONE exchange (on src) serves the whole edge-frame build:
    // hash-partitioning on src satisfies the (src,dst) clustering the
    // distinct needs, co-locates the out-degree aggregation, and
    // co-partitions both sides of the degree join — without the
    // explicit repartition each of the three steps shuffles separately
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the per-iteration join input, built once
    val eDeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every helper cache registers here and is released in the finally
    // below — the no-leak contract must hold even when an action throws
    // mid-computation (executor OOM, cancelled job) in a long session
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](eDeg, nodes)
    try {
      val n = nodes.count() // one bounded scalar; also materializes the caches
      val teleport = (1.0 - damping) / n

      if (!redistributeDangling) {
        // pr_k is never MATERIALIZED as a column over the full node
        // frame mid-walk: pr_k(v) = round(teleport + d·mass_k(v), 12)
        // with mass_k(v) defaulting to 0, so each iteration folds that
        // expression into the contribution sum over a LEFT join of the
        // edge frame with the previous round's SPARSE mass frame
        // (only nodes with in-edges — ≤ |V| rows, vs the full rank
        // frame before). The per-round zero-fill join with the O(|V|)
        // node frame is gone; the node frame is touched once, by the
        // final zero-fill. Arithmetic is bit-identical: same 12-dp
        // round before use, same decimal contribution terms (an
        // absent mass row contributes round(teleport, 12)/outdeg
        // exactly as the zero-filled row did).
        var mass: DataFrame = null // (id, mass); null = uniform init
        for (_ <- 1 to iterations) {
          val (joined, prSrc) =
            if (mass == null) (eDeg, round(lit(1.0 / n), 12))
            else (eDeg.join(mass.withColumnRenamed("id", "src"),
                Seq("src"), "left"),
              round(lit(teleport) +
                lit(damping) * coalesce(col("mass"), lit(0.0)), 12))
          mass = joined
            .groupBy(col("dst").as("id"))
            .agg(sum((prSrc / col("outdeg")).cast("decimal(28,18)")).cast("double").as("mass"))
        }
        val ranks = nodes
          .join(mass, Seq("id"), "left")
          .select(col("id"),
            round(lit(teleport) + lit(damping) * coalesce(col("mass"), lit(0.0)), 12).as("pr"))
        return ranks.localCheckpoint() // eager: one pass over the unrolled plan
      }

      // stochastic-matrix variant: ranks_k is referenced twice per round
      // (dangling total + contributions), so persist it and cut lineage
      // the same way [[hits]] does; the dangling total stays IN-PLAN as
      // a broadcast 1-row frame (as in [[hits]]' normalization), so the
      // whole recursion executes as one submitted job with no blocking
      // per-iteration driver actions
      val spark = edges.sparkSession
      val dangling = nodes.join(deg.select(col("src").as("id")), Seq("id"),
        "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
      cached += dangling
      var ranks = nodes.withColumn("pr", round(lit(1.0 / n), 12))
      for (_ <- 1 to iterations) {
        val r = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        cached += r
        val dm = r.join(dangling, "id")
          .agg((coalesce(sum(col("pr").cast("decimal(28,18)")), lit(0))
            .cast("double") / n).as("_dm"))
        val rCut = spark.createDataFrame(r.rdd, r.schema)
        val contribs = eDeg
          .join(rCut.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum((col("pr") / col("outdeg")).cast("decimal(28,18)")).cast("double").as("mass"))
        ranks = nodes
          .join(contribs, Seq("id"), "left")
          .crossJoin(broadcast(dm))
          .select(col("id"),
            round(lit(teleport) +
              lit(damping) * (coalesce(col("mass"), lit(0.0)) + col("_dm")),
              12).as("pr"))
      }
      ranks.localCheckpoint()
    } finally cached.foreach(_.unpersist())
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
    * Scale shape: the edge+degree frame is built once and persisted
    * (as in [[run]]), but the per-iteration frontier is SPARSE — only
    * nodes with nonzero trust join the edge frame, which on a
    * seeded web graph is a small fraction of |V| in the early rounds
    * and never exceeds the reachable set. The O(|V|) node frame is
    * touched exactly once, by the final zero-fill join.
    */
  def personalized(edges: DataFrame, seeds: DataFrame,
      srcCol: String, dstCol: String, seedCol: String,
      iterations: Int = 4, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // same single-exchange edge build as [[run]]
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    try {
    val seedSet = seeds.select(col(seedCol).as("id")).distinct()
    val nS = seedSet.count() // bounded: seeds are a vetted handful
    // No seeds (empty graph, or a seed filter that matched nothing):
    // the teleport vector is identically zero, so every node's trust is
    // zero — return the zero-filled node frame instead of crashing the
    // job. On an empty graph that frame is itself empty.
    if (nS == 0) {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      return nodes.select(col("id"), lit(0.0).as("trust")).localCheckpoint()
    }
    // the teleport vector is nonzero ONLY on seeds, so it lives as a
    // small (|S|-row) frame, not a column on the full node set
    val seedT = seedSet.withColumn("t", round(lit(1.0 / nS), 12))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {

    // SPARSE iteration: a node with pr = 0 contributes 0/outdeg = 0
    // mass, so it can be dropped from the rank frontier entirely —
    // pr_{k+1} = (1-d)·t + d·mass reconstructs it as 0 whenever it
    // reappears. Early rounds then join only the seed-reachable
    // frontier against the edge frame instead of all |V| nodes; on a
    // real web graph (seeds are a vetted handful, spam farms are far
    // from every seed) most of the graph never enters the frontier at
    // all. Worst case (everything reachable) degrades gracefully to
    // the dense plan minus its zero rows. Values are bit-identical:
    // the decimal partial sums see the same nonzero terms.
    var ranks = seedT.select(col("id"), col("t").as("pr"))
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum((col("pr") / col("outdeg")).cast("decimal(28,18)")).cast("double").as("mass"))
      ranks = seedT
        .join(contribs, Seq("id"), "full_outer")
        .select(col("id"),
          round(lit(1.0 - damping) * coalesce(col("t"), lit(0.0)) +
            lit(damping) * coalesce(col("mass"), lit(0.0)), 12).as("pr"))
        .filter(col("pr") =!= 0.0)
    }
    // the full node universe is only needed once, for the final
    // zero-fill of never-reached nodes
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // eager checkpoint + exception-safe helper-cache release: same
    // no-leak contract as [[run]]
    nodes
      .join(ranks, Seq("id"), "left")
      .select(col("id"), coalesce(col("pr"), lit(0.0)).as("trust"))
      .localCheckpoint()
    } finally seedT.unpersist()
    } finally eDeg.unpersist()
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
    // partition the cached edge frame on src: the (src,dst) clustering
    // distinct needs is satisfied, and every hub-side join then reads
    // the cache in place (the auth-side join still exchanges e — one
    // exchange per iteration instead of two)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](e, nodes)
    try {
    // no eager nodes.count() here (r14 opt): unlike [[run]], nothing
    // in HITS needs |V| as a literal — the first normalization total
    // materializes both caches inside its own job, so the warm-up
    // count was one pure extra driver round-trip per call

    // each half-iteration is PERSISTED before use: its frame is read
    // twice (once by the normalization total, once downstream) and the
    // next half builds on it — without the cache the doubly-referenced
    // plans replay the whole upstream recursion per reference
    // (measured 18 s vs 1 s at sf0.1 for 2 iterations)
    val spark = edges.sparkSession
    def normalized(scores: DataFrame, valCol: String): DataFrame = {
      val s = scores.persist(StorageLevel.MEMORY_AND_DISK)
      cached += s
      // the normalization total is ONE row — keep it IN-PLAN as a
      // broadcast cross join against the cached half rather than a
      // driver head(): the whole 4-iteration recursion then executes
      // as one submitted job (8 fewer blocking driver round-trips);
      // the broadcast subplans materialize each half's cache in
      // dependency order, and the division arithmetic is identical to
      // the folded-literal form (same decimal sum, same 12-dp round)
      val total = s.agg(
        sum(col(valCol).cast("decimal(28,18)")).cast("double").as("_tot"))
      val n = s.crossJoin(broadcast(total))
        .select(col("id"), round(col(valCol) / col("_tot"), 12).as(valCol))
      // lineage cut via a fresh LogicalRDD over the PERSISTED frame —
      // deliberately NOT localCheckpoint here: the RDD is backed by
      // the cache entry `s` (materialized by the first subplan that
      // reads it), so the cut is free, while an eager checkpoint would
      // write a SECOND copy of every half-iteration's scores. (The
      // final result below does use localCheckpoint — there the extra
      // copy is the output itself and it lets every intermediate cache
      // be released.)
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
    // per-iteration cache exception-safely — the no-leak contract
    // shared with [[run]]. hubs and auths are both zero-filled over
    // the full node frame already (every half left-joins nodes), so
    // the final assembly is one join, not nodes⋈hubs⋈auths.
    hubs.join(auths, "id")
      .select(col("id"), col("h").as("hub"), col("a").as("authority"))
      .localCheckpoint()
    } finally cached.foreach(_.unpersist())
  }
}
