package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (SURVEY.md §2.6 L3).
  *
  * Dot products run through codegen'd higher-order functions
  * (`zip_with` + `aggregate`) with an explicit float→double cast before
  * arithmetic and a sequential fold — deterministic, and bit-identical
  * with the DuckDB oracle's `list_sum(list_transform(list_zip(...)))`.
  */
object Similarity {

  /** Embedding-column hygiene audit — the ingestion QA pass before any
    * vector index build: per group, counts of NULL vectors, RAGGED
    * vectors (length ≠ `expectedDim` — a schema-drift symptom), vectors
    * containing NaN (upstream fp blowups), ZERO-NORM vectors (cosine
    * is undefined on them — they poison top-k silently), and clean
    * rows. Every downstream operator here assumes clean input; this is
    * the gate that makes that assumption checkable.
    *
    * The five classes PARTITION the rows — each vector is counted
    * exactly once, under the first matching flag in the precedence
    * chain null > ragged > nan > zero_norm > ok (a ragged vector that
    * also carries NaN counts only as ragged), so per-group counts
    * always sum to `n_vecs`.
    *
    * One scan + one small aggregation; the flags are HOF expressions
    * over the array (no shuffle beyond the group-by).
    */
  def embeddingHygiene(vecs: DataFrame, vecCol: String, groupCol: String,
      expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    val isNull = v.isNull
    val ragged = !isNull && size(v) =!= expectedDim
    val hasNan = !isNull && !ragged && exists(v, x => isnan(x.cast("double")))
    val zeroNorm = !isNull && !ragged && !hasNan &&
      aggregate(v, lit(0.0d), (acc, x) =>
        acc + x.cast("double") * x.cast("double")) === 0.0
    def cnt(c: Column, as: String) =
      sum(when(c, 1L).otherwise(0L)).as(as)
    vecs.groupBy(groupCol).agg(
      count(lit(1)).as("n_vecs"),
      cnt(isNull, "n_null"),
      cnt(ragged, "n_ragged"),
      cnt(hasNan, "n_nan"),
      cnt(zeroNorm, "n_zero_norm"),
      cnt(!isNull && !ragged && !hasNan && !zeroNorm, "n_ok"))
  }

  /** Codegen'd (graft.functions.FloatDot) — sequential double fold,
    * bit-identical with the interpreted `aggregate(zip_with(...))`
    * formulation and with the DuckDB list-fold oracle, but ~4× faster
    * (HOFs are CodegenFallback).
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass kernel (graft.functions.FloatCosine) —
    * bit-identical to `dot(a,b) / (norm(a) * norm(b))` (same per-sum
    * fold order, same sqrt/division) but one array pass instead of
    * three; on the all-pairs verify scans the element loads are the
    * workload. KernelProperties pins the bit-equality.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.FloatCosine.cosine(a, b)

  /** Exact top-k cosine neighbors for each query vector: the O(Q×N)
    * baseline. The corpus side stays distributed; the (small) query set
    * is broadcast, so the "cross join" is a broadcast nested loop with
    * no shuffle of the corpus. Rank ties break on corpus id for
    * determinism.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int): DataFrame = {
    val pairs = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .filter(!isnan(col("cos"))) // NaN sorts above every double in desc order
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Deterministic random hyperplanes for sign-LSH, seeded. */
  /** Hard-negative mining for retriever/embedding training (the DPR /
    * contrastive-learning data-prep step): for each query vector, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that actually move the loss, as opposed to random
    * in-batch ones. Same exact-scoring shape as [[bruteForceTopK]]
    * (broadcast queries over the corpus scan, per-query top-k window)
    * plus the label-inequality filter; at ANN scale substitute the
    * IVF/LSH candidate paths and keep the same filter+rank tail.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      qLabel: String, cLabel: String, k: Int): DataFrame = {
    val pairs = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .filter(col(qLabel) =!= col(cLabel))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix parallel-corpus miner): for each source-language
    * vector, the best target-language vector by RATIO MARGIN
    *   margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y)) / 2),
    * where avgK(s) is the mean cosine of s to its k nearest neighbors
    * on the OTHER side — the normalization that suppresses hub vectors
    * (high raw cosine to everything) which plain threshold mining
    * mis-pairs. Pairs below `minMargin` are dropped.
    *
    * Exact formulation (the oracle-checkable baseline): both
    * directions' neighbor averages come from the same broadcast-
    * queries-over-corpus-scan pair frame, reused for (a) per-source
    * avgK, (b) per-target avgK against the mined source set, and
    * (c) the final margin rank — one pair materialization, three
    * window/agg passes. Cosines round to 6 dp before every average
    * and rank so both engines agree bit-for-bit. At ANN scale the pair
    * frame comes from the IVF/LSH candidate paths instead and the
    * margin tail is unchanged.
    */
  /** @param cleanup eagerly checkpoint the (small) mined result and
    *        release the internal pair cache before returning — the
    *        default, so long-lived sessions don't accumulate
    *        corpus-sized CacheManager entries. `false` returns the
    *        LAZY plan (the pair frame stays persisted; the caller owns
    *        `unpersist`) — for plan auditing and callers composing
    *        further before materializing.
    */
  def marginMining(src: DataFrame, tgt: DataFrame,
      sId: String, tId: String, sVec: String, tVec: String,
      k: Int = 4, minMargin: Double = 1.0,
      cleanup: Boolean = true): DataFrame = {
    val pairs = tgt.crossJoin(broadcast(src))
      .withColumn("cos", round(cosine(col(sVec), col(tVec)), 6))
      .filter(!isnan(col("cos")))
      .select(col(sId), col(tId), col("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def avgTopK(keyCol: String, otherCol: String, as: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("cos").desc, col(otherCol).asc)
      pairs.withColumn("nn", row_number().over(w)).filter(col("nn") <= k)
        .groupBy(keyCol).agg(round(avg("cos"), 6).as(as))
    }
    // the per-source averages are query-set-sized (small by the same
    // assumption that broadcast the query side) — broadcast them; the
    // per-target averages are corpus-sized and must stay a shuffle
    // join on the target key
    val aks = broadcast(avgTopK(sId, tId, "ak_s"))
    val akt = avgTopK(tId, sId, "ak_t")
    val w = Window.partitionBy(col(sId))
      .orderBy(col("margin").desc, col(tId).asc)
    val mined = pairs
      .join(aks, sId).join(akt, tId)
      .withColumn("margin",
        round(col("cos") / ((col("ak_s") + col("ak_t")) / 2.0), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("margin") >= minMargin)
      .select(col(sId), col(tId), col("cos"), col("margin"))
    // eager checkpoint of the (small: <= |src| rows) mined set, then
    // release the pair cache — a CacheManager entry is never
    // auto-dropped, so leaving it leaked one corpus-sized frame per
    // call in a long-lived session; the checkpoint's RDD blocks are
    // dropped by the ContextCleaner once the result is unreferenced
    if (!cleanup) mined
    else try mined.localCheckpoint() finally pairs.unpersist()
  }

  /** Cluster-balanced (diversity) sampling — the D4/SemDeDup-family
    * curation step that samples uniformly across SEMANTIC clusters
    * instead of uniformly across documents, so dominant topics stop
    * drowning the tail: k-means cells from the deterministic IVF
    * quantizer, then an exact per-cell quota taken in seeded-hash
    * order (the engine-portable "random" that is stable across runs
    * and partitionings — same device as [[graft.llm.Corpus.stratifiedSample]],
    * with learned cells for strata).
    *
    * Scale shape: quantizer trains on a bounded seed sample (driver
    * holds only centroids), assignment is one codegen'd map pass, the
    * quota is a per-cell window over hash order — one shuffle on the
    * cell key. Output: (id, cell, pick ∈ [1, perCell]).
    */
  def clusterBalancedSample(emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, perCell: Int = 5, lloydIters: Int = 2,
      seed: Long = 42L): DataFrame = {
    import graft.functions.Ivf
    val centroids = trainIvfCentroids(emb, idCol, vecCol, nCells, lloydIters)
    val w = Window.partitionBy(col("cell"))
      .orderBy(xxhash64(lit(seed), col(idCol)).asc, col(idCol).asc)
    emb.withColumn("cell",
        element_at(Ivf.nearestCells(col(vecCol), centroids, 1), 1))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= perCell)
      .select(col(idCol), col("cell"), col("pick"))
  }

  /** Late-interaction multi-vector retrieval (ColBERT's MaxSim,
    * Khattab & Zaharia 2020): query and document are BAGS of token
    * vectors; score(q,d) = Σ_i max_j cos(q_i, d_j) — each query token
    * finds its best-matching document token, so exact-term and
    * semantic matches both contribute, which single-vector cosine
    * blurs away. Token columns are `array<array<float>>`.
    *
    * Exact scoring shape: broadcast the (small) query set over the
    * corpus scan and evaluate the whole MaxSim inside ONE codegen'd
    * expression per (doc, query) row — `aggregate` over query tokens
    * of `array_max` over doc tokens — so the token "join" never
    * materializes rows (8×8 = 64 cosines collapse in-register per
    * pair). Per-token maxes round to 6 dp before the sum (sum order
    * is engine-defined), the score to 4. At ANN scale, shortlist with
    * the single-vector IVF/LSH paths first and MaxSim-rerank the
    * shortlist — the standard ColBERT serving topology.
    */
  def maxSimTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qToks: String, cToks: String,
      k: Int): DataFrame = {
    // the per-token maxes are 6-dp GRID values, so their sum lands on
    // a 4-dp rounding half-boundary for ~1 % of pairs — a double fold
    // would make those rows flip with the engine's summation order
    // (caught as a DuckDB run-to-run flake); accumulate in DECIMAL,
    // which is exact and order-invariant (the project's money rule)
    // the re-cast after each add keeps the accumulator at the zero's
    // exact type (decimal + decimal widens the precision, which the
    // aggregate HOF rejects); 8 tokens ≤ 8.0 total, no overflow
    val score = aggregate(
      col(qToks), lit(0).cast("decimal(18,6)"), (acc, qt) =>
        (acc + round(array_max(transform(col(cToks), dt => cosine(qt, dt))), 6)
          .cast("decimal(18,6)")).cast("decimal(18,6)"))
    val pairs = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("score", round(score, 4).cast("double"))
      .filter(!isnan(col("score")))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("score").desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), col("score"), col("rk"))
  }

  /** kNN label-noise audit (the confident-learning-style flag, à la
    * Northcutt et al.): a labeled example whose nearest neighbors
    * overwhelmingly carry a DIFFERENT label is either mislabeled or
    * lives on a genuine class boundary — either way it is what a
    * label-cleaning pass reviews first. noise_score = fraction of the
    * k nearest (cosine) neighbors disagreeing with the row's label;
    * `flagged` at ≥ minDisagree.
    *
    * Exact shape: the [[bruteForceTopK]] scan + one per-query
    * aggregation; swap in the IVF/LSH candidate paths at ANN scale.
    */
  def labelNoiseAudit(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 5,
      minDisagree: Double = 0.8): DataFrame = {
    val pairs = emb.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        col(labelCol).as("c_label"))
      .crossJoin(broadcast(emb.select(col(idCol).as("q_id"),
        col(vecCol).as("q_vec"), col(labelCol).as("q_label"))))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("q_id").as(idCol), col("q_label").as(labelCol))
      .agg(sum(when(col("c_label") =!= col("q_label"), 1L).otherwise(0L))
        .as("n_diff"))
      .withColumn("noise_score", round(col("n_diff") / lit(k.toDouble), 6))
      .withColumn("flagged", col("noise_score") >= minDisagree)
  }

  /** Semantic decontamination: drop/flag corpus members whose best
    * cosine against a benchmark/eval set exceeds `minCos` — the
    * embedding-space sibling of the n-gram decontamination pass
    * (paraphrased eval leakage that token overlap misses). Benchmark
    * side broadcasts (eval sets are small); at ANN scale shortlist
    * with IVF first.
    */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
      cId: String, bId: String, cVec: String, bVec: String,
      minCos: Double = 0.99): DataFrame = {
    val pairs = corpus.crossJoin(broadcast(benchmark))
      .withColumn("cos", round(cosine(col(cVec), col(bVec)), 6))
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col(cId))
      .orderBy(col("cos").desc, col(bId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("cos") >= minCos)
      .select(col(cId), col(bId).as("matched_bench_id"), col("cos"))
  }

  def hyperplanes(dim: Int, n: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-random-projection bucket id (n-bit code) for a vector. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      when(dot(vec, pl) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding near-duplicate pairs (cosine >= `minCos`, id_a < id_b):
    * multi-table sign-LSH prefilter + exact-cosine verify — the scale
    * path that replaces the all-pairs `b.id > a.id` join (VERDICT r3
    * item 2; the exact all-pairs formulation stays as its oracle).
    *
    * Candidate generation: `nTables` independent `nBits`-bit
    * sign-LSH codes per vector, computed in ONE pass; the left side
    * probes every bucket within hamming distance `probeRadius` of its
    * own code, the right side sits in its base bucket, so a pair
    * collides iff some table's codes differ in <= probeRadius bits.
    * Candidates are distinct (id_a, id_b), then exact cosine keeps
    * precision exact. Cost is O(docs × probes) shuffle rows + verify
    * work proportional to collisions — never all pairs.
    *
    * Recall regime (per-bit agreement p = 1 − θ/π): this is a NEAR-DUP
    * operator. At cos >= 0.99 (θ <= 8°, p ≈ 0.96) the default
    * 4×16-bit tables with 1-bit probing miss a pair with prob < 1e-6;
    * at cos 0.9 raise probeRadius to 2 or add tables. For weak floors
    * (cos ≈ 0.4 — random-data tails, not near-dups) per-bit agreement
    * (0.63) barely exceeds noise (0.5) and NO sublinear prefilter has
    * high recall — use the exact all-pairs formulation there, blocked
    * across the cluster.
    */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, minCos: Double,
      nTables: Int = 4, nBits: Int = 16, probeRadius: Int = 1,
      seed: Long = 42L): DataFrame = {
    require(nBits <= 62, s"bucket code must fit a long, got nBits=$nBits")
    val base = df.select(col(idCol).as("_nd_id"), col(vecCol).as("_nd_vec"))
    // all nTables codes in one pass over the vectors — the codegen'd
    // SignLshCodes kernel; a per-bit Column formulation would carry
    // nTables×nBits literal plane arrays through Catalyst (plan
    // analysis dominates the query at any scale)
    val codes = base.select(col("_nd_id"),
      graft.functions.SignLsh.codes(col("_nd_vec"), nTables, nBits, seed).as("_nd_codes"))
    val masks: Seq[Long] = (0 to probeRadius).flatMap(r =>
      (0 until nBits).combinations(r).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val rhs = codes.select(col("_nd_id").as("id_b"),
      posexplode(col("_nd_codes")).as(Seq("t", "b")))
    val lhs = codes.select(col("_nd_id").as("id_a"),
        posexplode(col("_nd_codes")).as(Seq("t", "b0")))
      .select(col("id_a"), col("t"),
        explode(array(masks.map(m => col("b0").bitwiseXOR(lit(m))): _*)).as("b"))
    val cand = lhs.join(rhs, Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = base.select(col("_nd_id").as("id_a"), col("_nd_vec").as("v_a"))
    val vb = base.select(col("_nd_id").as("id_b"), col("_nd_vec").as("v_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      // NaN (zero-norm vector) compares GREATER than every double in
      // Spark, so an unguarded `cos >= minCos` would declare a zero
      // vector a near-dup of everything in its bucket — silent data
      // loss once a dedup drops the "losers". nanvl keeps the pushed
      // predicate to ONE cosine-kernel evaluation (a `!isnan && >=`
      // conjunction duplicates the kernel per conjunct — measured 1.8×
      // on the l12 all-pairs shape).
      .filter(nanvl(col("cos"), lit(-1.0)) >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** IVF (inverted-file) approximate top-k — the partition-based scale
    * path beside the sign-LSH one: a small coarse quantizer (k-means
    * centroids) splits the corpus into `nCentroids` cells; each query
    * probes its `nProbe` nearest cells and ranks candidates with exact
    * cosine. Per query the work is nProbe/nCentroids of the corpus —
    * the standard IVF trade (raise nProbe for recall, nCentroids for
    * selectivity; at 1e9+ vectors use √n centroids).
    *
    * Quantizer training: [[trainIvfCentroids]] (deterministic, driver-
    * held coarse quantizer — it IS the index and stays small by design;
    * corpus and queries never collect).
    *
    * Corpus side expects `array<float>` vectors (the storage format);
    * cell assignment runs in the codegen'd NearestCells kernel.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      lloydIters: Int = 2): DataFrame = {
    import graft.functions.Ivf
    val centroids = trainIvfCentroids(corpus, cId, cVec, nCentroids, lloydIters)
    val c = corpus.withColumn("_ivf_cell",
      element_at(Ivf.nearestCells(col(cVec), centroids, 1), 1))
    val q = queries.withColumn("_ivf_cell",
      explode(Ivf.nearestCells(col(qVec), centroids, nProbe)))
    // a corpus row lives in exactly one cell → each (query, corpus)
    // pair meets at most once; no distinct needed (unlike LSH probing)
    val pairs = q.join(c, "_ivf_cell")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      // NaN cosines (corrupt vectors) must not outrank real neighbors:
      // Spark's descending sort orders NaN above every double
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Coarse-quantizer training for the IVF family (shared by [[ivfTopK]]
    * and [[ivfPqTopK]]): deterministic seed sample (lowest xxhash64 of
    * the id — no RNG, stable across runs/partitionings) refined by
    * `lloydIters` rounds of assign + `VectorAvg` (map-side partial
    * aggregation; one (dim+1)-double buffer per cell per partition).
    * Partial-buffer MERGE order is not fixed, so refined means can
    * wobble in the low double bits between runs; coordinates round to
    * 1e-9 before normalization, so only a vector scoring two centroids
    * identically to ~1e-9 could flip cells. Centroids collect to the
    * driver — they ARE the coarse quantizer and stay small by design;
    * the corpus never does.
    */
  def trainIvfCentroids(corpus: DataFrame, cId: String, cVec: String,
      nCentroids: Int, lloydIters: Int): Array[Array[Double]] = {
    import graft.functions.Ivf
    def collectCentroids(df: DataFrame, vecCol: String): Array[Array[Double]] =
      df.select(vecCol).collect().map(_.getSeq[Any](0).toArray.map {
        case f: Float => f.toDouble
        case d: Double => d
      })
    // NULL vectors (real in a crawl) can't seed or pull a centroid —
    // the quantizer trains on present vectors only. Query-side
    // assignment of a null vector is already null-safe (NearestCells
    // is null-propagating), so null rows simply fall out of cells.
    val present = corpus.filter(col(cVec).isNotNull)
    // deterministic seed sample: lowest hash wins, stable under shuffle
    var centroids = Ivf.normalize(collectCentroids(
      present.orderBy(xxhash64(col(cId)), col(cId)).limit(nCentroids), cVec))
    // EMPTY corpus (a filter that matched nothing, a tenant with no
    // data yet): return a degenerate single zero centroid instead of an
    // empty quantizer. The plan then still RESOLVES (NearestCells
    // requires >=1 centroids at ANALYSIS time, which fires even when
    // zero rows would flow), every corpus row — there are none — lands
    // in cell 0, and the query returns empty instead of crashing.
    // RobustnessProbe's empty-corpus sweep pins this for the IVF family.
    // CONTRACT: the sentinel is a plan-resolution device for THIS query
    // only — it must never be frozen/persisted as a real quantizer
    // (appendToIvfIndex rejects it; a dim-1 centroid against real
    // vectors would yield ragged dots -> NULL cells -> dropped rows).
    if (centroids.isEmpty) return Array(Array(0.0))
    (1 to lloydIters).foreach { _ =>
      val byCell = present
        .withColumn("_ivf_cell",
          element_at(Ivf.nearestCells(col(cVec), centroids, 1), 1))
        .groupBy("_ivf_cell")
        .agg(graft.functions.VectorAvg.vectorAvg(col(cVec)).as("_ivf_mean"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Double](1).toArray.map(x => math.rint(x * 1e9) / 1e9)).toMap
      // empty cells keep their previous centroid
      centroids = Ivf.normalize(centroids.indices.map(i =>
        byCell.getOrElse(i, centroids(i))).toArray)
    }
    centroids
  }

  /** IVF + int8 scan + exact rerank — the memory-bounded ANN scale path
    * (the IVF-ADC pattern from the FAISS/product-quantization
    * literature, with a per-vector symmetric int8 code instead of a PQ
    * codebook): the probe scan reads a compact index of (id, cell,
    * int8 code) — 4× smaller than the float32 corpus, 8× smaller than
    * the double working form, which at 100 TB of vectors is the
    * difference between an in-memory candidate scan and a spill — and
    * only the `rerankFactor × k` quantized survivors per query fetch
    * their full-precision vectors for exact-cosine reranking.
    *
    * Cosine is scale-invariant, so ranking on the raw int8 code needs
    * no stored scale (cos(q, code·s/127) = cos(q, code)) — the index
    * row is just the id, the cell, and dim bytes. Quantization error
    * perturbs each element by ≤ scale/254, so quantized cosines sit
    * within ~1% of exact for unit-ish vectors: ordering flips happen
    * only between near-tied candidates, which is exactly what the
    * exact rerank repairs.
    *
    * Same probe shape as [[ivfTopK]]: a corpus row lives in exactly one
    * cell, so no distinct is needed; per query the quantized scan
    * touches nProbe/nCentroids of the index, and the full-precision
    * fetch is a join on O(queries × rerankFactor × k) ids — never the
    * corpus.
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      lloydIters: Int = 2, rerankFactor: Int = 4): DataFrame = {
    val (quantizer, postings) =
      buildIvfIndex(corpus, cId, cVec, nCentroids, lloydIters)
    ivfPqTopKAgainstIndex(queries, quantizer, postings,
      corpus.select(col(cId), col(cVec)),
      qId, cId, qVec, cVec, k, nProbe, rerankFactor)
  }

  /** The PERSISTABLE IVF-ADC index (the embedding sibling of
    * [[graft.llm.TextDedup.buildNearDupIndex]] / l61): a
    * `(cell, centroid)` quantizer table (nCentroids rows) and
    * `(id, cell, code)` int8 postings — everything vector-derived,
    * computed once. Both frames round-trip through parquet; every
    * subsequent query batch runs [[ivfPqTopKAgainstIndex]] over the
    * stored frames, so per-batch cost is O(queries × probed cells +
    * shortlist) and the corpus vectors are touched only for the exact
    * rerank fetch — at 100 TB of embeddings, the 4×-compacted postings
    * scan is the working set, not the float corpus.
    */
  def buildIvfIndex(corpus: DataFrame, cId: String, cVec: String,
      nCentroids: Int = 16, lloydIters: Int = 2): (DataFrame, DataFrame) = {
    import graft.functions.Ivf
    val centroids = trainIvfCentroids(corpus, cId, cVec, nCentroids, lloydIters)
    val spark = corpus.sparkSession
    import spark.implicits._
    val quantizer = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "centroid")
    val vd = transform(col(cVec), x => x.cast("double"))
    val scale = array_max(transform(vd, a => abs(a)))
    // the compact index: id, cell, int8 code — nothing else
    val postings = corpus
      .withColumn("cell",
        element_at(Ivf.nearestCells(col(cVec), centroids, 1), 1))
      .withColumn("code", when(scale === 0.0,
          transform(vd, _ => lit(0).cast("tinyint")))
        .otherwise(transform(vd,
          x => round(x * lit(127.0) / scale).cast("tinyint"))))
      .select(col(cId), col("cell"), col("code"))
    (quantizer, postings)
  }

  /** Embedding drift between two corpus versions, per label: the
    * cosine between each label's OLD and NEW mean vector, with member
    * counts — the embedding-space sibling of
    * [[graft.llm.TextAnalysis.vocabDrift]] (an encoder re-run or a
    * data-mix change shows up as per-label centroid rotation long
    * before downstream metrics move). Means are element-wise
    * aggregations (posexplode → per-(label, dim) avg — map-side
    * combined, state = labels × dims); the cosine folds the per-dim
    * means, so nothing vector-sized leaves the executors.
    */
  def embeddingDrift(oldV: DataFrame, newV: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    def dims(df: DataFrame, as: String) =
      df.select(col(labelCol), posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("d", "x")))
        .groupBy(col(labelCol), col("d"))
        .agg(avg(col("x")).as(as), count(lit(1)).as(s"_n_$as"))
    val o = dims(oldV, "mo")
    val n = dims(newV, "mn")
    o.join(n, Seq(labelCol, "d"))
      .groupBy(col(labelCol))
      .agg(
        max(col("_n_mo")).as("n_old"),
        max(col("_n_mn")).as("n_new"),
        round(
          sum(col("mo") * col("mn")) /
            (sqrt(sum(col("mo") * col("mo"))) *
             sqrt(sum(col("mn") * col("mn")))), 6).as("drift_cos"))
  }

  /** Per-subspace k-means codebooks for product quantization (Jégou
    * et al. 2011 §II): the vector splits into `m` contiguous
    * subvectors; each subspace trains its own `ksub`-centroid L2
    * k-means (deterministic lowest-hash seeds, means rounded to 1e-9
    * — the [[trainIvfCentroids]] conventions, minus the normalize:
    * PQ codebooks are plain means, not directions). Driver holds only
    * the m×ksub×(d/m) centroid table.
    */
  def trainPqCodebooks(corpus: DataFrame, cId: String, cVec: String,
      m: Int, ksub: Int, lloydIters: Int): Array[Array[Array[Double]]] = {
    import graft.functions.Pq
    // NULL vectors train nothing (see trainIvfCentroids); empty corpus
    // → degenerate one-zero-centroid book per subspace, the same
    // plan-must-resolve convention as trainIvfCentroids.
    val present = corpus.filter(col(cVec).isNotNull)
    val dim = present.select(size(col(cVec))).head(1).headOption
      .map(_.getInt(0)).getOrElse(0)
    if (dim == 0) return Array.fill(m)(Array(Array(0.0)))
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    // ALL m subspaces train together: the seed rows are the same ksub
    // lowest-hash vectors for every subspace (the hash orders on the
    // ID, not the subvector), so ONE collect of full vectors seeds all
    // m books, and each Lloyd round is ONE grouped pass — encode the
    // full vector against all m books (Pq.encode emits the m codes in
    // one kernel call), posexplode to (subspace, cell, subvector),
    // aggregate means per (subspace, cell). The previous per-subspace
    // loop issued m×(1+lloydIters) blocking driver actions (24 at
    // m=8, iters=2) — the measured bulk of l94's 2.97 s — for work
    // whose arithmetic is identical (same seed rows, same nearest-
    // centroid assignments, same 1e-9-rounded means).
    val seedRows = present.orderBy(xxhash64(col(cId)), col(cId))
      .limit(ksub).select(col(cVec)).collect()
      .map(_.getSeq[Any](0).toArray.map {
        case f: Float => f.toDouble
        case d: Double => d
      })
    var cents: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seedRows.map(v => v.slice(j * dsub, (j + 1) * dsub)))
    (1 to lloydIters).foreach { _ =>
      val byCell = present.select(col(cVec).as("_pq_v"),
          posexplode(Pq.encode(col(cVec), cents)).as(Seq("_pq_j", "_pq_c")))
        .select(col("_pq_j"), col("_pq_c").cast("int").as("_pq_c"),
          slice(col("_pq_v"), col("_pq_j") * dsub + 1, lit(dsub)).as("_pq_sub"))
        .groupBy("_pq_j", "_pq_c")
        .agg(graft.functions.VectorAvg.vectorAvg(col("_pq_sub")).as("_pq_mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[Double](2).toArray.map(x => math.rint(x * 1e9) / 1e9)).toMap
      cents = Array.tabulate(m)(j =>
        cents(j).indices.map(i => byCell.getOrElse((j, i), cents(j)(i))).toArray)
    }
    cents
  }

  /** Product-quantization top-k (compressed exhaustive ADC scan +
    * exact rerank): corpus vectors live as m-byte codes (32×
    * compression at d=64, m=8 vs float32), each query builds one
    * m×ksub dot table, and every code scores with m table lookups —
    * the approximate cosine ranks a k·rerankFactor shortlist that
    * alone fetches full-precision vectors for the exact final
    * ranking. THE memory-bound ANN workhorse: at 100 TB of float
    * embeddings the code table is ~3 TB and the scan is
    * bandwidth-limited, not FLOP-limited; compose with the IVF cell
    * filter ([[ivfPqTopKAgainstIndex]]'s probe join) to cut the scan
    * to probed cells — this operator is the quantization half of that
    * composition, isolated and recall-testable.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, m: Int = 8, ksub: Int = 16, lloydIters: Int = 2,
      rerankFactor: Int = 4): DataFrame = {
    import graft.functions.Pq
    val cb = trainPqCodebooks(corpus, cId, cVec, m, ksub, lloydIters)
    val codes = corpus.select(col(cId),
      Pq.encode(col(cVec), cb).as("_pq_code"))
    // query norm computed ONCE on the broadcast side; a zero-norm
    // query (degenerate corpus) maps to NaN — same semantics as the
    // FloatCosine kernel — instead of raising ANSI DIVIDE_BY_ZERO per
    // candidate (found by the round-13 zero-vector ragged sweep)
    val qt = queries.select(col(qId), col(qVec),
      Pq.adcTable(col(qVec), cb).as("_pq_tbl"),
      when(norm(col(qVec)) === 0.0, lit(Double.NaN))
        .otherwise(norm(col(qVec))).as("_pq_qnorm"))
    val cand = codes.crossJoin(broadcast(qt))
      .filter(col(qId) =!= col(cId))
      .withColumn("acos",
        Pq.score(col("_pq_tbl"), col("_pq_code"), cb) / col("_pq_qnorm"))
      .filter(!isnan(col("acos")))
    val ws = Window.partitionBy(col(qId))
      .orderBy(round(col("acos"), 6).desc, col(cId).asc)
    val shortlist = cand.withColumn("_pq_rk", row_number().over(ws))
      .filter(col("_pq_rk") <= k * rerankFactor)
      .select(col(qId), col(cId), col(qVec))
    val rer = shortlist.join(corpus.select(col(cId), col(cVec)), cId)
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    rer.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Incremental IVF index UPDATE (the FAISS `add` path): encode a new
    * vector batch against the FROZEN quantizer — nearest stored
    * centroid, per-vector int8 code, exactly [[buildIvfIndex]]'s
    * posting formula — and return the posting rows to append to the
    * stored index (e.g. `write.mode("append")`). No retraining, no
    * touch of existing postings: per-ingest cost is O(batch ×
    * nCentroids), which is what makes a 100 TB embedding store
    * maintainable between periodic re-trains (the documented drift
    * caveat: a quantizer frozen long enough stops matching the data
    * distribution — rebuild cadence is an operational knob, not an
    * engine one).
    */
  def appendToIvfIndex(batch: DataFrame, quantizer: DataFrame,
      cId: String, cVec: String): DataFrame = {
    import graft.functions.Ivf
    val qrows = quantizer.orderBy("cell").select("cell", "centroid").collect()
    require(qrows.iterator.map(_.getInt(0)).sameElements(qrows.indices.iterator),
      s"quantizer cells must be contiguous 0..${qrows.length - 1}")
    val centroids = qrows.map(_.getSeq[Double](1).toArray)
    // a quantizer trained on an EMPTY corpus is the dim-1 sentinel
    // [[0.0]] (see trainIvfCentroids). Appending REAL vectors against
    // it would compute a ragged dot -> NULL cell and silently drop
    // every posting from the index — fail fast and demand a retrain.
    // An empty batch is the one legitimate case (the degenerate-corpus
    // sweep: empty index + empty append must compose to empty, not
    // crash), so the check spends one cheap isEmpty action only when
    // the sentinel is actually present.
    if (centroids.length == 1 && centroids(0).length == 1
        && centroids(0)(0) == 0.0)
      require(batch.isEmpty,
        "quantizer is the empty-corpus sentinel ([[0.0]]) — it must not be " +
          "frozen/persisted; retrain on the non-empty corpus before appending")
    val vd = transform(col(cVec), x => x.cast("double"))
    val scale = array_max(transform(vd, a => abs(a)))
    batch
      .withColumn("cell",
        element_at(Ivf.nearestCells(col(cVec), centroids, 1), 1))
      .withColumn("code", when(scale === 0.0,
          transform(vd, _ => lit(0).cast("tinyint")))
        .otherwise(transform(vd,
          x => round(x * lit(127.0) / scale).cast("tinyint"))))
      .select(col(cId), col("cell"), col("code"))
  }

  /** IVF + int8 scan + exact rerank over an ALREADY-BUILT index
    * ([[buildIvfIndex]]'s output, typically read back from storage).
    * The quantizer table collects to the driver — it IS the coarse
    * quantizer (nCentroids rows, small by design); the postings and
    * the full-precision `corpusVecs` frame never do.
    */
  def ivfPqTopKAgainstIndex(
      queries: DataFrame, quantizer: DataFrame, postings: DataFrame,
      corpusVecs: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, nProbe: Int = 4, rerankFactor: Int = 4): DataFrame = {
    import graft.functions.Ivf
    val qrows = quantizer.orderBy("cell").select("cell", "centroid").collect()
    // nearestCells emits POSITIONAL ids that the postings join matches
    // against stored cell VALUES — a gappy quantizer (filtered/partial
    // write) would silently probe the wrong cells, so fail loudly
    require(qrows.iterator.map(_.getInt(0)).sameElements(qrows.indices.iterator),
      s"quantizer cells must be contiguous 0..${qrows.length - 1}")
    val centroids = qrows.map(_.getSeq[Double](1).toArray)
    val probes = queries.withColumn("_pq_cell",
      explode(Ivf.nearestCells(col(qVec), centroids, nProbe)))
    val idx = postings.select(col(cId), col("cell").as("_pq_cell"),
      col("code").as("_pq_code"))
    val shortlist = {
      val cand = probes.join(idx, "_pq_cell")
        .filter(col(qId) =!= col(cId))
        // the kernel reads the int8 code NATIVELY: a per-pair
        // cast("array<double>") allocated a fresh generic array per
        // candidate (and forfeited the null-scan word fast path on the
        // post-shuffle unsafe array) — measured 1.4x on the 2M-vector
        // probe scan
        .withColumn("acos", cosine(col(qVec), col("_pq_code")))
        .filter(!isnan(col("acos"))) // NaN sorts above every double desc
      val w = Window.partitionBy(col(qId))
        .orderBy(round(col("acos"), 6).desc, col(cId).asc)
      cand.withColumn("_pq_rk", row_number().over(w))
        .filter(col("_pq_rk") <= k * rerankFactor)
        .select(col(qId), col(cId), col(qVec))
    }
    // exact rerank: only the shortlist fetches full-precision vectors
    val rer = shortlist
      .join(corpusVecs, cId)
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .filter(!isnan(col("cos")))
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    rer.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Approximate top-k via sign-LSH bucketing: corpus and queries hash
    * to `nBits`-bit buckets; candidates are same-bucket pairs, then
    * exact cosine ranks them. The bucket join is a shuffle on bucket id
    * (no broadcast needed for a large query set); recall is tunable via
    * nBits (fewer bits → bigger buckets → higher recall, more compute);
    * multi-probe (flipping one bit) widens recall at the same width.
    *
    * Regime guidance (sign-LSH collision prob per bit = 1 − θ/π):
    * near-dup retrieval (cos ≥ 0.9, θ ≤ 26°) collides with p ≥ 0.28 at
    * 8 bits + multiprobe → recall ≈ 1 after a handful of probes. For
    * corpora whose true neighbors are weak (cos ≈ 0.3, e.g. random or
    * very diverse embeddings) NO bucketing scheme is sublinear with
    * high recall — use blocked brute force (partition the corpus,
    * score each block, merge top-k) when recall is contractual; LSH
    * then serves as a cheap high-precision prefilter, not a substitute.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, qVec: String, cVec: String,
      k: Int, nBits: Int = 8, multiProbe: Boolean = true, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, nBits)
    val c = corpus.withColumn("bucket", lshBucket(col(cVec), planes))
    val qBase = queries.withColumn("bucket0", lshBucket(col(qVec), planes))
    // probe own bucket + (optionally) all 1-bit-flip neighbors
    val probes = if (multiProbe) {
      val flips = array((0 until nBits).map(i =>
        col("bucket0").bitwiseXOR(lit(1L << i))) :+ col("bucket0"): _*)
      qBase.withColumn("bucket", explode(flips))
    } else qBase.withColumn("bucket", col("bucket0"))
    val pairs = probes.join(c, "bucket")
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", cosine(col(qVec), col(cVec)))
      .filter(!isnan(col("cos"))) // NaN sorts above every double in desc order
      .select(col(qId), col(cId), col("cos")).distinct()
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Embedding near-dup clusters: [[nearDupPairs]] (sign-LSH prefilter
    * + exact-cosine verify) → connected components — the embedding-side
    * analogue of `TextDedup.nearDupClusters`. Returns (`id`,
    * `component`) for every vector in at least one near-dup pair;
    * `component` = min id of its cluster. Same scale shape: candidate
    * generation is bucketed, components run O(log diameter) rounds.
    */
  def embedNearDupClusters(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame =
    graft.operators.ConnectedComponents.run(
      nearDupPairs(emb, idCol, vecCol, minCos), "id_a", "id_b")

  /** Collapse embedding near-duplicates: keep the min-id survivor per
    * cluster plus every unpaired vector (anti-join against the small
    * loser set only — the corpus never rewrites).
    */
  def dropEmbedNearDuplicates(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame =
    graft.operators.ConnectedComponents.collapse(emb,
      nearDupPairs(emb, idCol, vecCol, minCos), "id_a", "id_b", idCol)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication that confines the quadratic cosine comparison to
    * k-means cells — cluster the embeddings with the IVF coarse
    * quantizer ([[trainIvfCentroids]]), compare all pairs WITHIN a cell
    * only, connect pairs at cosine >= `minCos` into components, keep
    * the min-id survivor per component plus every unpaired vector.
    *
    * Scale shape: the all-pairs term drops from n² to Σ|cell|² — with
    * √n-ish centroids that is n^1.5 worst-case and near-linear when
    * cells stay balanced; everything else is one cell-keyed shuffle,
    * CC's O(log diameter) bounded rounds, and an anti-join against the
    * loser set only (the corpus never rewrites). The trade vs the
    * sign-LSH path ([[dropEmbedNearDuplicates]]): cell-boundary pairs
    * are invisible by design — the paper's semantics, and why this is
    * rows-only checked with a planted-recall spec rather than an exact
    * oracle.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double, nCentroids: Int = 16, lloydIters: Int = 2): DataFrame = {
    import graft.functions.Ivf
    // quantizer trains on the float storage form (VectorAvg's input
    // type); cosine verification below stays on the caller's precision
    val centroids = trainIvfCentroids(
      emb.select(col(idCol),
        transform(col(vecCol), _.cast("float")).as(vecCol)),
      idCol, vecCol, nCentroids, lloydIters)
    val cells = emb
      .select(col(idCol).as("_sd_id"), col(vecCol).as("_sd_vec"))
      .withColumn("_sd_cell",
        element_at(Ivf.nearestCells(col("_sd_vec"), centroids, 1), 1))
    val lhs = cells.select(col("_sd_cell"), col("_sd_id").as("id_a"),
      col("_sd_vec").as("v_a"))
    val rhs = cells.select(col("_sd_cell"), col("_sd_id").as("id_b"),
      col("_sd_vec").as("v_b"))
    val pairs = lhs.join(rhs, Seq("_sd_cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      // NaN guard: a zero-norm embedding yields NaN cosine, which Spark
      // orders above every double — without it the zero vector joins a
      // component with everything in its cell and semDedup drops real
      // documents (silent data loss). nanvl = single kernel evaluation
      // in the pushed predicate (see nearDupPairs).
      .filter(nanvl(col("cos"), lit(-1.0)) >= minCos)
      .select("id_a", "id_b")
    val clusters = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
    try {
      // eager checkpoint, not persist: the loser set rides the returned
      // plan and RDD storage is ContextCleaner-dropped once the result
      // is unreferenced (a CacheManager entry would leak); the finally
      // releases the labeling even if the checkpoint action throws
      val losers = clusters.filter(col("id") =!= col("component"))
        .select(col("id").as(idCol))
        .localCheckpoint()
      emb.join(losers, Seq(idCol), "left_anti")
    } finally clusters.unpersist()
  }

  /** Symmetric int8 quantization of an embedding column — the storage
    * path for an ANN index over 100 TB of vectors (4× smaller than
    * float32, 8× smaller than the double working form). Per vector:
    * scale = max |x|, q_i = round(127·x_i/scale); reports the scale,
    * the quantized checksum, and the reconstruction MSE so a pipeline
    * can gate on quantization loss.
    *
    * Pure columnar HOFs with an explicit float→double cast and a
    * sequential fold (same determinism contract as [[dot]]); zero
    * vectors quantize to zeros rather than dividing by zero.
    */
  def quantize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    embeddings.select(col(idCol), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), a => abs(a))))
      .withColumn("q", when(col("scale") === 0.0,
          transform(col("v"), _ => lit(0).cast("int")))
        .otherwise(transform(col("v"),
          x => round(x * lit(127.0) / col("scale")).cast("int"))))
      .select(col(idCol), round(col("scale"), 6).as("scale"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"),
        round(
          aggregate(zip_with(col("v"), col("q"), (x, qi) => {
            val err = x - qi.cast("double") * col("scale") / lit(127.0)
            err * err
          }), lit(0.0), (acc, e) => acc + e) / size(col("v")), 6).as("mse"))
  }
}
