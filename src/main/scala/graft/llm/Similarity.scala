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

  /** Codegen'd (graft.functions.FloatDot) — sequential double fold,
    * bit-identical with the interpreted `aggregate(zip_with(...))`
    * formulation and with the DuckDB list-fold oracle, but ~4× faster
    * (HOFs are CodegenFallback).
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }

  /** Deterministic random hyperplanes for sign-LSH, seeded. */
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
      .select(col(qId), col(cId), col("cos")).distinct()
    val w = Window.partitionBy(col(qId))
      .orderBy(round(col("cos"), 6).desc, col(cId).asc)
    pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qId), col(cId), round(col("cos"), 4).as("cos"), col("rk"))
  }
}
