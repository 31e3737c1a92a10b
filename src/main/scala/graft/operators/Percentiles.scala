package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (SQL `percentile` / DuckDB
  * `quantile_cont` semantics) computed by SORT instead of by the
  * built-in `Percentile` aggregate's per-group counts map.
  *
  * Why not `percentile(col, array(...))`: its ObjectHashAggregate
  * buffer is an in-heap OpenHashMap of EVERY distinct value per group
  * — on a high-cardinality column (prices: ~1 distinct per row) the
  * partial maps hold the whole partition, the merged map holds the
  * whole group, and the final eval sorts it single-threaded inside the
  * aggregate. At bench scale that is the dominant cost of q14c/l110
  * (measured: q14c 1.89 s, l110 3.26 s isolated at sf0.1, both
  * ObjectHashAggregate-bound); at 100 TB it is an executor OOM —
  * aggregation buffers cannot spill a hash map that IS the data.
  *
  * The sort formulation shuffles (group, value) once, sorts within
  * each group partition (UnsafeExternalSorter — spills gracefully),
  * and reduces each requested percentile to picking two ranked rows:
  * for rank r = p·(n−1), the floor(r)-th and ceil(r)-th values, then
  * `lo + (hi − lo)·(r − floor(r))` — bit-identical interpolation to
  * both Spark's `Percentile.getPercentile` and DuckDB's
  * `quantile_cont` (both compute r in double and interpolate the two
  * neighbors with this exact expression). Everything downstream of
  * the sort is codegen'd HashAggregate (max/when), not
  * ObjectHashAggregate.
  *
  * Parallelism is one task per group (the window sort). For global
  * percentiles, tag a constant group and union — the single sorted
  * partition spills rather than OOMs, which is the honest price of an
  * EXACT order statistic; the scalable approximation is the KLL/GK
  * sketch family these exact values anchor-check in q14c/l110.
  */
object Percentiles {

  /** (grpCol, `outCol` array<double>) — one row per group, the exact
    * interpolated percentiles of `valCol` at each `ps` fraction, in
    * order. `valCol` is cast to double first (matching the built-in
    * `percentile`'s double arithmetic on bigint cents inputs).
    */
  def exactByGroup(df: DataFrame, grpCol: String, valCol: String,
      ps: Seq[Double], outCol: String = "ps"): DataFrame = {
    require(ps.nonEmpty, "at least one percentile fraction required")
    // group sizes come from a tiny pre-aggregate broadcast-joined back
    // in (one row per group), NOT from a count() window — the
    // unbounded-frame count pass buffers every partition a second time
    // inside WindowExec, measured +20% on the whole pass at sf0.1
    val vals = df.select(col(grpCol), col(valCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    val ns = vals.groupBy(grpCol).agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(grpCol).orderBy(col("_v"))
    val ranked = vals.join(broadcast(ns), Seq(grpCol))
      .withColumn("_i", row_number().over(w).cast("double") - 1.0)
    def rank(p: Double): Column = lit(p) * (col("_n") - 1).cast("double")
    val aggs = ps.zipWithIndex.flatMap { case (p, k) =>
      Seq(max(when(col("_i") === floor(rank(p)), col("_v"))).as(s"_lo$k"),
        max(when(col("_i") === ceil(rank(p)), col("_v"))).as(s"_hi$k"))
    } :+ max(col("_n")).as("_n")
    val g = ranked.groupBy(col(grpCol)).agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case (p, k) =>
      val r = lit(p) * (col("_n") - 1).cast("double")
      col(s"_lo$k") + (col(s"_hi$k") - col(s"_lo$k")) * (r - floor(r))
    }
    g.select(col(grpCol), array(outs: _*).as(outCol))
  }
}
