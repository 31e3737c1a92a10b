package graft.queries

import graft.SparkSpec
import graft.tools.RobustnessProbe

/** Degenerate-input robustness, pinned: every registry query must run
  * without throwing against
  *
  *  - an EMPTY corpus (all ten fixture tables, identical schemas, zero
  *    rows) — at 100 TB this is routine, not exotic: a partition filter
  *    that matched nothing, a tenant with no data yet, a backfill
  *    window before the first event. Round-12 sweep found 19 latent
  *    crashes here (driver-side `.head()` plant derivations, quantizers
  *    trained on zero vectors failing ANALYSIS, `getLong` on null
  *    aggregates, empty-write re-read schema inference, a hard seed
  *    `require`) — all fixed; this spec keeps them fixed.
  *  - a NULL-HEAVY corpus (~20 % of every non-key value nulled,
  *    deterministically) — null text / embeddings / timestamps are what
  *    a real crawl delivers. Checked on the operators the round-12
  *    sweep caught crashing (quantizer training collects, the Bloom
  *    membership UDF, sequence packing, media feature extraction,
  *    vector averaging) plus the rest of the ANN family; the FULL
  *    null sweep lives in `graft.tools.RobustnessProbe` (heavier, run
  *    per-round).
  *
  * "Runs" means exactly that — results may be empty or differ from the
  * clean corpus; value correctness is the oracle gate's job.
  */
class DegenerateCorpusSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  test("every registry query survives an EMPTY corpus") {
    val dir = tmpDir("graft_empty_spec")
    RobustnessProbe.buildEmpty(spark, base, dir)
    val fails = RobustnessProbe.sweep(spark, dir)
    assert(fails.isEmpty,
      s"empty-corpus crashes: ${fails.map { case (n, e) => s"$n [$e]" }.mkString("; ")}")
  }

  test("ragged-embeddings corpus: mixed-dim vectors aggregate, never index OOB") {
    val dir = tmpDir("graft_ragged_spec")
    RobustnessProbe.buildRagged(spark, base, dir)
    val names = Set(
      // the 8 round-12 ragged-sweep failures
      "q28_arrays", "l11_centroids", "l15_ivf_ann", "l35_ivfpq_ann",
      "l72_ivf_index", "l48_semdedup", "l100_cluster_sample",
      "l107_procrustes_align",
      // neighbors on the same code paths
      "l05_cosine_knn", "l12_embed_neardup", "l94_pq_ann", "l27_quantize")
    val fails = graft.SparkEntry.registry.filter(q => names(q.name)).flatMap { q =>
      try {
        q.run(spark, dir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable =>
        Some(q.name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
      }
    }
    assert(fails.isEmpty,
      s"ragged-corpus crashes: ${fails.map { case (n, e) => s"$n [$e]" }.mkString("; ")}")
  }

  test("null-heavy corpus: the round-12 crash sites and the ANN family stay fixed") {
    val dir = tmpDir("graft_nulls_spec")
    RobustnessProbe.buildNulls(spark, base, dir)
    val names = Set(
      // the 11 round-12 null-sweep failures
      "l11_centroids", "l15_ivf_ann", "l10b_multimodal_features",
      "l22_pack_sequences", "l35_ivfpq_ann", "l72_ivf_index",
      "l48_semdedup", "l55_bloom_dedup", "l93_ivf_append",
      "l94_pq_ann", "l100_cluster_sample",
      // neighbors on the same code paths
      "l05_cosine_knn", "l12_embed_neardup", "l12b_embed_neardup_lsh",
      "l27_quantize", "l107_procrustes_align")
    val fails = graft.SparkEntry.registry.filter(q => names(q.name)).flatMap { q =>
      try {
        q.run(spark, dir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable =>
        Some(q.name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
      }
    }
    assert(fails.isEmpty,
      s"null-corpus crashes: ${fails.map { case (n, e) => s"$n [$e]" }.mkString("; ")}")
  }
}
