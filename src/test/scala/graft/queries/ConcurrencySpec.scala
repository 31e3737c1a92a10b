package graft.queries

import java.util.concurrent.{Executors, TimeUnit}
import graft.SparkSpec

/** Concurrent-execution pin: racing queries through ONE session (the
  * multi-tenant / notebook-server shape) must neither throw nor change
  * row counts. Spark sessions are thread-safe; this guards the
  * ENGINE's driver-side state — sharedFrame / payload-fixture
  * memoization (computeIfAbsent building plans), extension-function
  * registration, Fixtures.registerAll's latch. The full 193-query × 8-
  * thread × 3-round sweep lives in `graft.tools.ConcurrencyProbe`
  * (round-12: clean); this spec races a cross-family subset picked to
  * cover every memoized/registering code path.
  */
class ConcurrencySpec extends SparkSpec {

  test("cross-family queries race through one session without error or count drift") {
    val sf = "/root/testdata/sf0.001"
    val names = Set(
      // shared-frame memo consumers (the same frame from many threads)
      "l12b_embed_neardup_lsh", "l13_neardup_clusters", "l14_drop_neardup",
      "l30_embed_clusters", "l47_image_dedup", "l62_image_clusters",
      // payload-fixture memo (computeIfAbsent writes a temp parquet)
      "l46_audio_stats", "l89_image_phash",
      // extension-function registration (graft_* SQL functions)
      "l11_centroids", "q32b_xxhash",
      // plain SQL via registerAll's view latch
      "q01_project", "q10_agg_tpch1", "q13_rollup", "q22_cte",
      // index-fixture builders
      "l61_neardup_index", "l75_bm25_search",
      // iterative graph (per-round localCheckpoints)
      "l98_pagerank")
    val specs = graft.SparkEntry.registry.filter(q => names(q.name))
    assert(specs.size == names.size, s"missing: ${names -- specs.map(_.name)}")

    val baseline = specs.map(q => q.name -> q.run(spark, sf).count()).toMap
    val pool = Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val order = new scala.util.Random(42).shuffle(specs ++ specs) // 2 rounds interleaved
    try {
      order.map { q =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              val n = q.run(spark, sf).count()
              if (n != baseline(q.name))
                failures.add(s"${q.name}: $n vs baseline ${baseline(q.name)}")
            } catch { case e: Throwable =>
              failures.add(s"${q.name}: ${e.getClass.getSimpleName} " +
                Option(e.getMessage).getOrElse("").take(120))
            }
        })
      }.foreach(_.get())
    } finally { pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES) }
    assert(failures.isEmpty, failures.toArray.mkString("; "))
  }
}
