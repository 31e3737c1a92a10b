package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Measurement notes:
  *  - results are written to the `noop` sink so the full plan executes
  *    (a bare count() would let Catalyst skip projections);
  *  - each query runs 3×, the MEDIAN is reported (steady state: the
  *    first run pays codegen/classload, which a long-lived cluster
  *    amortizes; the median rejects one-off interference spikes);
  *  - a query whose min/max diverge >3× gets a stderr warning and a
  *    `divergent` entry in the JSON — a nonempty list means the
  *    machine was loaded and the numbers should not be trusted
  *    (VERDICT r2/r3: two rounds committed contaminated artifacts);
  *  - engine-demo queries (temp-warehouse setup) and oracle-less checks
  *    are excluded — they measure I/O harness, not query execution.
  */
object Bench {
  private val excluded = Set(
    "s05_upsert", "t01_stream_seek", "g01_graph_slice", "s09_monotonic_id",
    "q32b_xxhash", "q12_approx_distinct",
    "l05b_cosine_ann", "l10b_multimodal_features", "l03_simhash",
    "l15_ivf_ann", "l22_pack_sequences", "l35_ivfpq_ann")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q01,l02 restricts to a subset (scaling probes /
    // local iteration); unset = the full driver contract set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val specs = SparkEntry.registry.filterNot(q => excluded(q.name))
      .filter(q => only.forall(_(q.name)))

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm the session (parquet footers, codegen infra) off the clock
    once(specs.head.name)

    val divergent = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = specs.map { q =>
      // per-query unmeasured warmup: the first execution of a query
      // pays its own whole-stage-codegen compile (1-2 s for the
      // generator-heavy plans — q23's string batch, q09's union+window),
      // which a long-lived cluster amortizes; without this, that
      // compile cost trips the divergence flag as fake "machine load"
      once(q.name)
      val runs = Seq.fill(3)(once(q.name))
      if (runs.exists(_ < 0)) q.name -> -1.0
      else {
        val sorted = runs.sorted
        // ratio alone trips on sub-second queries where 100 ms of
        // scheduler jitter is already 3x — require a real absolute gap
        // too before declaring the measurement contaminated
        if (sorted.head > 0 && sorted.last / sorted.head > 3.0 &&
            sorted.last - sorted.head > 0.5) {
          divergent += q.name
          System.err.println(
            f"[bench] WARNING ${q.name}: min ${sorted.head}%.3fs vs max ${sorted.last}%.3fs " +
              "diverge >3x - machine load contaminating measurement")
        }
        q.name -> sorted(1) // median of 3
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val div = divergent.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // The JSON line must be the LAST thing on stdout: executor shutdown
    // logs after it have pushed it out of the driver's tail capture
    // before (round-4 bench artifact arrived unparsed) — stop Spark and
    // silence loggers BEFORE printing, then flush.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":3,"agg":"median","divergent":$div}""")
    System.out.flush()
  }
}
