package graft

import org.apache.spark.sql.SparkSession

/** THE session configuration, shared by every driver-contract surface:
  * Bench (what gets measured), Verify (what gets oracle-checked),
  * PlanDump (what plan evidence gets committed), the probe tools and
  * the CLI mains.
  *
  * Unification rule (VERDICT r14 "what's wrong" #2): round 14 set
  * `spark.sql.join.preferSortMergeJoin=false` in the BENCH session
  * only, so the driver verified one set of physical plans and timed
  * another — and the timed set blew up at the contract core count
  * (l98 63 s at local[32] vs 1.6 s at local[8]). Any plan-shaping
  * config therefore lives HERE or nowhere. The r14 flag itself is
  * REVERTED to the Spark default (sort-merge preferred, AQE free to
  * pick better strategies at runtime): a 183-query A/B at local[32]
  * measured 112.2 s (shuffled-hash preferred) vs 110.7 s (default) —
  * no win to keep, and the default removes the one axis the r14
  * blowup could not rule out.
  */
object Sessions {

  /** Applies the shared config to any builder (the CLI composes its
    * own master/appName first). `shufflePartitions` follows the
    * session's core count — scale-adaptive via AQE coalescing rather
    * than a constant tuned for one machine.
    */
  def configure(b: SparkSession.Builder,
      shufflePartitions: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** The `local[cpus]` builder every contract main uses. */
  def local(cpus: String): SparkSession.Builder =
    configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
}
