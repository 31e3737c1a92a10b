package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Pins BOTH shapes of q04's size-gated broadcast hints (VERDICT r11
  * watch item): under the threshold every dimension is hinted and the
  * star join is all-BHJ (the bench-scale shape, also pinned by
  * PLAN_DIGESTS.json); past the threshold the hint disappears and the
  * planner falls back to a shuffle join for the too-big dimension —
  * nothing forces an executor-OOM-sized broadcast at the 100×+ scales
  * where customer outgrows the limit.
  */
class BroadcastGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val key = "spark.sql.autoBroadcastJoinThreshold"

  private def q04Plan(): SparkPlan =
    graft.SparkEntry.queries("q04_join_broadcast")(spark, sf)
      .queryExecution.sparkPlan

  private def joins(p: SparkPlan): (Int, Int) = (
    p.collect { case j: BroadcastHashJoinExec => j }.size,
    p.collect { case j: SortMergeJoinExec => j }.size)

  private def withThreshold[A](v: String)(body: => A): A = {
    val prev = spark.conf.get(key, "10MB")
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, prev)
  }

  test("under the threshold: all dims hinted, star join is all-BHJ") {
    val (bhj, smj) = withThreshold("10MB")(joins(q04Plan()))
    assert(bhj == 4 && smj == 0, s"expected 4 BHJ / 0 SMJ, got $bhj / $smj")
  }

  test("past the threshold: customer hint dropped, a shuffle join appears") {
    // at sf0.01 customer.parquet is ~33 KB; a 10 KB threshold models
    // the 100×-scale regime where the dimension outgrows the limit
    assert(graft.Fixtures.onDiskBytes(sf, "customer") > 10 * 1024)
    assert(graft.Fixtures.onDiskBytes(sf, "nation") <= 10 * 1024)
    val (bhj, smj) = withThreshold("10kb")(joins(q04Plan()))
    // the un-hinted customer (and the fact-fact orders join) must NOT
    // be forced broadcasts: at least one SMJ appears and the BHJ count
    // drops below the all-hinted 4
    assert(smj >= 1, s"expected an SMJ for the past-threshold customer join")
    assert(bhj < 4, s"expected fewer than 4 BHJ past the threshold, got $bhj")
  }

  test("threshold disabled (-1): no broadcast joins at all") {
    val (bhj, smj) = withThreshold("-1")(joins(q04Plan()))
    assert(bhj == 0 && smj == 4, s"expected 0 BHJ / 4 SMJ, got $bhj / $smj")
  }
}
