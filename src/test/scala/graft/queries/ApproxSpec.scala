package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Numeric guardrails for the sketch-based queries that are rows-only
  * in the driver compare (no DuckDB-identical sketch exists): the
  * approximation must still sit within its declared error bound of the
  * exact answer (VERDICT r3 item 7).
  */
class ApproxSpec extends SparkSpec {
  test("q12: approx_count_distinct within rsd tolerance of exact distinct counts") {
    val d = "/root/testdata/sf0.001"
    val events = graft.Fixtures.table(spark, d, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = Registry.all.find(_.name == "q12_approx_distinct").get.run(spark, d)
    val joined = approx.join(exact, "event_type")
      .select("event_type", "approx_users", "exact_users").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      // default HLL++ rsd = 0.05; allow 4 sigma (plus slack on tiny groups)
      assert(math.abs(a - e) <= math.max(4 * 0.05 * e, 2.0),
        s"${r.getString(0)}: approx $a vs exact $e outside 4*rsd tolerance")
    }
  }
}
