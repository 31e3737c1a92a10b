package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Numeric guardrails for the sketch-based queries. Since round 13
  * q12/q14c carry their tolerance checks IN-QUERY (the output has
  * hash-checked exact anchors plus boolean in-bounds verdicts the
  * DuckDB oracle asserts true); this spec pins that contract from the
  * Scala side — the verdict columns are all true AND the exact anchor
  * really is the independent exact answer.
  */
class ApproxSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q12: in-query HLL verdicts true; exact anchor matches an independent count") {
    val events = graft.Fixtures.table(spark, d, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("ref_users"))
    val q12 = Registry.all.find(_.name == "q12_approx_distinct").get.run(spark, d)
    val joined = q12.join(exact, "event_type")
      .select("event_type", "exact_users", "ref_users", "approx_ok").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: anchor ${r.getLong(1)} != independent exact ${r.getLong(2)}")
      assert(r.getBoolean(3),
        s"${r.getString(0)}: HLL estimate escaped its 3*rsd bound")
    }
  }

  test("q14c: in-query rank-bound verdicts true; anchor matches the exact median") {
    graft.Fixtures.registerAll(spark, d)
    val ref = spark.sql(
      """select l_returnflag,
        |  cast(percentile(l_quantity, 0.5) as double) as ref_med
        |from lineitem group by l_returnflag""".stripMargin)
    val q14c = Registry.all.find(_.name == "q14c_approx_percentile").get.run(spark, d)
    val joined = q14c.join(ref, "l_returnflag")
      .select("l_returnflag", "med_qty", "ref_med", "med_ok", "q1_ok", "q3_ok")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"${r.getString(0)}: anchor ${r.getDouble(1)} != exact ${r.getDouble(2)}")
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"${r.getString(0)}: an approx percentile escaped its rank bound")
    }
  }
}
