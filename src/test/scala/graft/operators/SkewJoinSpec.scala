package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def t(n: String) = graft.Fixtures.table(spark, sf, n)

  test("salted inner join equals the plain join") {
    val plain = t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey")
    val salted = SkewJoin.saltedJoin(
      t("lineitem"), t("orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), saltFactor = 7)
      .select("l_orderkey", "l_linenumber", "o_custkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted left join preserves unmatched skewed rows exactly once") {
    import spark.implicits._
    val skewed = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "nomatch"))
      .toDF("k", "v")
    val dim = Seq((1L, "X"), (2L, "Y"), (3L, "unused")).toDF("k", "d")
    val out = SkewJoin.saltedJoin(skewed, dim, Seq("k"), saltFactor = 5, "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set((1L, "a", Some("X")), (1L, "b", Some("X")),
      (2L, "c", Some("Y")), (9L, "nomatch", None)))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dim, Seq("k"), 5, "full")
    }
  }
}
