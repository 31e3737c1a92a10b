package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe; not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val li = graft.Fixtures.table(spark, d, "lineitem")

    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    li.groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    val priceC = round(col("l_extendedprice") * 100).cast("bigint")
    val discC = round(col("l_discount") * 100).cast("bigint")
    val netE4 = priceC * (lit(100L) - discC)
    def toDbl(c: org.apache.spark.sql.Column, scale: Int) =
      round(c.cast("decimal(38,0)") / math.pow(10, scale).toLong, 2).cast("double")

    val orders = graft.Fixtures.table(spark, d, "orders")
    val customer = graft.Fixtures.table(spark, d, "customer")
    val nation = graft.Fixtures.table(spark, d, "nation")
    val region = graft.Fixtures.table(spark, d, "region")

    // dim collapse: orders -> r_name, broadcast to fact
    time("q04 dim-collapse") {
      val orderDim = orders.select("o_orderkey", "o_custkey")
        .join(broadcast(customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region.select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .select("o_orderkey", "r_name")
      li.select(col("l_orderkey"), netE4.as("netE4"))
        .join(broadcast(orderDim), col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name")
        .agg(toDbl(sum(col("netE4")), 4).as("rev"), count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
    }

    // q08 range join shapes
    val e = graft.Fixtures.table(spark, d, "events")
    println("[probe] events rows: " + e.count())
    val a = e.select(col("user_id"), col("ts").as("ts_a"), col("value").as("v_a"))
    val b = e.select(col("user_id").as("user_b"), col("ts").as("ts_b"), col("value").as("v_b"))
    val vC = (c: org.apache.spark.sql.Column) => round(c * 100).cast("bigint")
    time("q08 plain equi+filter cents") {
      a.join(b, col("user_id") === col("user_b")
          && col("ts_b") > col("ts_a")
          && col("ts_b") <= col("ts_a") + expr("interval 1 hour"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          toDbl(sum(vC(col("v_b")) - vC(col("v_a"))), 2).as("dv"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q08 hour-bucketed") {
      // each left row joins buckets h and h+1 of the same user
      val aB = a.withColumn("bkt", explode(array(
        floor(unix_timestamp(col("ts_a")) / 3600),
        floor(unix_timestamp(col("ts_a")) / 3600) + 1)))
      val bB = b.withColumn("bkt", floor(unix_timestamp(col("ts_b")) / 3600))
      aB.join(bB, col("user_id") === col("user_b")
          && aB("bkt") === bB("bkt")
          && col("ts_b") > col("ts_a")
          && col("ts_b") <= col("ts_a") + expr("interval 1 hour"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          toDbl(sum(vC(col("v_b")) - vC(col("v_a"))), 2).as("dv"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
