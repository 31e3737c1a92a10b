package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: run agg/join shapes on 1x and 10x sf0.1 lineitem (6M
  * rows) to observe scaling behavior of the plans under AQE.
  */
object Scratch {
  def time(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime(); f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[scale] $label: $s%.2f s"); s
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val li1 = graft.Fixtures.table(spark, sf, "lineitem")
    val li10 = (1 to 10).map(_ => li1).reduce(_ unionByName _)
    val orders = graft.Fixtures.table(spark, sf, "orders")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def agg(li: org.apache.spark.sql.DataFrame) = li
      .filter(col("l_shipdate") <= "2000-09-02")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"),
        count(lit(1)).as("c"))
    def join(li: org.apache.spark.sql.DataFrame) = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("q"))

    noop(agg(li1)) // warm
    val a1 = time("agg 600k rows")(noop(agg(li1)))
    val a10 = time("agg 6M rows")(noop(agg(li10)))
    val j1 = time("join 600k x 150k")(noop(join(li1)))
    val j10 = time("join 6M x 150k")(noop(join(li10)))
    println(f"[scale] agg scaling 10x data -> ${a10 / a1}%.1fx time; " +
      f"join scaling 10x -> ${j10 / j1}%.1fx time")
    println("[scale] join strategy at 10x: " +
      join(li10).queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join")).map(_.trim.take(60)).mkString(" | "))
    spark.stop()
  }
}
