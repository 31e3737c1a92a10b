package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc schema/behavior probe; not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "embeddings")) {
      println(s"== $t")
      spark.read.parquet(s"$sf/$t.parquet").printSchema()
    }
    spark.read.parquet(s"$sf/events.parquet").selectExpr("ts", "cast(ts as string)").show(3, false)
    spark.read.parquet(s"$sf/lineitem.parquet").selectExpr("l_shipdate", "cast(l_shipdate as date)").show(3, false)
    spark.stop()
  }
}
