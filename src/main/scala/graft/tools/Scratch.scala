package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{Catalog, TableHandle}

/** Ad-hoc probe; not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val h = new TableHandle(spark, new Catalog(
      java.nio.file.Files.createTempDirectory("records").toString), "t")
    h.append((1L to 7L).toDF("id")); h.flush()
    println("[probe] readRecords: " + h.readRecords().take(3).toList)
    println("[probe] readChunks(3) sizes: " + h.readChunks(3).map(_.size).toList)
    println("[probe] readDataFrame count: " + h.readDataFrame.count())
    h.init(schema = Seq("id" -> "Integer"))
    h.reset()
    println("[probe] empty-table readRecords: " + h.readRecords().toList)
    println("[probe] empty-table readChunks: " + h.readChunks(3).toList)
    spark.stop()
  }
}
