package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe; not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    println("[probe] graft_base32(bigint): " +
      spark.sql("select graft_base32(cast(7 as bigint))").head().getString(0))
    try {
      spark.sql("select graft_base32('not-a-long')").head()
      println("[probe] string arg: NO ERROR (unexpected)")
    } catch {
      case e: Exception =>
        println("[probe] string arg rejected: " + e.getMessage.linesIterator.next())
    }
    try {
      spark.sql("select vector_avg(embedding) from range(1)").head()
    } catch {
      case e: Exception =>
        println("[probe] vector_avg bad column: " + e.getMessage.linesIterator.next())
    }
    spark.stop()
  }
}
