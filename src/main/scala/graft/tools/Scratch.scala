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
    println("[probe] graft_dot float arrays: " + spark.sql(
      "select graft_dot(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float)))").head().getDouble(0))
    println("[probe] graft_dot mixed float/double: " + spark.sql(
      "select graft_dot(array(cast(1.0 as float)), array(cast(2.0 as double)))").head().getDouble(0))
    try { spark.sql("select graft_dot(array('a'), array('b'))").head() }
    catch { case e: Exception =>
      println("[probe] string arrays rejected: " + e.getMessage.linesIterator.next().take(160)) }
    try { spark.sql("select graft_dot(array(cast(1.0 as float)), null)").head() }
    catch { case e: Exception =>
      println("[probe] null arg error: " + e.getMessage.linesIterator.next().take(160)) }
    // null input handling (BinaryExpression default: null in -> null out)
    println("[probe] null typed arg -> " + spark.sql(
      "select graft_dot(array(cast(1.0 as float)), cast(null as array<float>))").head().isNullAt(0))
    spark.stop()
  }
}
