package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of selected registry
  * queries and greps for the properties that matter at 100 TB —
  * parquet PushedFilters, pruned ReadSchema, broadcast joins, and
  * whole-stage codegen coverage.
  * Run: sbt "runMain graft.tools.PlanAudit [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter", "q04_join_broadcast", "q10_agg_tpch1",
        "q15_window_rank", "l05_cosine_knn", "q09_join_asof",
        "l02_minhash_lsh", "l12b_embed_neardup_lsh", "l13_neardup_clusters")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n========== $n ==========")
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toList
      val schemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toList
      val bhj = plan.split("\n").count(_.contains("BroadcastHashJoin"))
      val smj = plan.split("\n").count(_.contains("SortMergeJoin"))
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"--- summary[$n]: pushedFilters=${pushed.size} " +
        s"broadcastJoins=$bhj sortMergeJoins=$smj codegenSpans=$wsc")
      pushed.foreach(p => println(s"    $p"))
      schemas.foreach(s => println(s"    ${s.take(120)}"))
    }
    spark.stop()
  }
}
