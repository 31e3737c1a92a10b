package graft.tools

import org.apache.spark.sql.SparkSession

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
    val docs = graft.Fixtures.table(spark, "/root/testdata/sf0.1", "documents")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.llm.TextDedup.minhashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // cold: first invocation in this JVM (no plan-cache hits), after a
    // generic warmup of the session
    docs.groupBy("lang").count().write.format("noop").mode("overwrite").save()
    println(f"[probe] l02 cold (persist, fresh plan): ${run()}%.2f s")
    println(f"[probe] l02 warm rerun (plan-cache): ${run()}%.2f s")
    spark.stop()
  }
}
