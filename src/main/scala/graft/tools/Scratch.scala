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
    val docs = graft.Fixtures.table(spark, "/root/testdata/sf0.1", "documents")
    import graft.llm.TextDedup._

    // equivalence: new codegen'd kernel vs the old HOF formulation
    val oldSh = {
      val words = split(col("text"), " ")
      val idx = sequence(lit(0), size(words) - 3)
      val grams = transform(idx, i =>
        concat_ws(" ", (0 until 3).map(o =>
          element_at(words, (i + o + 1).cast("int"))): _*))
      when(size(words) < 3, array(col("text"))).otherwise(array_distinct(grams))
    }
    val cmp = docs.select(
      graft.functions.TextShingles.shingles(col("text"), 3).as("nw"),
      oldSh.as("ol"))
      .filter(not(col("nw") === col("ol")))
    println("[probe] shingle mismatches vs old HOF: " + cmp.count())

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("full l02 run1")(
      minhashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    time("full l02 run2")(
      minhashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    println("[probe] l02 pairs: " +
      minhashLshPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
