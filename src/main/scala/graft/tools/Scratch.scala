package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.TextDedup

/** Ad-hoc perf probe; not part of the engine. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
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
    val docs = graft.Fixtures.table(spark, sf, "documents")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup")(noop(docs))
    println("[scratch] docs rows=" + docs.count() +
      " avg words=" + docs.select(avg(size(split(col("text"), " ")))).head().getDouble(0))

    val sh = TextDedup.withShingles(docs.select("doc_id", "text"), "text", "sg", 3)
      .select("doc_id", "sg")
    time("shingle only")(noop(sh))
    time("shingle only 2nd")(noop(sh))

    val a = sh.select(col("doc_id").as("id_a"), col("sg").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sg").as("sh_b"))
    val joined = a.join(b, col("id_b") === col("id_a") + 1)
    time("join no jaccard")(noop(joined))
    time("join + jaccard")(noop(joined.select(col("id_a"), col("id_b"),
      round(TextDedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    time("join + jaccard-cse")(noop(
      joined.withColumn("i", inter.cast("double"))
        .select(col("id_a"), col("id_b"),
          round(col("i") / (size(col("sh_a")) + size(col("sh_b")) - col("i")), 4).as("jaccard"))))
    // l02 candidate count at this SF
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text")
    time("minhash full")(noop(lsh))
    spark.stop()
  }
}
