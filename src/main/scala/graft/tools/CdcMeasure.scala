package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off authoring-time measurement of the planted CDC chunk
  * constants pinned in [[graft.queries.CompressPlants.cdcChunks]].
  */
object CdcMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.queries.CompressPlants
    val docs = Seq(
      (0L, CompressPlants.repetitive),
      (1L, CompressPlants.prose),
      (2L, CompressPlants.noise)).toDF("doc_id", "text")
    graft.llm.Corpus.cdcChunkTable(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .foreach(r => println(
        s"CDCROW (${r.getLong(0)}, ${r.getLong(1)}L, ${r.getInt(2)}, " +
          s"${r.getInt(3)}, ${r.getLong(4)}L),"))
    spark.stop()
  }
}
