package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Catalog, TableHandle}

/** Structured-Streaming surface over the versioned table store.
  *
  * The reference's Stream API is an incremental-batch cursor
  * (/root/reference/patterns/node/node.py:18-81) — graft.core.StreamCursor
  * implements those exact semantics. This bridge is the *optional*
  * continuous surface (SURVEY.md §2.2 T8): the same stored tables read
  * as a Structured Stream with `Trigger.AvailableNow`, watermarks and
  * windowed aggregations — the Spark-native path when a pipeline
  * graduates from cursor-polling to genuine streaming.
  *
  * Scale: file-source streaming shards by file; `maxFilesPerTrigger`
  * bounds micro-batch size; state for windowed aggs lives in the
  * checkpoint dir (RocksDB state store on a real cluster).
  */
object StreamingBridge {

  /** Read a catalog table's active version as a file-source stream. */
  def readStream(spark: SparkSession, catalog: Catalog, table: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val path = catalog.activePath(table).getOrElse(
      throw new IllegalStateException(s"table '$table' has no active version"))
    val schema = spark.read.parquet(path).schema
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }

  /** Tumbling-window count/agg with a watermark on `tsCol`. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("cnt"), col("sum_value"))

  /** Drain a streaming query into a new version of `outTable` using
    * AvailableNow (process-everything-then-stop — the streaming
    * equivalent of the reference's run-to-completion node execution).
    * Returns the row count written.
    */
  def drainTo(spark: SparkSession, catalog: Catalog, streamed: DataFrame,
      outTable: String, checkpointRoot: String): Long = {
    val out = new TableHandle(spark, catalog, outTable)
    val version = catalog.newVersion(outTable)
    val path = catalog.versionPath(outTable, version)
    val q = streamed.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation",
        s"$checkpointRoot/_checkpoints/$outTable/$version")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.read.parquet(path).count()
    catalog.setActive(outTable, version, n)
    n
  }
}
