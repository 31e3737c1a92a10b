package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access for the driver-generated parquet tables
  * (see /root/repo/TESTDATA.md). All query entry points take a
  * scale-factor directory and resolve tables through here so the scan
  * always goes straight to parquet (predicate pushdown + column
  * pruning reach the file scan).
  */
object Fixtures {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** DataFrame cache keyed by (session, dir, table): the parquet file
    * listing + footer/schema read happens once per session instead of
    * once per query invocation (the registry runs 50+ queries against
    * the same ten files — without this, schema inference alone costs
    * ~0.5 s per query).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  /** events.parquet's ts physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects — read
    * nanos as long and truncate to micros, the same truncation DuckDB
    * applies) or TIMESTAMP(MICROS) (isAdjustedToUTC=false → Spark reads
    * TIMESTAMP_NTZ; cast to session-TZ TIMESTAMP, identity wall-clock
    * under the project-wide UTC session zone). Branch on the decoded
    * type so either generation yields the same TIMESTAMP column.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((System.identityHashCode(spark), dir, name), _ => {
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/events.parquet")
        import org.apache.spark.sql.types.{LongType, TimestampNTZType}
        raw.schema("ts").dataType match {
          case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Register every fixture table as a temp view named after the table,
    * so `spark.sql` text can reference them exactly like the DuckDB
    * oracle does. Registration is idempotent and cached per session+dir.
    */
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registered.add((System.identityHashCode(spark), dir)))
      tableNames.foreach { n => table(spark, dir, n).createOrReplaceTempView(n) }

  /** First value of `df`'s single string column, or "" when the frame
    * is empty or the value is NULL. The planted-probe queries derive
    * their plant strings from specific doc_ids; on a degenerate corpus
    * (empty, or null-heavy — both real at 100 TB: a filter that matched
    * nothing, a crawl with null text) the empty plant flows through the
    * planting expressions and the query returns empty/unplanted results
    * instead of crashing the driver with head-of-empty-array or an NPE
    * (RobustnessProbe sweeps).
    */
  def headTextOrEmpty(df: DataFrame): String =
    df.head(1).headOption.flatMap(r => Option(r.getString(0))).getOrElse("")

  /** First value of `df`'s single long column, or 0 when the frame is
    * empty or the value is NULL (an aggregate like max/sum over zero
    * rows) — see [[headTextOrEmpty]].
    */
  def headLongOrZero(df: DataFrame): Long =
    df.head(1).headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
      .getOrElse(0L)

  /** On-disk bytes of a fixture table (file or directory) — the same
    * statistic Spark's own planner compares against
    * `spark.sql.autoBroadcastJoinThreshold` for a plain parquet scan,
    * so size-gated broadcast hints (see Relational's dimIfSmall) stay
    * consistent with what the auto-threshold would decide.
    */
  def onDiskBytes(dir: String, name: String): Long = {
    val p = java.nio.file.Paths.get(dir, s"$name.parquet")
    if (!java.nio.file.Files.exists(p)) 0L
    else if (java.nio.file.Files.isRegularFile(p)) java.nio.file.Files.size(p)
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  /** The session's broadcast threshold in bytes; ≤0 (disabled) means
    * "never hint".
    */
  def broadcastThresholdBytes(spark: SparkSession): Long = {
    val v = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    try {
      if (v.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
    } catch { case _: Exception => -1L }
  }
}
