package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** The Table facade — semantics from the reference's node SDK
  * (/root/reference/patterns/node/node.py:117-414):
  * versioned reads, buffered writes flushed at execution end, upsert on
  * `unique_on` keys, replace/truncate/reset, SQL over the active
  * version, auto-created fields, inferred schema with hints.
  *
  * Scale notes: reads are plain parquet scans (pushdown + pruning
  * apply); upsert is a key-shuffled full-outer MERGE writing a fresh
  * version (atomic pointer swap — SURVEY.md §7.4.3); nothing on the
  * write path collects to the driver.
  */
final class TableHandle(
    val spark: SparkSession,
    val catalog: Catalog,
    val name: String,
    val mode: String = "rw",
    onSignal: (String, String) => Unit = (_, _) => ()) {

  import TableHandle._

  private sealed trait Pending
  private case class PendAppend(df: DataFrame) extends Pending
  private case class PendUpsert(df: DataFrame, orderBy: Seq[Column]) extends Pending
  private val pending = ArrayBuffer.empty[Pending]

  // ---- Table.init (node.py:269-297) ----------------------------------
  /** `partitionBy` directory-partitions every version (date keys etc. —
    * enables static + dynamic partition pruning on reads). `hashBuckets`
    * adds a derived `_gr_bucket = pmod(xxhash64(uniqueOn), n)` partition
    * so upserts rewrite only the buckets that contain incoming keys
    * (SURVEY.md §7.4.3's 100 TB path).
    */
  def init(
      schema: Seq[(String, String)] = Nil,
      schemaRef: Option[String] = None,
      schemaHints: Map[String, String] = Map.empty,
      uniqueOn: Seq[String] = Nil,
      addCreated: Option[String] = None,
      addMonotonicId: Option[String] = None,
      strictlyMonotonicOrdering: Option[String] = None,
      createdOrdering: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      hashBuckets: Option[Int] = None,
      clusterBy: Seq[String] = Nil): this.type = {
    catalog.update(name) { m =>
      val orderings = m.orderings ++
        strictlyMonotonicOrdering.map("monotonic" -> _) ++
        createdOrdering.map("created" -> _) ++
        // add_monotonic_id implies a strictly-monotonic ordering on it
        addMonotonicId.map("monotonic" -> _) ++
        addCreated.map("created" -> _)
      val parts = (partitionBy ++ hashBuckets.map(_ => TableHandle.BucketCol)).toList
      m.copy(
        // schema precedence: explicit field dict > named/DDL reference
        // (node.py:269-283 "a CommonModel Schema object or str name, or
        // a dictionary of field names to field types")
        schemaDdl = if (schema.nonEmpty)
          Some(CommonModel.structFromDict(schema).toDDL)
        else schemaRef.map(r => CommonModel.resolveSchema(r).toDDL)
          .orElse(m.schemaDdl),
        schemaHints = m.schemaHints ++ schemaHints,
        uniqueOn = if (uniqueOn.nonEmpty) uniqueOn.toList else m.uniqueOn,
        addCreated = addCreated.orElse(m.addCreated),
        addMonotonicId = addMonotonicId.orElse(m.addMonotonicId),
        partitionBy = if (parts.nonEmpty) parts else m.partitionBy,
        hashBuckets = hashBuckets.orElse(m.hashBuckets),
        clusterBy = if (clusterBy.nonEmpty) Some(clusterBy.toList) else m.clusterBy,
        orderings = orderings)
    }
    this
  }

  def meta: TableMeta = catalog.metaOrFresh(name)
  def exists: Boolean = catalog.activePath(name).exists(p =>
    java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
  def recordCount: Long = catalog.recordCount(name)

  // ---- reads (node.py:141-189) ---------------------------------------
  def read: DataFrame = catalog.activePath(name) match {
    case Some(p) if java.nio.file.Files.exists(java.nio.file.Paths.get(p)) =>
      spark.read.parquet(p)
    case _ =>
      val ddl = meta.schemaDdl.getOrElse(
        throw new IllegalStateException(
          s"table '$name' has no active version and no declared schema"))
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), StructType.fromDDL(ddl))
  }

  /** Retained version ids, oldest first, with record counts — versions
    * are non-destructive (node.py:399-405) until `vacuum`.
    */
  def versions: Seq[(String, Long)] =
    catalog.meta(name).map(_.versions.map(v => (v.id, v.recordCount)))
      .getOrElse(Nil)

  /** Time-travel read of a retained (possibly non-active) version.
    * Version directories are immutable once written, so this reads
    * consistently regardless of later swaps — the audit/rollback
    * companion of the versioned catalog.
    */
  def readVersion(versionId: String): DataFrame = {
    val p = catalog.versionPath(name, versionId)
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"table '$name' has no retained version '$versionId'")
    spark.read.parquet(p)
  }

  /** records format = driver-side convenience façade only (never used on
    * the distributed path — SURVEY.md §7.4.6).
    */
  def readRecords(): Iterator[Map[String, Any]] = {
    import scala.jdk.CollectionConverters._
    val df = read
    val cols = df.columns
    df.toLocalIterator().asScala.map(r => cols.zipWithIndex.map {
      case (c, i) => c -> r.get(i)
    }.toMap)
  }

  /** chunksize semantics (node.py:141-154): iterator of record chunks. */
  def readChunks(chunkSize: Int): Iterator[Seq[Map[String, Any]]] =
    readRecords().grouped(chunkSize)

  /** read_dataframe alias (node.py:156-166). */
  def readDataFrame: DataFrame = read

  /** read_sql: the table is addressable by its own name (node.py:168-189). */
  def readSql(sql: String): DataFrame = {
    read.createOrReplaceTempView(name)
    spark.sql(Template.substitute(sql, Map(name -> name)))
  }

  // ---- writes (node.py:299-354, buffered per node.py:305-307,407-414) --
  def append(df: DataFrame): Unit = { requireWrite(); pending += PendAppend(df) }

  def appendRecords(records: Seq[Map[String, Any]]): Unit =
    append(inferRecords(spark, records, meta.schemaDdl))

  /** Insert-or-update on the `unique_on` keys (node.py:318-334).
    *
    * `orderBy`: which duplicate wins when one batch carries several rows
    * for the same key — the row with the GREATEST `orderBy` tuple is
    * kept. Without it the tie-break falls back to arrival order via
    * `monotonically_increasing_id()`, which is NOT stable under task
    * retry or AQE repartitioning; pass an explicit ordering column when
    * within-batch duplicates are possible and determinism matters.
    */
  def upsert(df: DataFrame, orderBy: Seq[Column] = Nil): Unit = {
    requireWrite()
    require(meta.uniqueOn.nonEmpty, s"upsert on '$name' needs init(uniqueOn=...)")
    pending += PendUpsert(df, orderBy)
  }

  def upsertRecords(records: Seq[Map[String, Any]]): Unit =
    upsert(inferRecords(spark, records, meta.schemaDdl))

  /** replace = reset + append: fresh version seeded with df
    * (node.py:336-345). The whole cycle is one write-lock scope so a
    * racing writer can't land between the reset and the seed append.
    */
  def replace(df: DataFrame): Unit = catalog.withWriteLock(name) {
    requireWrite(); flush(); reset(); append(df); flush()
  }

  /** truncate: destructive delete-all-rows, version and schema kept
    * (node.py:347-354).
    */
  def truncate(): Unit = catalog.withWriteLock(name) {
    requireWrite()
    pending.clear()
    catalog.activePath(name).foreach { p =>
      val schema = spark.read.parquet(p).schema
      val empty = spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      empty.write.mode("overwrite").parquet(p)
      meta.activeVersion.foreach(v => catalog.setRecordCount(name, v, 0L))
      onSignal(name, "update")
    }
  }

  /** reset: non-destructive pointer swap (node.py:216-222, 399-405). */
  def reset(): Unit = { catalog.reset(name); onSignal(name, "reset") }

  /** execute_sql with event-kind sniffing (node.py:356-373). */
  def executeSql(sql: String): Unit = {
    requireWrite()
    val s = Template.substitute(sql.trim, Map(name -> name))
    val lower = s.toLowerCase
    if (exists) read.createOrReplaceTempView(name)
    if (lower.startsWith("create table") || lower.startsWith("create or replace table")) {
      val asIdx = lower.indexOf(" as ")
      require(asIdx >= 0,
        s"executeSql on '$name' only supports CREATE TABLE ... AS SELECT (got: ${s.take(60)}...)")
      val select = s.substring(asIdx + 4)
      replace(spark.sql(select))                       // CTAS → new version
    } else if (lower.startsWith("insert into")) {
      val selIdx = lower.indexOf("select")
      require(selIdx >= 0,
        s"executeSql on '$name' only supports INSERT INTO ... SELECT " +
          s"(VALUES form unsupported; use append()) (got: ${s.take(60)}...)")
      val select = s.substring(selIdx)
      append(spark.sql(select)); flush()               // DML insert → append
    } else if (lower.startsWith("delete from")) {
      val whereIdx = lower.indexOf("where")
      require(whereIdx > 0, "unqualified DELETE: use truncate()")
      val pred = s.substring(whereIdx + 5)
      val kept = read.filter(not(expr(pred)))
      writeNewVersion(kept)
      onSignal(name, "update")
    } else {
      spark.sql(s); onSignal(name, "update")
    }
  }

  /** Flush buffered writes (execution end or explicit — node.py:407-414). */
  def flush(): Unit = {
    if (pending.isEmpty) return
    val ops = pending.toList
    pending.clear()
    // coalesce adjacent appends into one write
    val grouped = ArrayBuffer.empty[Pending]
    ops.foreach {
      case PendAppend(df) => grouped.lastOption match {
        case Some(PendAppend(prev)) =>
          grouped(grouped.size - 1) = PendAppend(unionWiden(prev, df))
        case _ => grouped += PendAppend(df)
      }
      case u => grouped += u
    }
    // the whole batch is ONE write cycle: serialized per table so a
    // concurrent flush from another handle can't interleave its
    // read-merge-commit with ours and drop rows (Catalog.withWriteLock
    // scaladoc; CatalogSpec "interleaved upserts" pins it)
    catalog.withWriteLock(name) {
      grouped.foreach {
        case PendAppend(df) => doAppend(df)
        case PendUpsert(df, orderBy) => doUpsert(df, orderBy)
      }
    }
  }

  // ---- internals ------------------------------------------------------
  private def requireWrite(): Unit =
    require(mode.contains("w"), s"table '$name' opened read-only")

  private def withAutoFields(df: DataFrame, batchSeq: Long): DataFrame = {
    val m = meta
    var out = CommonModel.applyHints(df, m.schemaHints)
    m.addCreated.foreach { c =>
      if (!out.columns.contains(c)) out = out.withColumn(c, current_timestamp())
    }
    m.addMonotonicId.foreach { c =>
      if (!out.columns.contains(c))
        out = out.withColumn(c, graft.functions.Base32Fixed.monotonicId(batchSeq))
    }
    (m.hashBuckets, m.uniqueOn) match {
      case (Some(n), keys) if keys.nonEmpty && !out.columns.contains(TableHandle.BucketCol) =>
        out = out.withColumn(TableHandle.BucketCol,
          pmod(xxhash64(keys.map(col): _*), lit(n)).cast("int"))
      case _ =>
    }
    out
  }

  /** Run `write` on `df` with an observed row count piggy-backed on the
    * write job itself — no post-write re-read, no recompute (at 100 TB a
    * count-back would double write-path I/O; VERDICT r2 item 3).
    */
  private def writeCounted(df: DataFrame, write: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs, count(lit(1)).as("n")))
    obs.get("n").asInstanceOf[Long]
  }

  private def doAppend(df: DataFrame): Unit = {
    val m = meta
    m.activeVersion match {
      case Some(v) =>
        val path = catalog.versionPath(name, v)
        val existing = spark.read.parquet(path)
        val incomingRaw = withAutoFields(df, batchSeqFor())
        // partition-directory values read back type-INFERRED (a string
        // "2024-01-01" partition key comes back DATE); align the
        // incoming partition columns to the inferred types so such
        // tables don't fall into a full-table rewrite on every append.
        // (Values whose string and inferred forms differ — "01" vs 1 —
        // need a declared schema; see init scaladoc.)
        val incoming = m.partitionBy.foldLeft(incomingRaw) { (d, p) =>
          (existing.schema.find(_.name == p), d.schema.find(_.name == p)) match {
            case (Some(ef), Some(inf)) if ef.dataType != inf.dataType =>
              d.withColumn(p, col(p).cast(ef.dataType))
            case _ => d
          }
        }
        if (existing.schema == incoming.schema ||
            sameColumns(existing.schema, incoming.schema)) {
          val aligned = clusterLight(
            incoming.select(existing.columns.map(col): _*), m.clusterBy)
          // partitioned tables MUST append through partitionBy or the
          // new files land flat at the version root and corrupt the
          // directory layout (partition discovery then drops them)
          val parts = m.partitionBy.filter(aligned.columns.contains)
          val added = writeCounted(aligned, d => {
            val w = d.write.mode("append")
            (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path)
          })
          catalog.setRecordCount(name, v, catalog.recordCount(name) + added)
        } else {
          // widen-only schema evolution: rewrite into a fresh version
          writeNewVersion(unionWiden(existing, incoming))
        }
        onSignal(name, "update")
      case None =>
        writeNewVersion(withAutoFields(df, batchSeqFor()))
        onSignal(name, "create")
    }
  }

  /** Key-shuffled MERGE: last-wins within the batch, new version, swap.
    * Determinism rule (SURVEY.md §4): within one upsert batch the
    * highest (partition, row) wins; across batches the later flush wins.
    *
    * Partition-pruned path: when the table is partitioned (date keys or
    * the `hashBuckets` derived bucket), only partitions containing
    * incoming rows are merged and rewritten; untouched partitions'
    * files are HARDLINKED into the new version directory — O(metadata),
    * no data copy. Upsert cost is then proportional to touched
    * partitions, not table size (the 100 TB requirement; on an object
    * store the link step becomes a manifest entry instead).
    */
  private def doUpsert(df: DataFrame, orderBy: Seq[Column]): Unit = {
    val keys = meta.uniqueOn
    val incomingRaw = withAutoFields(df, batchSeqFor())
    val tieBreak =
      if (orderBy.nonEmpty) orderBy.map(_.desc) // greatest tuple wins
      else Seq(monotonically_increasing_id().desc) // arrival order (nondeterministic under retry)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tieBreak: _*)
    // persist the deduped batch: the touched-partition collect, the
    // semi-join prune frame, and the merge join must all see the SAME
    // winner rows — the monotonically_increasing_id tie-break is not
    // stable across independent re-evaluations (ADVICE r3)
    val incoming = incomingRaw
      .withColumn("_gr_rn", row_number().over(w))
      .filter(col("_gr_rn") === 1).drop("_gr_rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!exists) { writeNewVersion(incoming); onSignal(name, "create"); return }

      val m = meta
      val parts = m.partitionBy
      if (parts.nonEmpty && parts.forall(incoming.columns.contains)) {
        val touched = incoming.select(parts.map(col): _*).distinct().collect()
          .map(r => parts.indices.map(i => r.get(i)).toList)
        // path-segment comparison uses the same escaping parquet uses
        // when writing partition directories (null/empty → the Hive
        // default-partition sentinel) — String.valueOf would silently
        // mismatch escaped or null values and hardlink touched
        // partitions anyway (duplicate rows)
        val touchedSet: Set[List[String]] =
          touched.map(_.map(partitionPathValue)).toSet
        // Touched-partition scan predicate: a literal OR-chain lets the
        // parquet source prune partitions statically, but its expression
        // tree grows with the partition count (codegen blowup on wide
        // upserts) — above the threshold switch to a broadcast semi-join
        // on the partition-value tuple (DPP/AQE prune at runtime).
        val existingTouched =
          if (touched.length <= PrunePredicateMaxPartitions) {
            val pred = touched.map(t =>
                parts.zip(t).map { case (p, v) => col(p) <=> lit(v) }.reduce(_ && _))
              .reduceOption(_ || _).getOrElse(lit(false))
            read.filter(pred) // statically partition-pruned scan
          } else {
            // Split tuples: plain (no nulls) ride an EqualTo semi-join
            // against a driver-built local frame (DPP-eligible — a
            // null-safe join key would be rewritten past what partition
            // pruning matches, reverting the scan to O(table)); the
            // usually-tiny null-bearing subset goes through a
            // statically-pruned <=> filter. EqualTo never matches null
            // partition rows, so the union is disjoint.
            val (nullTuples, plainTuples) = touched.partition(_.contains(null))
            val partsSchema = StructType(
              incoming.select(parts.map(col): _*).schema.map(_.copy(nullable = true)))
            val plainDf = spark.createDataFrame(
              java.util.Arrays.asList(plainTuples.map(t => Row(t: _*)): _*), partsSchema)
            val eqJoin = read.join(broadcast(plainDf), parts, "left_semi")
            val nullPred = nullTuples.map(t =>
                parts.zip(t).map { case (p, v) => col(p) <=> lit(v) }.reduce(_ && _))
              .reduceOption(_ || _)
            (plainTuples.nonEmpty, nullPred) match {
              case (true, Some(pred)) => eqJoin.unionByName(read.filter(pred))
              case (true, None) => eqJoin
              case (false, Some(pred)) => read.filter(pred)
              case (false, None) => read.filter(lit(false))
            }
          }
        val prevTotal = catalog.recordCount(name)
        val obsTouched = org.apache.spark.sql.Observation()
        val existingObserved =
          existingTouched.observe(obsTouched, count(lit(1)).as("n"))
        val merged = mergeFrames(existingObserved, incoming, keys)

        val oldPath = catalog.activePath(name).get
        val v = catalog.newVersion(name)
        val newPath = catalog.versionPath(name, v)
        val mergedN = writeCounted(clusterLight(merged, m.clusterBy),
          _.write.mode("overwrite").partitionBy(parts: _*).parquet(newPath))
        TableHandle.linkUntouchedPartitions(oldPath, newPath, parts.size, touchedSet)
        // linked (untouched) rows = previous total minus the touched rows
        // the merge consumed — both observed, nothing re-read
        val n = mergedN + (prevTotal - obsTouched.get("n").asInstanceOf[Long])
        catalog.setActive(name, v, n)
      } else {
        writeNewVersion(mergeFrames(read, incoming, keys))
      }
      onSignal(name, "update")
    } finally incoming.unpersist()
  }

  private def mergeFrames(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = (existing.columns ++ incoming.columns).distinct
      .filterNot(keys.contains)
    val e = existing.alias("e")
    val i = incoming.alias("i")
    e.join(i, keys, "full_outer").select(
      keys.map(col) ++ dataCols.map { c =>
        val inI = incoming.columns.contains(c)
        val inE = existing.columns.contains(c)
        if (inI && inE) coalesce(col(s"i.$c"), col(s"e.$c")).as(c)
        else if (inI) col(s"i.$c").as(c)
        else col(s"e.$c").as(c)
      }: _*)
  }

  /** Range-cluster + sort rows by `init(clusterBy=...)` keys before a
    * full-version write: parquet row-group / file min-max stats become
    * tight, near-disjoint ranges, so scans filtering on the cluster
    * keys skip whole row groups and files (the poor man's Z-order —
    * single-key or prefix-ordered multi-key locality). `n` overrides
    * the range partition count (compaction's bin-packing).
    */
  private def clustered(df: DataFrame, clusterBy: Option[List[String]],
      n: Option[Int] = None): DataFrame =
    clusterBy match {
      case Some(cols) if cols.forall(df.columns.contains) =>
        val cs = cols.map(col)
        val ranged = n.map(df.repartitionByRange(_, cs: _*))
          .getOrElse(df.repartitionByRange(cs: _*))
        ranged.sortWithinPartitions(cs: _*)
      case _ => df
    }

  /** Shuffle-free clustering for incremental/pruned writes: sort only
    * within the batch's partitions (a global range shuffle per append
    * or per upsert would defeat their economics; row-group stats still
    * tighten within each written file).
    */
  private def clusterLight(df: DataFrame, clusterBy: Option[List[String]]): DataFrame =
    clusterBy match {
      case Some(cols) if cols.forall(df.columns.contains) =>
        df.sortWithinPartitions(cols.map(col): _*)
      case _ => df
    }

  /** Bin-pack the active version's data files into ~`targetFileBytes`
    * outputs as a NEW version (atomic swap; the old version's files are
    * retained until vacuum). Fixes the many-small-files tax of frequent
    * appends — per-file open/footer overhead and tiny row groups.
    * Partitioned tables end with one file per partition directory
    * (cluster keys sorted within each); unpartitioned clustered tables
    * re-range-cluster globally; plain tables coalesce (narrow, no
    * shuffle). Already-packed tables (file count <= target) are a
    * NO-OP. Purely physical: record data is unchanged, so NO update
    * signal is emitted (downstream consumers must not re-trigger) —
    * but a long-running streaming reader tailing the old version dir
    * will not see post-compact appends; restart such streams (the
    * AvailableNow drain pattern re-resolves the path per run).
    * Returns the new version id, None when nothing was rewritten.
    */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): Option[String] = {
    requireWrite()
    flush()
    val m = meta
    catalog.activePath(name)
      .map(java.nio.file.Paths.get(_))
      .filter(java.nio.file.Files.exists(_))
      .flatMap { path =>
        import scala.jdk.CollectionConverters._
        val sizes = java.nio.file.Files.walk(path).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size(_)).toList
        val nFiles = math.max(1, math.ceil(sizes.sum.toDouble / targetFileBytes).toInt)
        if (sizes.length <= nFiles) None // already packed: skip the rewrite
        else {
          val df = read
          val parts = m.partitionBy.filter(df.columns.contains)
          val packed =
            if (parts.nonEmpty) // one task (→ one file) per partition dir
              clusterLight(df.repartition(nFiles, parts.map(col): _*), m.clusterBy)
            else if (m.clusterBy.exists(_.forall(df.columns.contains)))
              clustered(df, m.clusterBy, Some(nFiles))
            else df.coalesce(nFiles) // narrow: no shuffle
          Some(commitNewVersion(packed, parts))
        }
      }
  }

  /** Allocate + write + activate a new version; shared by full writes
    * and compaction so the commit sequence exists once. */
  private def commitNewVersion(df: DataFrame, parts: Seq[String]): String = {
    val v = catalog.newVersion(name)
    val path = catalog.versionPath(name, v)
    val n = writeCounted(df, d => {
      val writer = d.write.mode("overwrite")
      (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(path)
    })
    catalog.setActive(name, v, n)
    v
  }

  private def writeNewVersion(df: DataFrame): Unit = {
    val m = meta
    commitNewVersion(clustered(df, m.clusterBy),
      m.partitionBy.filter(df.columns.contains))
  }

  /** One fresh sequence per write batch: in-place appends previously
    * reused meta.nextSeq without advancing it, so consecutive appends
    * minted COLLIDING monotonic ids (same batch component, row numbers
    * restarting at zero). Version ids share the sequence and need not
    * be contiguous. */
  private def batchSeqFor(): Long = catalog.nextBatchSeq(name)
}

object TableHandle {
  import scala.jdk.CollectionConverters._

  /** Derived hash-bucket partition column (init(hashBuckets=…)). */
  val BucketCol = "_gr_bucket"

  /** Above this many touched partitions the upsert scan predicate
    * switches from a literal OR-chain (statically prunable) to a
    * broadcast semi-join (bounded expression size). Mutable only so the
    * spec suite can force both paths onto identical input.
    */
  private[core] var PrunePredicateMaxPartitions = 64

  /** A partition value as it appears in the parquet directory name:
    * the escaping `InsertIntoHadoopFsRelation` applies, with null and
    * empty collapsing to the Hive default-partition sentinel. (Date and
    * primitive values stringify identically to their path rendering;
    * timestamp partition keys — an anti-pattern at any scale — are not
    * normalized here.)
    */
  private[core] def partitionPathValue(v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    v match {
      case null => ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      case s =>
        val str = String.valueOf(s)
        if (str.isEmpty) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(str)
    }
  }
  // (an earlier RowIterOps implicit here recursed into itself — the
  // java-iterator conversion must come from CollectionConverters only)

  /** Hardlink every data file of `oldPath` whose partition-directory
    * values are NOT in `touched` into the same relative location under
    * `newPath`. Partition values are the `k=v` path segments in order.
    */
  private[core] def linkUntouchedPartitions(
      oldPath: String, newPath: String, nParts: Int,
      touched: Set[List[String]]): Unit = {
    val root = java.nio.file.Paths.get(oldPath)
    val dest = java.nio.file.Paths.get(newPath)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach { f =>
        val rel = root.relativize(f)
        val segs = (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
        val partVals = segs.filter(_.contains("=")).take(nParts)
          .map(_.split("=", 2)(1)).toList
        val isData = f.getFileName.toString.endsWith(".parquet")
        if (isData && partVals.size == nParts && !touched.contains(partVals)) {
          val target = dest.resolve(rel)
          java.nio.file.Files.createDirectories(target.getParent)
          java.nio.file.Files.createLink(target, f)
        }
      }
  }

  /** Nullability-normalized type: parquet reads arrays/maps/structs
    * back with nullable elements (`containsNull=true`) even when the
    * writing frame declared them non-null, so any schema comparison
    * between a stored version and a fresh incoming frame MUST ignore
    * nullability at every nesting level — before this normalization,
    * the second append of an `array<bigint>` column silently collapsed
    * it to StringType via the widen path (found by the round-11
    * streaming scale probe: the near-dup index's `sig` column).
    */
  private[core] def normNull(t: DataType): DataType = t match {
    case ArrayType(e, _) => ArrayType(normNull(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(normNull(k), normNull(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = normNull(f.dataType), nullable = true)))
    case other => other
  }

  private[core] def sameColumns(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, normNull(f.dataType))).sortBy(_._1).sameElements(
      b.fields.map(f => (f.name, normNull(f.dataType))).sortBy(_._1))

  /** Widen-only union: missing columns become nulls; numeric types are
    * promoted (int→long→double); arrays widen element-wise;
    * incompatible types promote to string (SURVEY.md §7.4.4).
    */
  private[core] def unionWiden(a: DataFrame, b: DataFrame): DataFrame = {
    val types = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    (a.schema.fields ++ b.schema.fields).foreach { f =>
      types(f.name) = types.get(f.name) match {
        case None => f.dataType
        case Some(t) => widen(t, f.dataType)
      }
    }
    def aligned(df: DataFrame): DataFrame =
      df.select(types.map { case (n, t) =>
        (if (df.columns.contains(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
      }.toSeq: _*)
    aligned(a).unionByName(aligned(b))
  }

  private[core] def widen(x: DataType, y: DataType): DataType =
    if (normNull(x) == normNull(y)) normNull(x)
    else (x, y) match {
      case (a, b) if num(a) && num(b) =>
        if (rank(a) >= rank(b)) a else b
      case (ArrayType(ex, _), ArrayType(ey, _)) =>
        ArrayType(widen(ex, ey), containsNull = true)
      case _ => StringType
    }
  private def num(t: DataType) = rank(t) >= 0
  private def rank(t: DataType): Int = t match {
    case ByteType => 0; case ShortType => 1; case IntegerType => 2
    case LongType => 3; case FloatType => 4; case DoubleType => 5
    case _ => -1
  }

  /** Schema inference from records (node.py:303-304 "If not provided the
    * schema will be inferred"): union of keys, widen-only value types.
    */
  def inferRecords(
      spark: SparkSession,
      records: Seq[Map[String, Any]],
      declaredDdl: Option[String]): DataFrame = {
    val schema: StructType = declaredDdl.map(StructType.fromDDL).getOrElse {
      val types = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      records.foreach(_.foreach { case (k, v) =>
        val t = typeOf(v)
        types(k) = types.get(k) match {
          case None | Some(NullType) => t
          case Some(prev) if t == NullType => prev
          case Some(prev) => widen(prev, t)
        }
      })
      StructType(types.map { case (n, t) =>
        StructField(n, if (t == NullType) StringType else t)
      }.toSeq)
    }
    val rows = records.map { r =>
      Row.fromSeq(schema.fields.toSeq.map { f =>
        coerce(r.get(f.name).orNull, f.dataType)
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def typeOf(v: Any): DataType = v match {
    case null => NullType
    case _: Boolean => BooleanType
    case _: Byte | _: Short | _: Int | _: Long => LongType
    case _: Float | _: Double => DoubleType
    case _: java.sql.Timestamp | _: java.time.Instant => TimestampType
    case _: java.sql.Date | _: java.time.LocalDate => DateType
    case _: Array[Byte] => BinaryType
    case _: BigDecimal => DecimalType(38, 9)
    case _ => StringType
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (x: Int, LongType) => x.toLong
    case (x: Byte, LongType) => x.toLong
    case (x: Short, LongType) => x.toLong
    case (x: Float, DoubleType) => x.toDouble
    case (x: Int, DoubleType) => x.toDouble
    case (x: Long, DoubleType) => x.toDouble
    case (x: java.time.Instant, TimestampType) => java.sql.Timestamp.from(x)
    case (x: java.time.LocalDate, DateType) => java.sql.Date.valueOf(x)
    case (x: BigDecimal, DecimalType()) => x.bigDecimal
    case (x, StringType) if !x.isInstanceOf[String] => x.toString
    case (x, _) => x
  }
}

/** `{{ }}` template substitution shared by SQL nodes and read_sql
  * (/root/reference/patterns/cli/commands/create.py:239-244).
  */
object Template {
  private val ref = raw"\{\{\s*([A-Za-z0-9_.]+)\s*\}\}".r

  /** Replace `{{ name }}` with the mapped replacement (a view name) and
    * `{{ param }}` with a SQL literal when given in `params`.
    */
  def substitute(
      sql: String,
      tables: Map[String, String],
      params: Map[String, Any] = Map.empty): String =
    ref.replaceAllIn(sql, m => {
      val key = m.group(1)
      tables.get(key)
        .orElse(params.get(key).map(literal))
        .getOrElse(throw new IllegalArgumentException(
          s"unbound template reference '{{ $key }}'"))
        .replace("\\", "\\\\").replace("$", "\\$")
    })

  def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case other => other.toString
  }
}
