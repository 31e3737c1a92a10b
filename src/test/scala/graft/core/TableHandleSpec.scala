package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableHandleSpec extends SparkSpec {

  private def handle(root: String, name: String = "t"): TableHandle =
    new TableHandle(spark, new Catalog(root), name)

  test("append is buffered until flush; first write creates a version") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(!h.exists) // buffered, nothing written yet (node.py:305-307)
    h.flush()
    assert(h.exists && h.recordCount == 2)
    h.append(Seq((3L, "c")).toDF("id", "s"))
    h.flush()
    assert(h.read.count() == 3 && h.recordCount == 3)
  }

  test("appendRecords infers schema and widens across records") {
    val h = handle(tmpDir("tbl"))
    h.appendRecords(Seq(
      Map("id" -> 1, "v" -> 10L, "s" -> "x"),
      Map("id" -> 2, "v" -> 2.5, "note" -> "later-column")))
    h.flush()
    val df = h.read
    assert(df.schema("v").dataType.typeName == "double") // long widened
    assert(df.columns.toSet == Set("id", "v", "s", "note"))
    assert(df.where(col("note").isNull).count() == 1)
  }

  test("upsert: insert-or-update on unique_on, last wins, idempotent") {
    import spark.implicits._
    val h = handle(tmpDir("tbl")).init(uniqueOn = Seq("id"))
    h.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v"))
    h.flush()
    h.upsert(Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("id", "s", "v"))
    h.flush()
    val m = h.read.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(m.toSeq == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    // idempotent: same upsert again changes nothing
    h.upsert(Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("id", "s", "v"))
    h.flush()
    assert(h.read.count() == 3)
    // within-batch duplicate keys: exactly one row survives
    h.upsert(Seq((4L, "x", 1.0), (4L, "y", 2.0)).toDF("id", "s", "v"))
    h.flush()
    assert(h.read.where(col("id") === 4).count() == 1)
  }

  test("replace creates a new version; old one retained until vacuum") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq(1L, 2L, 3L).toDF("id")); h.flush()
    val v1 = h.meta.activeVersion.get
    h.replace(Seq(9L).toDF("id"))
    assert(h.read.count() == 1)
    assert(h.meta.activeVersion.get != v1)
    assert(h.meta.versions.exists(_.id == v1)) // retained
  }

  test("truncate keeps version and schema, deletes rows") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, "a")).toDF("id", "s")); h.flush()
    val v = h.meta.activeVersion.get
    h.truncate()
    assert(h.meta.activeVersion.contains(v))
    assert(h.read.count() == 0)
    assert(h.read.columns.toSeq == Seq("id", "s"))
  }

  test("reset: pointer swap, then read uses declared schema") {
    import spark.implicits._
    val h = handle(tmpDir("tbl")).init(schema = Seq("id" -> "Integer", "s" -> "Text"))
    h.append(Seq((1L, "a")).toDF("id", "s")); h.flush()
    h.reset()
    assert(h.read.count() == 0)
    assert(h.read.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("schema hints cast inferred types (node.py:283)") {
    val h = handle(tmpDir("tbl")).init(schemaHints = Map("v" -> "Float"))
    h.appendRecords(Seq(Map("id" -> 1L, "v" -> 5L)))
    h.flush()
    assert(h.read.schema("v").dataType.typeName == "double")
  }

  test("auto-fields: add_created and strictly-monotonic base32 id") {
    import spark.implicits._
    val h = handle(tmpDir("tbl")).init(
      addCreated = Some("created_at"), addMonotonicId = Some("mid"))
    h.append(Seq("a", "b", "c").toDF("s")); h.flush()
    h.append(Seq("d").toDF("s")); h.flush()
    // third in-place append: each batch must consume a FRESH sequence —
    // reusing meta.nextSeq minted colliding ids (row numbers restart per
    // batch), which only a 3rd append exposed
    h.append(Seq("e").toDF("s")); h.flush()
    val rows = h.read.orderBy("mid").collect()
    assert(rows.length == 5)
    val mids = rows.map(_.getAs[String]("mid"))
    assert(mids.sorted.sameElements(mids))
    assert(mids.distinct.length == 5)
    // later batches sort strictly after earlier ones
    val batch2 = h.read.where(col("s") === "d").select("mid").head().getString(0)
    val batch3 = h.read.where(col("s") === "e").select("mid").head().getString(0)
    val batch1Max = mids.filter(m => m != batch2 && m != batch3).max
    assert(batch2 > batch1Max && batch3 > batch2)
    assert(rows.forall(_.getAs[java.sql.Timestamp]("created_at") != null))
  }

  test("executeSql: CTAS replaces, INSERT appends, DELETE filters") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")); h.flush()
    h.executeSql("insert into {{ t }} select 4 as id, cast(40.0 as double) as v")
    assert(h.read.count() == 4)
    h.executeSql("delete from {{ t }} where v >= 30.0")
    assert(h.read.orderBy("id").select("id").as[Long].collect().toSeq == Seq(1L, 2L))
    h.executeSql("create table {{ t }} as select id * 100 as id from {{ t }}")
    assert(h.read.orderBy("id").select("id").as[Long].collect().toSeq == Seq(100L, 200L))
  }

  test("executeSql: INSERT ... VALUES fails with a clear unsupported error") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, 10.0)).toDF("id", "v")); h.flush()
    val e = intercept[IllegalArgumentException] {
      h.executeSql("insert into {{ t }} values (5, 50.0)")
    }
    assert(e.getMessage.contains("only supports INSERT INTO ... SELECT"))
    assert(e.getMessage.contains("use append()"))
    assert(h.read.count() == 1) // nothing was written
  }

  test("readSql substitutes the table reference") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq(1L, 2L, 3L).toDF("id")); h.flush()
    val n = h.readSql("select count(*) as n from {{ t }}").head().getLong(0)
    assert(n == 3L)
  }

  test("hash-bucketed upsert rewrites only touched partitions (hardlinks the rest)") {
    import spark.implicits._
    val root = tmpDir("tbl")
    val h = handle(root).init(uniqueOn = Seq("id"), hashBuckets = Some(8))
    h.append((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "s")); h.flush()
    val v1 = h.meta.activeVersion.get
    assert(h.read.columns.contains(TableHandle.BucketCol))
    val bucketsV1 = h.read.select(TableHandle.BucketCol).distinct().count()
    assert(bucketsV1 == 8)

    // upsert exactly one key → exactly one bucket rewritten
    h.upsert(Seq((500L, "UPDATED")).toDF("id", "s")); h.flush()
    val v2 = h.meta.activeVersion.get
    assert(v2 != v1)
    val out = h.read
    assert(out.count() == 1000)
    assert(out.where($"id" === 500L).select("s").head().getString(0) == "UPDATED")
    // untouched buckets are hardlinked: same inode as v1 files
    val v1Dir = java.nio.file.Paths.get(new Catalog(root).versionPath("t", v1))
    val v2Dir = java.nio.file.Paths.get(new Catalog(root).versionPath("t", v2))
    def inodes(d: java.nio.file.Path) = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => (d.relativize(p).getName(0).toString,
          java.nio.file.Files.getAttribute(p, "unix:ino")))
        .toList
    }
    val shared = inodes(v2Dir).toSet intersect inodes(v1Dir).toSet
    assert(shared.size >= 6, s"expected most buckets hardlinked, shared=$shared")

    // reads filtered on the bucket prune partitions (PartitionFilters)
    val plan = out.where(col(TableHandle.BucketCol) === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_gr_bucket"))
  }

  test("date-partitioned table: writes are dir-partitioned, filters prune") {
    import spark.implicits._
    val h = handle(tmpDir("tbl")).init(partitionBy = Seq("day"))
    h.append(Seq((1L, "2020-01-01"), (2L, "2020-01-02"), (3L, "2020-01-02"))
      .toDF("id", "day"))
    h.flush()
    val path = h.catalog.activePath("t").get
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "day=2020-01-01")))
    val plan = h.read.where(col("day") === "2020-01-02")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(h.read.where(col("day") === "2020-01-02").count() == 2)
  }

  test("append with a changed schema widens into a fresh version") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, 10)).toDF("id", "v")); h.flush()      // v int
    val v1 = h.meta.activeVersion.get
    h.append(Seq((2L, 2.5, "x")).toDF("id", "v", "extra")); h.flush() // v double + new col
    assert(h.meta.activeVersion.get != v1) // widen-rewrite → new version
    val df = h.read
    assert(df.schema("v").dataType.typeName == "double")
    assert(df.count() == 2)
    assert(df.where(col("extra").isNull).count() == 1)
  }

  test("second append of an array column keeps the array type (parquet nullability round-trip)") {
    import spark.implicits._
    // parquet reads arrays back with containsNull=true while a fresh
    // frame declares containsNull=false — the schema compare must not
    // see that as a change (it used to widen array<bigint> to STRING,
    // destroying every near-dup index on its second extension)
    val h = handle(tmpDir("tbl"))
    val mk = (id: Long) => Seq((id, Seq(id, id + 1))).toDF("id", "sig")
    h.append(mk(1L)); h.flush()
    val v1 = h.meta.activeVersion.get
    h.append(mk(2L)); h.flush()
    assert(h.meta.activeVersion.get == v1, "no widen-rewrite for a nullability-only delta")
    val df = h.read
    assert(df.schema("sig").dataType.typeName == "array")
    assert(df.count() == 2)
    assert(df.where(col("id") === 2L).select(element_at(col("sig"), 2))
      .head().getLong(0) == 3L)
  }

  test("array columns widen element-wise, not to string") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append(Seq((1L, Seq(1, 2))).toDF("id", "a")); h.flush()         // array<int>
    h.append(Seq((2L, Seq(5L, 6L))).toDF("id", "a")); h.flush()       // array<bigint>
    val t = h.read.schema("a").dataType
    assert(t.simpleString == "array<bigint>", t.simpleString)
    assert(h.read.count() == 2)
  }

  test("chunked record reads (chunksize semantics)") {
    import spark.implicits._
    val h = handle(tmpDir("tbl"))
    h.append((1L to 10L).toDF("id")); h.flush()
    val chunks = h.readChunks(3).toList
    assert(chunks.map(_.size) == List(3, 3, 3, 1))
    assert(chunks.flatten.map(_("id").asInstanceOf[Long]).sorted == (1L to 10L).toList)
  }

  test("upsert above the prune threshold: semi-join path matches OR-chain path") {
    import spark.implicits._
    def build(root: String): TableHandle = {
      val h = handle(root).init(uniqueOn = Seq("id"), partitionBy = Seq("p"))
      h.append(((0 until 400).map(i => (i.toLong, Option(i % 80), s"v$i")) ++
        Seq((1000L, Option.empty[Int], "n0"), (1001L, Option.empty[Int], "n1")))
        .toDF("id", "p", "s"))
      h.flush()
      h
    }
    // 70 touched partitions + the NULL partition, mixed updates/inserts
    val incoming = ((0 until 140).map(i => (i.toLong * 2, Option((i * 2) % 80), s"NEW$i")) ++
      Seq((1001L, Option.empty[Int], "NULLNEW")))
      .toDF("id", "p", "s")
    val saved = TableHandle.PrunePredicateMaxPartitions
    try {
      TableHandle.PrunePredicateMaxPartitions = 1000 // literal OR-chain
      val hOr = build(tmpDir("orchain"))
      hOr.upsert(incoming); hOr.flush()
      TableHandle.PrunePredicateMaxPartitions = 8 // broadcast semi-join
      val hSemi = build(tmpDir("semij"))
      hSemi.upsert(incoming); hSemi.flush()
      val a = hOr.read.orderBy("id").collect().map(_.toString).toSeq
      val b = hSemi.read.orderBy("id").collect().map(_.toString).toSeq
      assert(a == b)
      assert(hOr.recordCount == hSemi.recordCount)
      // derived count formula matches the physical row count
      assert(hSemi.recordCount == hSemi.read.count())
      // null partition on the semi-join path: untouched sibling kept,
      // touched row merged, nothing duplicated or dropped
      val nulls = hSemi.read.filter(col("id") >= 1000L).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("s")).toMap
      assert(nulls == Map(1000L -> "n0", 1001L -> "NULLNEW"))
    } finally TableHandle.PrunePredicateMaxPartitions = saved
  }

  test("upsert touching a null partition value neither duplicates nor drops rows") {
    import spark.implicits._
    val h = handle(tmpDir("nullpart")).init(uniqueOn = Seq("id"), partitionBy = Seq("p"))
    h.append(Seq((1L, Option("a"), "x"), (2L, Option.empty[String], "y"),
      (3L, Option.empty[String], "z"), (4L, Option("b"), "w")).toDF("id", "p", "s"))
    h.flush()
    // touch the null partition (id=2) and the 'a' partition (id=5)
    h.upsert(Seq((2L, Option.empty[String], "Y2"), (5L, Option("a"), "n"))
      .toDF("id", "p", "s"))
    h.flush()
    val rows = h.read.select("id", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // null-partition rows merged (not hardlinked back as duplicates),
    // untouched siblings in the null partition survive
    assert(h.read.count() == 5)
    assert(rows == Map(1L -> "x", 2L -> "Y2", 3L -> "z", 4L -> "w", 5L -> "n"))
    assert(h.recordCount == 5)
  }

  test("init(schemaRef = name) resolves a registered CommonModel schema") {
    CommonModel.registerSchema("doc_meta",
      Seq("doc_id" -> "Integer", "title" -> "Text", "score" -> "Float"))
    val h = handle(tmpDir("named")).init(schemaRef = Some("doc_meta"))
    val df = h.read // no active version → declared schema drives the frame
    assert(df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("doc_id", "long"), ("title", "string"), ("score", "double")))
    // unknown name falls through to DDL parsing, bad DDL fails loudly
    intercept[Exception] {
      handle(tmpDir("named2")).init(schemaRef = Some("no_such_schema")).read
    }
  }

  test("upsert on a composite unique_on key") {
    import spark.implicits._
    val h = handle(tmpDir("composite")).init(uniqueOn = Seq("org", "id"))
    h.append(Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 1L, "z"))
      .toDF("org", "id", "s"))
    h.flush()
    // same id under a different org is an INSERT, same (org, id) updates
    h.upsert(Seq(("b", 2L, "new"), ("a", 1L, "X2")).toDF("org", "id", "s"))
    h.flush()
    val rows = h.read.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(rows == Map(("a", 1L) -> "X2", ("a", 2L) -> "y",
      ("b", 1L) -> "z", ("b", 2L) -> "new"))
  }

  private def parquetFiles(h: TableHandle): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(h.catalog.activePath(h.name).get)
    java.nio.file.Files.walk(p).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
  }

  test("compact bin-packs small append files into a new version, no signal") {
    import spark.implicits._
    var signals = List.empty[String]
    val root = tmpDir("compact")
    val h = new TableHandle(spark, new Catalog(root), "t",
      onSignal = (_, kind) => signals ::= kind)
    (0 until 6).foreach { i =>
      h.append(Seq((i.toLong, s"v$i")).toDF("id", "s")); h.flush()
    }
    val before = h.read.orderBy("id").collect().map(_.toString).toSeq
    assert(parquetFiles(h).size >= 6)
    val v0 = h.meta.activeVersion.get
    signals = Nil
    val v = h.compact()
    assert(v.isDefined && h.meta.activeVersion.get != v0)
    assert(parquetFiles(h).size == 1)
    assert(h.read.orderBy("id").collect().map(_.toString).toSeq == before)
    assert(h.recordCount == 6)
    // physical-only operation: downstream must not re-trigger
    assert(signals.isEmpty)
  }

  test("compact on a partitioned table leaves one file per partition dir") {
    import spark.implicits._
    val h = handle(tmpDir("compactp")).init(partitionBy = Seq("p"))
    (0 until 4).foreach { i =>
      h.append((0 until 10).map(j => (i * 10L + j, j % 3, s"x$i$j")).toDF("id", "p", "s"))
      h.flush()
    }
    h.compact()
    val byDir = parquetFiles(h).groupBy(_.getParent.getFileName.toString)
    assert(byDir.keySet == Set("p=0", "p=1", "p=2"))
    assert(byDir.values.forall(_.size == 1))
    assert(h.read.count() == 40 && h.recordCount == 40)
  }

  test("clusterBy writes range-clustered files with near-disjoint min/max stats") {
    import spark.implicits._
    val h = handle(tmpDir("clustered")).init(clusterBy = Seq("k"))
    // shuffled input: without clustering every file would span ~the full range
    val rows = scala.util.Random.shuffle((0 until 4000).toList)
      .map(i => (i.toLong, s"pay$i"))
    // AQE would coalesce this tiny write to one range partition and
    // make the multi-file assertion vacuous
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try h.replace(rows.toDF("k", "s").repartition(8))
    finally saved match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
    val files = parquetFiles(h)
    assert(files.size > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // ranges must not overlap: each file's min exceeds the previous max
    ranges.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(s2 > e1,
        s"file ranges overlap: $ranges")
      case _ =>
    }
    assert(h.read.count() == 4000)
  }

  test("read-only mode rejects writes") {
    import spark.implicits._
    val root = tmpDir("tbl")
    val h = handle(root)
    h.append(Seq(1L).toDF("id")); h.flush()
    val r = new TableHandle(spark, new Catalog(root), "t", "r")
    intercept[IllegalArgumentException](r.append(Seq(2L).toDF("id")))
  }

  test("vacuum after a hardlinked upsert chain: active intact, non-shared space reclaimed") {
    import spark.implicits._
    // The bucket-pruned upsert HARDLINKS untouched partition files from
    // the previous version into the new one, so after a chain of
    // upserts the active version's files are link-shared with many dead
    // versions. The vacuum contract (Catalog.vacuum scaladoc): deleting
    // every dead version must leave the active version byte-identical
    // readable (inodes survive while the active name links them) AND
    // reclaim all non-shared space.
    val root = tmpDir("vac")
    val cat = new Catalog(root)
    val h = new TableHandle(spark, cat, "t")
      .init(uniqueOn = Seq("id"), hashBuckets = Some(8))
    h.append((0L until 400L).map(i => (i, s"v$i")).toDF("id", "s")); h.flush()
    // 20 single-key upserts: each rewrites ~1 bucket, hardlinks the rest
    (1 to 20).foreach { k =>
      h.upsert(Seq((k.toLong * 17 % 400, s"u$k")).toDF("id", "s")); h.flush()
    }
    val expected = h.read.orderBy("id").collect().map(_.toSeq).toSeq
    val m = h.meta
    val active = m.activeVersion.get
    assert(m.versions.size == 21, s"expected 21 versions, got ${m.versions.size}")
    def parquetFiles(dir: java.nio.file.Path): Set[String] = {
      import scala.jdk.CollectionConverters._
      if (!java.nio.file.Files.exists(dir)) Set.empty
      else java.nio.file.Files.walk(dir).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).filter(_.endsWith(".parquet")).toSet
    }
    val tableDir = java.nio.file.Paths.get(cat.versionPath("t", active)).getParent
    val activeDir = java.nio.file.Paths.get(cat.versionPath("t", active))
    val filesBefore = parquetFiles(tableDir)
    val activeFiles = parquetFiles(activeDir)
    // the chain actually shares files: dead versions hold MORE parquet
    // names than the active one alone
    assert(filesBefore.size > activeFiles.size)
    val dead = cat.vacuum("t")
    assert(dead.size == 20, s"expected 20 dead versions, got ${dead.size}")
    // all non-shared space reclaimed: only the active version's files remain
    assert(parquetFiles(tableDir) == activeFiles)
    // active version still byte-identical readable through the catalog
    assert(h.meta.activeVersion.contains(active))
    assert(h.read.orderBy("id").collect().map(_.toSeq).toSeq == expected)
    assert(h.recordCount == 400)
  }

  test("time travel: a replaced-away version stays readable until vacuum") {
    import spark.implicits._
    val h = handle(tmpDir("tt"))
    h.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")); h.flush()
    val v1 = h.versions.last._1
    h.replace(Seq((9L, "z")).toDF("k", "v")); h.flush()
    assert(h.read.count() == 1)                      // active = replacement
    assert(h.readVersion(v1).count() == 2)           // history intact
    assert(h.versions.map(_._1).contains(v1))
    val e = intercept[IllegalArgumentException](h.readVersion("v99999999"))
    assert(e.getMessage.contains("no retained version"))
  }

  test("interleaved upserts from two handles lose no rows (write-lock contract)") {
    import spark.implicits._
    // VERDICT r13 item 6: two writers race read-merge-commit cycles on
    // the SAME bucketed table. Without Catalog.withWriteLock both read
    // the same base version and the later commit silently DROPS the
    // earlier one's keys — this spec interleaves 8 flush rounds per
    // writer and asserts the union survived, with last-wins per key
    // where a single writer owns the key.
    val root = tmpDir("race")
    val cat = new Catalog(root)
    val a = new TableHandle(spark, cat, "t").init(
      uniqueOn = Seq("k"), hashBuckets = Some(4))
    val b = new TableHandle(spark, cat, "t")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(h: TableHandle, tag: String, keys: Range): Thread = {
      val t = new Thread(() => try {
        for (round <- 1 to 8) {
          h.upsert(keys.map(k => (k.toLong, s"$tag$round")).toDF("k", "v"),
            orderBy = Seq(lit(round)))
          h.flush()
        }
      } catch { case e: Throwable => errs.add(e) })
      t.start(); t
    }
    // disjoint halves + a contested middle: lost updates would drop
    // whole key ranges, not just mis-order the middle
    val ta = writer(a, "a", 0 until 100)
    val tb = writer(b, "b", 50 until 150)
    ta.join(); tb.join()
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val rows = a.read.select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == 150, s"lost update: ${150 - rows.size} keys missing")
    // single-owner keys end at their owner's LAST round
    (0 until 50).foreach(k => assert(rows(k.toLong) == "a8", s"k=$k ${rows(k.toLong)}"))
    (100 until 150).foreach(k => assert(rows(k.toLong) == "b8", s"k=$k ${rows(k.toLong)}"))
    // contested keys hold SOME complete round-8 write (serialized
    // cycles; which writer committed last is scheduling-dependent)
    (50 until 100).foreach(k =>
      assert(rows(k.toLong) == "a8" || rows(k.toLong) == "b8",
        s"contested k=$k ended at ${rows(k.toLong)}"))
  }

  test("crash mid-write: partial version never referenced; vacuum reclaims it") {
    import spark.implicits._
    // VERDICT r13 item 6: a writer that dies AFTER allocating a version
    // and writing part-files but BEFORE the setActive commit must leave
    // the table serving the old version byte-identically, and vacuum
    // must reclaim the orphan directory.
    val root = tmpDir("crash")
    val cat = new Catalog(root)
    val h = handle(root)
    h.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v")); h.flush()
    val activeBefore = h.meta.activeVersion.get
    // simulate the crash window: version allocated, data partially
    // written, no setActive (the commit is the ONLY step that changes
    // what readers see)
    val orphan = cat.newVersion("t")
    Seq((99L, "GHOST")).toDF("k", "v")
      .write.parquet(cat.versionPath("t", orphan))
    // readers: untouched — the pointer still names the old version
    assert(h.meta.activeVersion.contains(activeBefore))
    assert(h.read.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    // the orphan is visible in the version list (auditable), inactive
    assert(h.versions.map(_._1).contains(orphan))
    // vacuum reclaims exactly the orphan; active stays readable
    val dead = cat.vacuum("t")
    assert(dead == Seq(orphan))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.versionPath("t", orphan))))
    assert(h.read.count() == 2)
  }
}
