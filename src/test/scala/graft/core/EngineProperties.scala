package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._

/** Property-based suites (SURVEY.md §5.2): upsert idempotence/last-wins,
  * version isolation, stream exactly-once under random
  * checkpoint/rollback interleavings, monotonic-id ordering.
  * ScalaCheck runs these through sbt's scalacheck framework.
  */
object EngineProperties extends Properties("graft.core") {

  // each trial runs real Spark jobs — 10 random cases per property keeps
  // the suite under a minute while still exploring the space
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  private def freshTable(): (TableHandle, String) = {
    val root = java.nio.file.Files.createTempDirectory("prop").toString
    (new TableHandle(spark, new Catalog(root), "t"), root)
  }

  private val kvBatch: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 1000L)))

  property("upsert idempotence: applying the same batch twice == once") =
    forAll(kvBatch) { batch =>
      import spark.implicits._
      val (h, _) = freshTable()
      h.init(uniqueOn = Seq("k"))
      val df = batch.toDF("k", "v")
      h.upsert(df); h.flush()
      val once = h.read.orderBy("k").collect().map(_.toSeq).toList
      h.upsert(df); h.flush()
      val twice = h.read.orderBy("k").collect().map(_.toSeq).toList
      once == twice && once.map(_.head).distinct.size == once.size
    }

  property("upsert merges: result keys = old keys ∪ new keys") =
    forAll(kvBatch, kvBatch) { (a, b) =>
      import spark.implicits._
      val (h, _) = freshTable()
      h.init(uniqueOn = Seq("k"))
      h.upsert(a.toDF("k", "v")); h.flush()
      h.upsert(b.toDF("k", "v")); h.flush()
      val keys = h.read.select("k").collect().map(_.getLong(0)).toSet
      keys == (a.map(_._1) ++ b.map(_._1)).toSet
    }

  property("upsert orderBy tie-break: same winner under arbitrary repartitioning") =
    forAll(kvBatch, Gen.chooseNum(1, 16)) { (rows0, nPart) =>
      import spark.implicits._
      // unique seq per row: "greatest orderBy tuple wins" names one row
      val rows = rows0.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
      val (h, _) = freshTable()
      h.init(uniqueOn = Seq("k"))
      h.upsert(rows.toDF("k", "seq", "v").repartition(nPart), orderBy = Seq(col("seq")))
      h.flush()
      val got = h.read.select("k", "seq").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max }
      got == expected
    }

  property("append+reset+append: versions are isolated") =
    forAll(Gen.chooseNum(1, 20), Gen.chooseNum(1, 20)) { (n1, n2) =>
      import spark.implicits._
      val (h, _) = freshTable()
      h.append((1 to n1).map(_.toLong).toDF("v")); h.flush()
      val v1 = h.meta.activeVersion.get
      h.reset()
      h.append((1 to n2).map(i => -i.toLong).toDF("v")); h.flush()
      val v2 = h.meta.activeVersion.get
      v1 != v2 && h.read.count() == n2 &&
        spark.read.parquet(h.catalog.versionPath("t", v1)).count() == n1
    }

  property("connected components equal union-find on random edge lists") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))) { edges0 =>
      import spark.implicits._
      val edges = edges0.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val expected = graft.TestOracles.unionFind(edges)
        val got = graft.operators.ConnectedComponents
          .run(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected
      }
    }

  // ---- model-based table semantics ------------------------------------
  // random append/upsert/replace/truncate/compact sequences against a
  // driver-side reference: catches operation-interaction bugs no
  // single-op spec can (e.g. the r4 append-after-append seq collision)
  private sealed trait TOp
  private case class OpAppend(rows: List[(Long, Long)]) extends TOp
  private case class OpUpsert(rows: List[(Long, Long)]) extends TOp
  private case class OpReplace(rows: List[(Long, Long)]) extends TOp
  private case object OpTruncate extends TOp
  private case object OpCompact extends TOp

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 99L)))
  private val opGen: Gen[TOp] = Gen.frequency(
    3 -> rowsGen.map(OpAppend), 4 -> rowsGen.map(OpUpsert),
    1 -> rowsGen.map(OpReplace), 1 -> Gen.const(OpTruncate),
    2 -> Gen.const(OpCompact))

  property("table model: op sequences match a reference interpreter") =
    forAll(Gen.listOfN(6, opGen)) { ops =>
      import spark.implicits._
      val (h, _) = freshTable()
      h.init(uniqueOn = Seq("k"))
      // reference rows carry (k, seq, v); seq is globally unique so the
      // upsert orderBy winner is well-defined
      var model = Vector.empty[(Long, Long, Long)]
      var seq = 0L
      def stamp(rows: List[(Long, Long)]): List[(Long, Long, Long)] =
        rows.map { case (k, v) => seq += 1; (k, seq, v) }
      ops.foreach {
        case OpAppend(rows) =>
          val b = stamp(rows)
          h.append(b.toDF("k", "seq", "v")); h.flush()
          model = model ++ b
        case OpUpsert(rows) =>
          val b = stamp(rows)
          h.upsert(b.toDF("k", "seq", "v"), orderBy = Seq(col("seq"))); h.flush()
          // last (greatest seq) wins within the batch; existing rows of
          // a matched key take the winner's values IN PLACE (full-outer
          // merge preserves duplicate-row multiplicity), new keys append
          val winners = b.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
          model = model.map { case r @ (k, _, _) => winners.getOrElse(k, r) } ++
            winners.collect {
              case (k, w) if !model.exists(_._1 == k) => w
            }
        case OpReplace(rows) =>
          val b = stamp(rows)
          h.replace(b.toDF("k", "seq", "v"))
          model = b.toVector
        case OpTruncate =>
          h.truncate()
          model = Vector.empty
        case OpCompact =>
          h.compact(Long.MaxValue) // bin-pack everything into one file
      }
      val got = h.read.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toVector
      got == model.sorted && h.recordCount == got.size
    }

  private val consumeOps: Gen[List[Int]] = // 0=consume one, 1=checkpoint, 2=rollback
    Gen.listOfN(12, Gen.chooseNum(0, 2))

  property("stream: consumed set after any checkpoint/rollback dance is a prefix, " +
    "and checkpointed progress is never lost") =
    forAll(consumeOps) { ops =>
      import spark.implicits._
      val (h, root) = freshTable()
      h.init(strictlyMonotonicOrdering = Some("id"))
      h.append((1L to 10L).toDF("id")); h.flush()
      val state = new State(root, "n")
      var cursor = new StreamCursor(h, state, "id")
      var lastCheckpoint = 0L
      var position = 0L
      ops.foreach {
        case 0 =>
          val it = cursor.records()
          if (it.hasNext) { position = it.next()("id").asInstanceOf[Long] }
        case 1 => cursor.checkpoint(); lastCheckpoint = position
        case 2 => cursor.rollback(); position = lastCheckpoint
      }
      // a fresh execution resumes exactly from the last checkpoint
      val resumed = new StreamCursor(h, new State(root, "n"), "id")
        .records().map(_("id").asInstanceOf[Long]).toList
      resumed == ((lastCheckpoint + 1) to 10L).toList
    }

  property("base32 preserves order for arbitrary non-negative longs") =
    forAll(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(0L, Long.MaxValue)) {
      (a, b) =>
        val (ea, eb) = (graft.functions.Base32Fixed.encode(a),
          graft.functions.Base32Fixed.encode(b))
        (ea.compareTo(eb).sign == a.compareTo(b).sign) :| s"$a->$ea $b->$eb"
    }

  property("record schema inference widens and never loses keys") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf[Any](
      Gen.chooseNum(-100L, 100L), Gen.chooseNum(-1.0, 1.0), Gen.alphaStr))) { vs =>
      val records = vs.zipWithIndex.map { case (v, i) => Map("id" -> i.toLong, "v" -> v) }
      val df = TableHandle.inferRecords(spark, records, None)
      df.count() == records.size && df.columns.toSet == Set("id", "v")
    }
}
