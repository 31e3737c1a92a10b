package graft.core

import graft.SparkSpec

class StreamCursorSpec extends SparkSpec {

  private def fixture(): (TableHandle, State, String) = {
    import spark.implicits._
    val root = tmpDir("stream")
    val h = new TableHandle(spark, new Catalog(root), "t")
      .init(strictlyMonotonicOrdering = Some("id"))
    h.append(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "s"))
    h.flush()
    (h, new State(root, "node1"), root)
  }

  test("exactly-once across executions: consume, checkpoint, resume") {
    val (h, state, root) = fixture()
    val s1 = StreamCursor.forTable(h, state)
    val got = s1.records().take(3).map(_("id")).toList
    assert(got == List(1L, 2L, 3L))
    s1.checkpoint()
    // "new execution": fresh cursor over same state
    val s2 = StreamCursor.forTable(h, new State(root, "node1"))
    assert(s2.records().map(_("id")).toList == List(4L, 5L))
  }

  test("yield marks consumed, but without checkpoint progress is lost") {
    val (h, state, root) = fixture()
    val s1 = StreamCursor.forTable(h, state)
    s1.records().take(2).foreach(_ => ())
    // no checkpoint → a new execution starts from scratch
    val s2 = StreamCursor.forTable(h, new State(root, "node1"))
    assert(s2.records().size == 5)
  }

  test("rollback restores last checkpoint") {
    val (h, state, _) = fixture()
    val s = StreamCursor.forTable(h, state)
    s.records().take(2).foreach(_ => ())
    s.checkpoint()
    s.records().take(2).foreach(_ => ())   // now at 4
    s.rollback()                            // back to 2
    assert(s.records().map(_("id")).toList == List(3L, 4L, 5L))
  }

  test("seek is exclusive (strictly greater), rewind restarts") {
    val (h, state, _) = fixture()
    val s = StreamCursor.forTable(h, state)
    s.seek(3L)
    assert(s.records().map(_("id")).toList == List(4L, 5L))
    s.rewind()
    assert(s.records().size == 5)
  }

  test("multiple concurrent streams with different orderings") {
    import spark.implicits._
    val root = tmpDir("stream")
    val h = new TableHandle(spark, new Catalog(root), "t")
    h.append(Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("id", "prio"))
    h.flush()
    val state = new State(root, "node1")
    val byId = new StreamCursor(h, state, "id")
    val byPrio = new StreamCursor(h, state, "prio")
    byId.records().take(2).foreach(_ => ()); byId.checkpoint()
    byPrio.records().take(1).foreach(_ => ()); byPrio.checkpoint()
    // independent offsets per ordering (node.py:196-198)
    assert(new StreamCursor(h, state, "id").records().map(_("id")).toList == List(3L))
    assert(new StreamCursor(h, state, "prio").records().map(_("prio")).toList == List(20L, 30L))
  }

  test("stream sees rows appended after the cursor was created") {
    import spark.implicits._
    val (h, state, _) = fixture()
    val s = StreamCursor.forTable(h, state)
    s.records().foreach(_ => ())
    s.checkpoint()
    h.append(Seq((6L, "f")).toDF("id", "s")); h.flush()
    assert(s.records().map(_("id")).toList == List(6L))
  }

  test("default ordering errors without a role") {
    import spark.implicits._
    val root = tmpDir("stream")
    val h = new TableHandle(spark, new Catalog(root), "t")
    h.append(Seq(1L).toDF("id")); h.flush()
    intercept[IllegalArgumentException](
      StreamCursor.forTable(h, new State(root, "n")))
  }

  test("non-atomic ordering column rejected (offsets round-trip as strings)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("stream")
    val h = new TableHandle(spark, new Catalog(root), "t")
    h.append(Seq((1L, "a")).toDF("id", "s")
      .withColumn("blob", encode(col("s"), "UTF-8"))
      .withColumn("arr", array(col("id"))))
    h.flush()
    val eBin = intercept[IllegalArgumentException](
      StreamCursor.forTable(h, new State(root, "n"), orderBy = Some("blob")))
    assert(eBin.getMessage.contains("unsupported type binary"))
    val eArr = intercept[IllegalArgumentException](
      StreamCursor.forTable(h, new State(root, "n"), orderBy = Some("arr")))
    assert(eArr.getMessage.contains("unsupported type"))
    // atomic columns still fine
    StreamCursor.forTable(h, new State(root, "n"), orderBy = Some("id"))
  }
}
