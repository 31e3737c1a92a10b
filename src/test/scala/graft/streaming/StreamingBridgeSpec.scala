package graft.streaming

import graft.SparkSpec
import graft.core.{Catalog, TableHandle}
import org.apache.spark.sql.functions._

class StreamingBridgeSpec extends SparkSpec {

  test("windowed streaming agg over a stored table matches the batch result") {
    val root = tmpDir("stream-bridge")
    val cat = new Catalog(root)
    val events = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val src = new TableHandle(spark, cat, "events_src")
    src.append(events); src.flush()

    val streamed = StreamingBridge.windowedCounts(
      StreamingBridge.readStream(spark, cat, "events_src"),
      tsCol = "ts", keyCol = "event_type", windowLen = "1 hour", watermark = "2 hours")
    val n = StreamingBridge.drainTo(spark, cat, streamed, "windowed", root)
    assert(n > 0)

    val streamedOut = new TableHandle(spark, cat, "windowed").read
    // append mode only emits FINALIZED windows: those whose end the
    // watermark (maxTs - 2h) has passed; the tail windows stay in state
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .filter(col("window.end") <= lit(maxTs) - expr("interval 2 hours"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
    assert(streamedOut.count() == batch.count())
    assert(streamedOut.exceptAll(batch.select(streamedOut.columns.map(col): _*)).count() == 0)
  }

  test("stateful sessionize (flatMapGroupsWithState) emits exactly the batch sessions it can close") {
    import org.apache.spark.sql.expressions.Window
    val root = tmpDir("stream-sess")
    val cat = new Catalog(root)
    val events = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val src = new TableHandle(spark, cat, "events_src")
    src.append(events); src.flush()

    val sessions = StreamingBridge.sessionize(
      StreamingBridge.readStream(spark, cat, "events_src"),
      tsCol = "ts", userCol = "user_id", gapMinutes = 30)
    StreamingBridge.drainTo(spark, cat, sessions.toDF(), "sessions", root)
    val got = new TableHandle(spark, cat, "sessions").read
      .select("user_id", "session_start", "session_end", "n_events")

    // batch oracle: q16b-shape gap sessionization
    val w = Window.partitionBy("u").orderBy("ts")
    val batch = events
      .select(col("user_id").cast("long").as("u"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts").cast("double") - col("prev").cast("double") > 1800.0, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(w))
      .groupBy("u", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
    val all = batch.select(col("u").as("user_id"),
      col("session_start"), col("session_end"), col("n_events"))
    // sessions the stream could NOT have closed yet: each user's last
    // (no later event forces the gap; emission then depends on the
    // event-time timeout firing before AvailableNow terminates)
    val lastSid = batch.groupBy("u").agg(max("sid").as("sid"))
    val closable = batch.join(lastSid, Seq("u", "sid"), "left_anti")
      .select(col("u").as("user_id"),
        col("session_start"), col("session_end"), col("n_events"))

    assert(closable.count() > 0)
    // everything emitted is a true batch session...
    assert(got.exceptAll(all.select(got.columns.map(col): _*)).count() == 0)
    // ...and every in-batch-closable session was emitted
    assert(closable.select(got.columns.map(col): _*).exceptAll(got).count() == 0)
  }

  test("sessionize state merges sessions across micro-batches (no fragments)") {
    import org.apache.spark.sql.expressions.Window
    val dataDir = tmpDir("sess-batches")
    val events = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "user_id")
    // split point chosen INSIDE a real multi-event session (its start
    // timestamp): that session's first event lands in file 1, the rest
    // in file 2 - guaranteeing the cross-batch state merge is exercised
    val wPick = Window.partitionBy("u").orderBy("ts")
    val median = events
      .select(col("user_id").cast("long").as("u"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(wPick))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts").cast("double") - col("prev").cast("double") > 1800.0, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(wPick))
      .groupBy("u", "sid")
      .agg(min("ts").cast("double").as("s"), max("ts").cast("double").as("e"),
        count(lit(1)).as("n"))
      .filter(col("e") > col("s"))
      .orderBy(col("n").desc, col("u"))
      .select("s").head().getDouble(0)
    val first = events.filter(col("ts").cast("double") <= median)
    val second = events.filter(col("ts").cast("double") > median)
    first.coalesce(1).write.parquet(s"$dataDir/p1")
    Thread.sleep(1100) // distinct modification times → deterministic order
    second.coalesce(1).write.parquet(s"$dataDir/p2")
    val schema = first.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dataDir/p*")
    val root = tmpDir("sess-batches-out")
    val cat = new Catalog(root)
    val sessions = StreamingBridge.sessionize(stream, "ts", "user_id", gapMinutes = 30)
    StreamingBridge.drainTo(spark, cat, sessions.toDF(), "sessions", root)
    val got = new TableHandle(spark, cat, "sessions").read
      .select("user_id", "session_start", "session_end", "n_events")

    val w = Window.partitionBy("u").orderBy("ts")
    val batch = events
      .select(col("user_id").cast("long").as("u"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts").cast("double") - col("prev").cast("double") > 1800.0, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(w))
      .groupBy("u", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
    val all = batch.select(col("u").as("user_id"),
      col("session_start"), col("session_end"), col("n_events"))
    // a session whose events straddle the file split exercises the
    // cross-batch state merge — make sure the scenario is real
    val spanning = batch.filter(
      col("session_start").cast("double") <= median &&
        col("session_end").cast("double") > median)
    assert(spanning.count() > 0, "fixture produced no boundary-spanning session")
    // every emitted row is a COMPLETE true session — a fragment split
    // at the batch boundary would not match any oracle row
    assert(got.count() > 0)
    assert(got.exceptAll(all.select(got.columns.map(col): _*)).count() == 0)
  }

  test("mergeIntervals: out-of-order and late events keep session bounds honest") {
    val gap = 100L
    // late event within gap BEFORE the open session extends it backwards
    assert(StreamingBridge.mergeIntervals(Some((1000L, 1100L, 2L)), Array(950L), gap) ==
      (Nil, Some((950L, 1100L, 3L))))
    // late event far before the open session closes as its own session
    assert(StreamingBridge.mergeIntervals(Some((1000L, 1100L, 2L)), Array(500L), gap) ==
      (List((500L, 500L, 1L)), Some((1000L, 1100L, 2L))))
    // in-order growth and a gap split
    assert(StreamingBridge.mergeIntervals(None, Array(1L, 50L, 300L), gap) ==
      (List((1L, 50L, 2L)), Some((300L, 300L, 1L))))
    // event inside the open interval only bumps the count
    assert(StreamingBridge.mergeIntervals(Some((100L, 400L, 3L)), Array(250L), gap) ==
      (Nil, Some((100L, 400L, 4L))))
    // chains merge left-to-right; a too-wide gap still splits
    assert(StreamingBridge.mergeIntervals(Some((500L, 600L, 2L)), Array(450L, 200L, 150L), gap) ==
      (List((150L, 200L, 2L)), Some((450L, 600L, 3L))))
    // empty batch with no state
    assert(StreamingBridge.mergeIntervals(None, Array.empty, gap) == (Nil, None))
  }

  test("cron trigger parsing and next-fire computation") {
    import java.time.LocalDateTime
    val c = graft.graph.Cron("1 * * * *")
    assert(c.matches(LocalDateTime.of(2026, 1, 1, 10, 1)))
    assert(!c.matches(LocalDateTime.of(2026, 1, 1, 10, 2)))
    assert(c.nextAfter(LocalDateTime.of(2026, 1, 1, 10, 1)) ==
      LocalDateTime.of(2026, 1, 1, 11, 1))
    val step = graft.graph.Cron("*/15 9-17 * * 1-5")
    assert(step.matches(LocalDateTime.of(2026, 1, 2, 9, 30)))  // Friday
    assert(!step.matches(LocalDateTime.of(2026, 1, 3, 9, 30))) // Saturday
    assert(!step.matches(LocalDateTime.of(2026, 1, 2, 8, 30)))
    intercept[IllegalArgumentException](graft.graph.Cron("* * *"))
  }
}
