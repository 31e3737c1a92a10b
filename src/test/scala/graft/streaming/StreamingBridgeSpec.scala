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
