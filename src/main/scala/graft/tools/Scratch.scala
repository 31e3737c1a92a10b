package graft.tools

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import org.apache.spark.sql.SparkSession
import graft.graph._

/** Ad-hoc probe; not part of the engine. Drives the Scheduler through
  * the public API with a chunked cron job.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("sched-demo").toString
    Files.writeString(Paths.get(dir, "consume.sql"),
      "select count(*) as n from {{ src }}")
    Files.writeString(Paths.get(dir, "graph.yml"),
      """functions:
        |  - node_file: chunker.scala
        |    id: chunker01
        |    trigger: 0 * * * *
        |    outputs: {out: src}
        |  - node_file: consume.sql
        |    id: consume01
        |    inputs: {src: src}
        |    outputs: {out: counts}
        |stores:
        |  - table: src
        |  - table: counts
        |""".stripMargin)
    val chunker = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val done = ctx.state.getOrElse("batches", 0L).asInstanceOf[Long]
        val out = ctx.table("out")
        out.appendRecords(Seq(Map("batch" -> done)))
        out.flush()
        ctx.state.set("batches", done + 1)
        if (done + 1 < 3) ctx.state.requestNewRun(waitAtleastSeconds = 60)
      }
    }
    val runner = new GraphRunner(spark, GraphManifest.load(dir),
      Files.createTempDirectory("sched-wh").toString,
      codeNodes = Map("chunker.scala" -> chunker))
    val sched = new Scheduler(runner)
    for (minute <- Seq(0, 1, 2, 3, 4, 59)) {
      val t = LocalDateTime.of(2026, 1, 1, 9, 0).plusMinutes(minute)
      val ran = sched.tick(t)
      println(s"[probe] tick 09:${"%02d".format(minute)} ran=$ran " +
        s"srcRows=${runner.tableHandle("src").read.count()} " +
        s"followUps=${sched.pendingFollowUps.keys.toList}")
    }
    // probe: tick far in the future when nothing is pending
    println("[probe] idle tick: " + sched.tick(LocalDateTime.of(2026, 1, 1, 10, 30)))
    spark.stop()
  }
}
