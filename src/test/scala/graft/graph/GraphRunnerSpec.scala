package graft.graph

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.core.StreamCursor
import org.apache.spark.sql.functions._

class GraphRunnerSpec extends SparkSpec {

  private def write(dir: String, name: String, text: String): Unit =
    Files.writeString(Paths.get(dir, name), text)

  test("manifest parse covers the full graph.yml vocabulary (FIXTURES.md B1)") {
    val dir = tmpDir("graph")
    val m = GraphManifest.parse(
      """title: graph
        |functions:
        |  - webhook: hook
        |  - node_file: node.sql
        |    trigger: 1 * * * *
        |    inputs:
        |      node_in: hook
        |    outputs:
        |      node_out: my_table
        |    parameters:
        |      limit: 2
        |    title: my node
        |    id: ab234567
        |  - uses: org/component@v1
        |    inputs: {node_in: hook}
        |    outputs: {node_out: my_table}
        |stores:
        |  - table: my_table
        |    schema: sc
        |  - stream: s
        |""".stripMargin, Paths.get(dir))
    assert(m.functions.size == 3)
    assert(m.functions(0).kind == "webhook")
    val n = m.functions(1)
    assert(n.kind == "sql" && n.id.contains("ab234567") &&
      n.trigger.contains("1 * * * *") &&
      n.inputs == Map("node_in" -> "hook") &&
      n.outputs == Map("node_out" -> "my_table") &&
      n.parameters == Map("limit" -> 2))
    assert(m.functions(2).kind == "component")
    assert(m.stores == List(StoreDef("my_table", "table", Some("sc")),
      StoreDef("s", "stream", None)))
  }

  test("compile validation mirrors platform errors (upload.py:76-85)") {
    val dir = tmpDir("graph")
    write(dir, "q.sql", "select 1")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: q.sql
        |    inputs: {in: nosuchstore}
        |    outputs: {out: t}
        |    parameters: {p: MISSING}
        |stores:
        |  - table: t
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    val errors = runner.validate()
    assert(errors.exists(_.contains("unknown store 'nosuchstore'")))
    assert(errors.exists(_.contains("Parameter p has no default or value")))
  }

  test("typed parameters + connections validate at compile (node.py:513-542)") {
    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: typed.scala
        |    id: typednode
        |    outputs: {out: t}
        |    parameters:
        |      started_at: not-a-datetime
        |      max_rows: "50"
        |      db: proddb
        |stores:
        |  - table: t
        |""".stripMargin)
    val impl = new CodeNode {
      override def params: Seq[ParamSpec] = Seq(
        ParamSpec("started_at", "datetime"),
        ParamSpec("max_rows", "int"),
        ParamSpec("db", "connection"),
        ParamSpec("api", "connection"),
        ParamSpec("threshold", "float"), // required, unbound
        ParamSpec("mode", "str", default = "full")) // defaulted, unbound: ok
      override def run(ctx: NodeContext): Unit = ()
    }
    val bad = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("typed.scala" -> impl))
    val errors = bad.validate()
    assert(errors.exists(e => e.contains("'started_at' expected datetime")))
    assert(errors.exists(e => e.contains("'max_rows' expected int")))
    assert(errors.exists(_.contains("connection 'proddb' is not bound")))
    assert(errors.exists(_.contains("connection 'api' is not bound")))
    assert(errors.exists(_.contains("Parameter threshold has no default or value")))
    assert(!errors.exists(_.contains("mode")), s"defaulted param must not error: $errors")

    // same manifest with well-typed bindings and registered bundles compiles
    write(dir, "graph.yml",
      """functions:
        |  - node_file: typed.scala
        |    id: typednode
        |    outputs: {out: t}
        |    parameters:
        |      started_at: 2026-08-13 10:00:00
        |      max_rows: 50
        |      db: proddb
        |      threshold: 0.5
        |stores:
        |  - table: t
        |""".stripMargin)
    val good = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("typed.scala" -> impl),
      connections = Map(
        "proddb" -> Map("host" -> "db.internal", "user" -> "svc"),
        "api" -> Map("token" -> "tok")))
    assert(good.validate().isEmpty, good.validate().mkString("; "))
    // NodeContext surfaces the bundle and the declared default
    val node = good.flatNodes.head._2
    val ctx = new NodeContext(spark, "typednode", good, node)
    assert(ctx.connection("db") == Map("host" -> "db.internal", "user" -> "svc"))
    assert(ctx.connection("api") == Map("token" -> "tok")) // unbound → own name
    assert(ctx.parameter[String]("mode") == "full")        // spec default
    assert(ctx.parameter[Int]("max_rows") == 50)
  }

  test("describe renders node titles, description files, and wiring; duplicates are compile errors") {
    val dir = tmpDir("graph")
    write(dir, "agg.sql", "select 1 as one")
    write(dir, "about_agg.md", "Aggregates the daily totals.\nMore detail here.")
    write(dir, "graph.yml",
      """title: my pipeline
        |functions:
        |  - node_file: agg.sql
        |    id: aggnode01
        |    title: daily totals
        |    description_file: about_agg.md
        |    trigger: 0 3 * * *
        |    inputs: {in: raw}
        |    outputs: {out: agg}
        |stores:
        |  - table: raw
        |  - table: agg
        |""".stripMargin)
    val m = GraphManifest.load(dir)
    assert(m.functions.head.descriptionFile.contains("about_agg.md"))
    val d = m.describe
    assert(d.contains("graph: my pipeline"))
    assert(d.contains("title: daily totals"))
    assert(d.contains("Aggregates the daily totals."))   // first line only
    assert(!d.contains("More detail here."))
    assert(d.contains("trigger: 0 3 * * *"))
    assert(d.contains("in<-raw") && d.contains("out->agg"))
    assert(d.contains("- table raw"))

    // duplicate node_file / id rejected like the reference's editor
    write(dir, "graph.yml",
      """functions:
        |  - node_file: agg.sql
        |    id: aggnode01
        |    outputs: {out: agg}
        |  - node_file: agg.sql
        |    id: aggnode01
        |    outputs: {out: agg2}
        |stores:
        |  - table: agg
        |  - table: agg2
        |""".stripMargin)
    val errors = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh")).validate()
    assert(errors.exists(_.contains("node_file 'agg.sql' already defined in the graph configuration")))
    assert(errors.exists(_.contains("id 'aggnode01' already defined in the graph configuration")))
    assert(errors.exists(_.contains("node id 'aggnode01' is ambiguous after expansion")))
  }

  test("compile validation detects store-mediated cycles") {
    val dir = tmpDir("graph")
    write(dir, "a.sql", "select 1 as one from {{ tb }}")
    write(dir, "b.sql", "select 1 as one from {{ ta }}")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: a.sql
        |    id: nodea0001
        |    inputs: {tb: tb}
        |    outputs: {out: ta}
        |  - node_file: b.sql
        |    id: nodeb0001
        |    inputs: {ta: ta}
        |    outputs: {out: tb}
        |stores:
        |  - table: ta
        |  - table: tb
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    assert(runner.validate().exists(_.contains("cycle")))
  }

  test("end-to-end SQL pipeline: the SURVEY §7.2 minimum slice") {
    val dir = tmpDir("graph")
    write(dir, "agg.sql",
      """select l_returnflag, l_linestatus,
        |  sum(l_quantity) as qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) as rev,
        |  count(*) as cnt
        |from {{ lineitem }}
        |where l_quantity <= {{ max_qty }}
        |group by 1, 2 order by 1, 2""".stripMargin)
    write(dir, "graph.yml",
      """title: slice
        |functions:
        |  - node_file: agg.sql
        |    id: aggnode01
        |    inputs: {lineitem: lineitem_raw}
        |    outputs: {out: lineitem_agg}
        |    parameters: {max_qty: 50}
        |stores:
        |  - table: lineitem_raw
        |  - table: lineitem_agg
        |""".stripMargin)
    val wh = tmpDir("wh")
    val runner = new GraphRunner(spark, GraphManifest.load(dir), wh)
    // seed the input store from the fixture
    val seed = runner.tableHandle("lineitem_raw")
    seed.append(graft.Fixtures.table(spark, "/root/testdata/sf0.001", "lineitem"))
    seed.flush()
    runner.run()
    val out = runner.tableHandle("lineitem_agg").read
    val direct = graft.Fixtures.table(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("qty"),
        round(sum(expr("l_extendedprice * (1 - l_discount)")), 2).as("rev"),
        count(lit(1)).as("cnt"))
    assert(out.count() == direct.count())
    assert(out.exceptAll(direct.select(out.columns.map(col): _*)).count() == 0)
    assert(runner.signals.nonEmpty)
  }

  test("code node + stream cursor + upsert chain (FIXTURES.md B3 shape)") {
    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: enrich.scala
        |    id: enrich01
        |    inputs: {events: events}
        |    outputs: {out: enriched}
        |stores:
        |  - table: events
        |  - table: enriched
        |""".stripMargin)
    val wh = tmpDir("wh")
    val enrich = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out").init(uniqueOn = Seq("event_id"))
        val stream = ctx.stream("events", orderBy = Some("event_id"))
        out.upsert(stream.df().withColumn("flag", lit(1)))
        out.flush()
        stream.seek(stream.df().agg(max("event_id")).head().get(0) match {
          case null => 0L
          case v => v
        })
        stream.checkpoint()
      }
    }
    val runner = new GraphRunner(spark, GraphManifest.load(dir),
      wh, codeNodes = Map("enrich.scala" -> enrich))
    import spark.implicits._
    val seed = runner.tableHandle("events")
      .init(strictlyMonotonicOrdering = Some("event_id"))
    seed.append(Seq((1L, "a"), (2L, "b")).toDF("event_id", "etype")); seed.flush()
    runner.run()
    assert(runner.tableHandle("enriched").read.count() == 2)
    // incremental: append more events, re-run, no duplicates + only new consumed
    seed.append(Seq((3L, "c")).toDF("event_id", "etype")); seed.flush()
    runner.run()
    val enriched = runner.tableHandle("enriched").read
    assert(enriched.count() == 3)
    assert(enriched.select("event_id").distinct().count() == 3)
  }

  test("subgraph expansion with exposed ports (FIXTURES.md B2)") {
    val dir = tmpDir("graph")
    Files.createDirectories(Paths.get(dir, "sub"))
    write(dir, "sub/inner.sql", "select 1 as one")
    write(dir, "sub/graph.yml",
      """exposes:
        |  outputs:
        |    - output
        |functions:
        |  - node_file: inner.sql
        |    id: inner001
        |    outputs: {out: output}
        |stores:
        |  - table: output
        |""".stripMargin)
    write(dir, "graph.yml",
      """functions:
        |  - node_file: sub/graph.yml
        |    id: subnode01
        |stores:
        |  - table: output
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    assert(runner.flatNodes.map(_._1) == List("subnode01/inner001"))
    runner.run()
    assert(runner.tableHandle("output").read.count() == 1)
  }

  test("webhook ingest appends to same-name store and triggers downstream") {
    val dir = tmpDir("graph")
    write(dir, "consume.sql", "select count(*) as n from {{ hook }}")
    write(dir, "graph.yml",
      """functions:
        |  - webhook: hook
        |  - node_file: consume.sql
        |    id: consume01
        |    inputs: {hook: hook}
        |    outputs: {out: counts}
        |stores:
        |  - table: counts
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    val drop = tmpDir("hook")
    Files.writeString(Paths.get(drop, "batch1.json"),
      """{"patterns_request_key":"r1","payload":7}
        |{"patterns_request_key":"r2","payload":8}
        |""".stripMargin)
    runner.ingestWebhook("hook", drop)
    runner.run()
    assert(runner.tableHandle("counts").read.head().getLong(0) == 2L)
    // respond_to_request: payload row keyed by patterns_request_key
    runner.respondToRequest("hook", "r1", Map("status" -> "ok", "n" -> 2L))
    val resp = runner.tableHandle("hook_responses").read
    assert(resp.count() == 1)
    assert(resp.head().getAs[String]("patterns_request_key") == "r1")
  }

  test("component resolution from a local registry (uses: org/component@v1)") {
    val reg = tmpDir("registry")
    Files.createDirectories(Paths.get(reg, "acme", "wordcount", "v1"))
    Files.writeString(Paths.get(reg, "acme", "wordcount", "v1", "count.sql"),
      "select count(*) as n from {{ input }}")
    Files.writeString(Paths.get(reg, "acme", "wordcount", "v1", "graph.yml"),
      """functions:
        |  - node_file: count.sql
        |    id: count001
        |    inputs: {input: src}
        |    outputs: {out: result}
        |stores:
        |  - table: src
        |  - table: result
        |""".stripMargin)
    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - uses: acme/wordcount@v1
        |    id: comp00001
        |stores:
        |  - table: src
        |  - table: result
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      componentResolver = GraphRunner.componentResolverFromDir(reg))
    assert(runner.validate().isEmpty)
    import spark.implicits._
    val seed = runner.tableHandle("src")
    seed.append(Seq(1L, 2L, 3L).toDF("id")); seed.flush()
    runner.run()
    assert(runner.tableHandle("result").read.head().getLong(0) == 3L)
    // unresolvable component → compile error, mirroring the platform
    val bad = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    assert(bad.validate().exists(_.contains("component 'acme/wordcount@v1' not found")))
  }

  test("scheduler: cron tick runs the node, propagates downstream, honors requestNewRun") {
    import java.time.LocalDateTime
    val dir = tmpDir("graph")
    write(dir, "consume.sql", "select count(*) as n from {{ src }}")
    write(dir, "graph.yml",
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
    // a chunked job: writes one batch per run, asks for a follow-up until done
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
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("chunker.scala" -> chunker))
    val sched = new Scheduler(runner)
    // cron fires at minute 0 → first batch + downstream count
    val ran1 = sched.tick(LocalDateTime.of(2026, 1, 1, 9, 0))
    assert(ran1.contains("chunker01") && ran1.contains("consume01"))
    assert(runner.tableHandle("counts").read.head().getLong(0) == 1L)
    assert(sched.pendingFollowUps.contains("chunker01"))
    // non-due minute: only the follow-up fires
    val ran2 = sched.tick(LocalDateTime.of(2026, 1, 1, 9, 2))
    assert(ran2.contains("chunker01"))
    assert(runner.tableHandle("counts").read.head().getLong(0) == 2L)
    // third batch via follow-up, then no more requests
    sched.tick(LocalDateTime.of(2026, 1, 1, 9, 4))
    assert(runner.tableHandle("src").read.count() == 3)
    assert(sched.tick(LocalDateTime.of(2026, 1, 1, 9, 6)).isEmpty)
  }

  test("out-of-band write: stale consumer reruns exactly once, change signals drain") {
    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: consumer.scala
        |    id: consume01
        |    inputs: {side: side}
        |    outputs: {out: sink}
        |  - node_file: writer.scala
        |    id: writer01
        |    outputs: {out: a_out}
        |stores:
        |  - table: side
        |  - table: a_out
        |  - table: sink
        |""".stripMargin)
    val consumed = new java.util.concurrent.atomic.AtomicInteger
    val consumer = new CodeNode {
      def run(ctx: NodeContext): Unit = { consumed.incrementAndGet(); () }
    }
    val writer = new CodeNode {
      def run(ctx: NodeContext): Unit = {
        val out = ctx.table("out")
        out.appendRecords(Seq(Map("x" -> 1L))); out.flush()
        // NOT a declared output — topo order cannot sequence the
        // consumer after this write; the stale loop must
        val side = ctx.table("side")
        side.appendRecords(Seq(Map("y" -> 1L))); side.flush()
      }
    }
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("consumer.scala" -> consumer, "writer.scala" -> writer))
    runner.run()
    // topo pass ran the consumer before the out-of-band write; the
    // stale wave reran it exactly once
    assert(consumed.get == 2)
    // consumed change signals drained: a later wave has nothing to do
    assert(runner.propagateOnce().isEmpty)
    assert(consumed.get == 2)
  }

  test("requestNewRun(triggerDownstream=false) suppresses the FOLLOW-UP run's propagation") {
    import java.time.LocalDateTime
    val dir = tmpDir("graph")
    write(dir, "consume.sql", "select count(*) as n from {{ src }}")
    write(dir, "graph.yml",
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
        out.appendRecords(Seq(Map("batch" -> done))); out.flush()
        ctx.state.set("batches", done + 1)
        if (done == 0L)
          ctx.state.requestNewRun(triggerDownstream = false, waitAtleastSeconds = 60)
      }
    }
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"),
      codeNodes = Map("chunker.scala" -> chunker))
    val sched = new Scheduler(runner)
    // the run that CALLS requestNewRun(false) still propagates normally
    // (the flag governs the requested follow-up, node.py request_new_run)
    val ran1 = sched.tick(LocalDateTime.of(2026, 1, 1, 9, 0))
    assert(ran1.contains("chunker01") && ran1.contains("consume01"))
    assert(runner.tableHandle("counts").read.head().getLong(0) == 1L)
    // the follow-up run executes but its writes do NOT trigger downstream
    val ran2 = sched.tick(LocalDateTime.of(2026, 1, 1, 9, 2))
    assert(ran2.contains("chunker01") && !ran2.contains("consume01"))
    assert(runner.tableHandle("src").read.count() == 2)
    assert(runner.tableHandle("counts").read.head().getLong(0) == 1L)
  }

  test("dueNodes matches cron triggers for the given minute") {
    val dir = tmpDir("graph")
    write(dir, "q.sql", "select 1 as one")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: q.sql
        |    id: hourly01
        |    trigger: 1 * * * *
        |    outputs: {out: t}
        |stores:
        |  - table: t
        |""".stripMargin)
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    assert(runner.dueNodes(java.time.LocalDateTime.of(2026, 1, 1, 5, 1)) == Seq("hourly01"))
    assert(runner.dueNodes(java.time.LocalDateTime.of(2026, 1, 1, 5, 2)).isEmpty)
  }

  test("two producers of one store is a compile error (waves would race)") {
    val dir = tmpDir("graph")
    write(dir, "graph.yml",
      """functions:
        |  - node_file: a.sql
        |    id: writera1
        |    inputs: {src: src}
        |    outputs: {out: shared}
        |  - node_file: b.sql
        |    id: writerb1
        |    inputs: {src: src}
        |    outputs: {out: shared}
        |stores:
        |  - table: src
        |  - table: shared
        |""".stripMargin)
    write(dir, "a.sql", "select 1 as one from {{ src }}")
    write(dir, "b.sql", "select 2 as two from {{ src }}")
    val runner = new GraphRunner(spark, GraphManifest.load(dir), tmpDir("wh"))
    val errs = runner.validate()
    assert(errs.exists(_.contains("multiple producers")), errs.mkString("; "))
  }
}
