package graft.graph

import java.nio.file.Files
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Catalog, State, StreamCursor, TableHandle, Template}

/** Execution context handed to code nodes (the Scala equivalent of the
  * reference's python node: arbitrary user logic over Table/Stream/
  * State/Parameter — /root/reference/patterns/node/node.py passim).
  */
final class NodeContext(
    val spark: SparkSession,
    val nodeId: String,
    runner: GraphRunner,
    node: FunctionNode) {

  /** Resolve a port name (preferred) or a store name to a Table. */
  def table(port: String): TableHandle = {
    val store = node.inputs.get(port)
      .orElse(node.outputs.get(port))
      .getOrElse(port)
    runner.tableHandle(store)
  }

  def stream(port: String, orderBy: Option[String] = None): StreamCursor =
    StreamCursor.forTable(table(port), state, orderBy)

  lazy val state: State = runner.stateFor(nodeId)

  /** Bound value, else the declared ParamSpec default (MISSING never
    * leaks here — compile rejected the graph if a required parameter
    * was unbound).
    */
  def parameter[T](name: String): T =
    node.parameters.get(name)
      .orElse(runner.paramSpecsFor(node).find(_.name == name)
        .map(_.default).filter(_ != ParamSpec.Missing))
      .getOrElse(throw new IllegalArgumentException(
        s"parameter '$name' not bound"))
      .asInstanceOf[T]

  def parameterOr[T](name: String, default: T): T =
    node.parameters.get(name).map(_.asInstanceOf[T]).getOrElse(default)

  /** Credentials bundle for a connection-typed parameter
    * (node.py:508-510): the binding names the bundle; an unbound name
    * falls back to the parameter name itself. Compile already verified
    * the bundle is registered.
    */
  def connection(name: String): Map[String, String] = {
    val ref = node.parameters.get(name).map(String.valueOf).getOrElse(name)
    runner.connectionFor(ref).getOrElse(throw new IllegalArgumentException(
      s"connection '$ref' is not bound"))
  }
}

/** A registered Scala node implementation. `params` declares the typed
  * parameter surface (node.py:513-542) — validated against the
  * manifest's bindings at graph compile time.
  */
trait CodeNode {
  def run(ctx: NodeContext): Unit
  def params: Seq[ParamSpec] = Nil
}

/** Graph compiler + DAG runner (SURVEY.md §2.4, §3.1).
  *
  * Compile-time validation mirrors the platform's upload errors
  * (/root/reference/patterns/cli/commands/upload.py:76-85): unconnected
  * inputs, unbound parameters, unknown stores, cycles. Execution is
  * topological; store writes emit create/update/reset signals that
  * enqueue dependent nodes (node.py:387-397, 483-499).
  */
final class GraphRunner(
    val spark: SparkSession,
    val manifest: GraphManifest,
    warehouse: String,
    codeNodes: Map[String, CodeNode] = Map.empty,
    componentResolver: String => Option[GraphManifest] = _ => None,
    connections: Map[String, Map[String, String]] = Map.empty) {

  private[graph] def paramSpecsFor(f: FunctionNode): Seq[ParamSpec] =
    f.nodeFile.flatMap(codeNodes.get).map(_.params).getOrElse(Nil)

  private[graph] def connectionFor(name: String): Option[Map[String, String]] =
    connections.get(name)

  val catalog = new Catalog(warehouse)
  private val changedStores = mutable.Set.empty[String]
  private val states = mutable.Map.empty[String, State]
  private[graph] val signals = mutable.ArrayBuffer.empty[(String, String)]

  // logical clock: ticks once per runNode; changedAt/ranAt let run()
  // detect nodes whose input store changed AFTER they last ran
  private var clock: Int = 0
  private val changedAt = mutable.Map.empty[String, Int]
  private val ranAt = mutable.Map.empty[String, Int]

  def stateFor(nodeId: String): State = this.synchronized {
    states.getOrElseUpdate(nodeId, new State(warehouse, nodeId))
  }

  def tableHandle(store: String): TableHandle =
    new TableHandle(spark, catalog, store, "rw", onSignal = (t, kind) => this.synchronized {
      signals += ((t, kind))
      changedStores += t
      changedAt(t) = clock
    })

  /** Flattened node list: subgraphs and components expand recursively,
    * exposed ports aliased onto the parent wiring (edit.py:175-200;
    * tests/cli/test_create.py:30-44).
    */
  lazy val flatNodes: List[(String, FunctionNode, GraphManifest)] = {
    def expand(m: GraphManifest, prefix: String): List[(String, FunctionNode, GraphManifest)] =
      m.functions.flatMap { f =>
        val id = prefix + f.id.getOrElse(f.displayName)
        f.kind match {
          case "subgraph" =>
            val sub = GraphManifest.load(m.dir.resolve(f.nodeFile.get).toString)
            expand(sub, id + "/")
          case "component" =>
            componentResolver(f.uses.get) match {
              case Some(sub) => expand(sub, id + "/")
              case None => List((id, f, m)) // unresolved component: validation error later
            }
          case _ => List((id, f, m))
        }
      }
    expand(manifest, "")
  }

  /** Compile-time checks; returns human-readable errors (empty = ok). */
  def validate(): Seq[String] = {
    val errors = mutable.ArrayBuffer.empty[String]
    // duplicate identity fields within one manifest — the reference's
    // config editor rejects these at edit time (edit.py:86-94)
    flatNodes.map(_._3).distinct.foreach { m =>
      Seq[(String, FunctionNode => Option[String])](
        ("node_file", _.nodeFile), ("id", _.id), ("webhook", _.webhook)
      ).foreach { case (k, get) =>
        m.functions.flatMap(get).groupBy(identity)
          .collect { case (v, vs) if vs.size > 1 => v }.toSeq.sorted
          .foreach(v =>
            errors += s"$k '$v' already defined in the graph configuration")
      }
    }
    // expanded ids must be unambiguous (runNode/topoOrder address by id)
    flatNodes.map(_._1).groupBy(identity)
      .collect { case (id, xs) if xs.size > 1 => id }.toSeq.sorted
      .foreach(id => errors += s"node id '$id' is ambiguous after expansion")
    // stores in scope: the root manifest's, every expanded subgraph /
    // component's OWN declarations (a component's internal stores are
    // part of its packaged graph.yml, not re-declared by the host), and
    // webhook auto-stores
    val storeNames = (manifest :: flatNodes.map(_._3)).distinct
      .flatMap(_.stores.map(_.name)).toSet ++
      flatNodes.flatMap { case (_, f, _) => f.webhook }
    flatNodes.foreach { case (id, f, _) =>
      if (f.kind == "invalid")
        errors += s"node $id: no node_file/webhook/uses"
      if (f.kind == "component" && componentResolver(f.uses.getOrElse("")).isEmpty)
        errors += s"node $id: component '${f.uses.getOrElse("")}' not found"
      f.inputs.foreach { case (port, store) =>
        if (!storeNames.contains(store))
          errors += s"node $id: input '$port' references unknown store '$store'"
      }
      f.outputs.foreach { case (port, store) =>
        if (!storeNames.contains(store))
          errors += s"node $id: output '$port' references unknown store '$store'"
      }
      f.parameters.foreach { case (k, v) =>
        if (v == null || v == "MISSING")
          errors += s"node $id: Parameter $k has no default or value"
      }
      if (f.kind == "code" && !codeNodes.contains(f.nodeFile.getOrElse("")))
        errors += s"node $id: no Scala implementation registered for '${f.nodeFile.getOrElse("")}'"
      // typed-parameter validation against the node's declared ParamSpecs
      // (node.py:513-542; the platform front-loads these as upload
      // compile errors, upload.py:76-85)
      paramSpecsFor(f).foreach { spec =>
        if (!ParamSpec.allowedTypes(spec.dtype))
          errors += s"node $id: parameter '${spec.name}' has unknown type '${spec.dtype}'"
        else f.parameters.get(spec.name)
          .filter(v => v != null && v != ParamSpec.Missing) match {
          case None =>
            if (spec.dtype == "connection") {
              // an unbound connection may resolve by its own name
              if (!connections.contains(spec.name))
                errors += s"node $id: connection '${spec.name}' is not bound"
            } else if (spec.default == ParamSpec.Missing &&
                !f.parameters.contains(spec.name)) // bound-MISSING already flagged above
              errors += s"node $id: Parameter ${spec.name} has no default or value"
          case Some(v) =>
            ParamSpec.typeError(spec, v).foreach(e => errors += s"node $id: $e")
            if (spec.dtype == "connection" && v.isInstanceOf[String] &&
                !connections.contains(String.valueOf(v)))
              errors += s"node $id: connection '${String.valueOf(v)}' is not bound"
        }
      }
    }
    // cycle check over store-mediated edges
    val producers = flatNodes.flatMap { case (id, f, _) =>
      f.outputs.values.map(_ -> id) ++ f.webhook.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // one producer per store: two writers were silent last-wins under
    // serial execution, but waves run independent nodes concurrently —
    // make the ambiguity a compile error like the platform does
    producers.foreach { case (store, ids) =>
      if (ids.size > 1)
        errors += s"store '$store' has multiple producers: ${ids.sorted.mkString(", ")}"
    }
    val adj = flatNodes.map { case (id, f, _) =>
      id -> f.inputs.values.flatMap(producers.getOrElse(_, Nil)).toSet
    }.toMap
    val visiting = mutable.Set.empty[String]
    val done = mutable.Set.empty[String]
    def dfs(n: String): Boolean = { // true = cycle
      if (done(n)) false
      else if (visiting(n)) true
      else {
        visiting += n
        val cyc = adj.getOrElse(n, Set.empty).exists(dfs)
        visiting -= n; done += n
        cyc
      }
    }
    if (adj.keys.exists(dfs)) errors += "graph contains a cycle"
    errors.toSeq
  }

  /** Topological order over store-mediated dependencies. */
  def topoOrder: List[String] = {
    val producers = flatNodes.flatMap { case (id, f, _) =>
      f.outputs.values.map(_ -> id) ++ f.webhook.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deps = flatNodes.map { case (id, f, _) =>
      id -> f.inputs.values.flatMap(producers.getOrElse(_, Nil)).toSet
    }.toMap
    val order = mutable.ArrayBuffer.empty[String]
    val seen = mutable.Set.empty[String]
    def visit(n: String): Unit =
      if (!seen(n)) { seen += n; deps.getOrElse(n, Set.empty).foreach(visit); order += n }
    flatNodes.foreach { case (id, _, _) => visit(id) }
    order.toList
  }

  /** Topological order sliced into dependency levels: every node's
    * producers sit in strictly earlier waves, so the nodes of one wave
    * are mutually independent and can execute concurrently (G10 —
    * wide graphs at scale: independent branches submit their Spark jobs
    * together and the scheduler interleaves their stages across the
    * cluster instead of serializing whole branches).
    */
  private[graph] def waveOrder: List[List[String]] = {
    val producers = flatNodes.flatMap { case (id, f, _) =>
      f.outputs.values.map(_ -> id) ++ f.webhook.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deps = flatNodes.map { case (id, f, _) =>
      id -> (f.inputs.values.flatMap(producers.getOrElse(_, Nil)).toSet - id)
    }.toMap
    val level = mutable.Map.empty[String, Int]
    def levelOf(n: String): Int = level.get(n) match {
      case Some(l) => l
      case None =>
        val ds = deps.getOrElse(n, Set.empty)
        val l = if (ds.isEmpty) 0 else ds.map(levelOf).max + 1
        level(n) = l
        l
    }
    flatNodes.map(_._1).groupBy(levelOf).toList.sortBy(_._1).map(_._2)
  }

  /** One wave: a single node runs inline; independent siblings submit
    * concurrently (Spark sessions are thread-safe; concurrent actions
    * from one session fan out across the scheduler). Failures rethrow
    * the original cause after the wave's threads wind down.
    */
  private def runWave(ids: List[String]): Unit = ids match {
    case single :: Nil => runNode(single)
    case many =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(many.size, 8))
      try {
        val futs = many.map(id => pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = runNode(id)
        }))
        futs.foreach { fut =>
          try fut.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }
      } finally pool.shutdown()
  }

  private def nodeById(id: String): (FunctionNode, GraphManifest) = {
    val (_, f, m) = flatNodes.find(_._1 == id).getOrElse(
      throw new IllegalArgumentException(s"unknown node '$id'"))
    (f, m)
  }

  /** Run one node (manual trigger — services/trigger.py:10-22). */
  def runNode(id: String): Unit = {
    this.synchronized { clock += 1; ranAt(id) = clock }
    val (f, m) = nodeById(id)
    f.kind match {
      case "sql" => runSqlNode(id, f, m)
      case "code" =>
        val impl = codeNodes(f.nodeFile.get)
        val ctx = new NodeContext(spark, id, this, f)
        impl.run(ctx)
        // flush any handles the node wrote through ctx is the node's job;
        // ctx.table() hands out fresh handles, so nodes call flush().
      case "webhook" => // passive ingest endpoint; nothing to execute
      case other =>
        throw new IllegalStateException(s"node $id of kind '$other' not runnable")
    }
  }

  /** SQL node: substitute {{ table }} → temp view, {{ param }} → literal,
    * run, write result as a new version of the output store
    * (SURVEY.md §3.2).
    */
  private def runSqlNode(id: String, f: FunctionNode, m: GraphManifest): Unit = {
    val sqlText = Files.readString(m.dir.resolve(f.nodeFile.get))
    val tableMap = f.inputs.map { case (port, store) =>
      val h = tableHandle(store)
      val view = s"graft_${id.replaceAll("[^A-Za-z0-9_]", "_")}_$port"
      h.read.createOrReplaceTempView(view)
      Seq(port -> view, store -> view)
    }.flatten.toMap
    val result = spark.sql(Template.substitute(sqlText, tableMap, f.parameters))
    val out = f.outputs.values.headOption.getOrElse(
      throw new IllegalArgumentException(s"sql node $id has no output store"))
    tableHandle(out).replace(result)
  }

  /** Run the whole graph once: dependency waves in order (independent
    * nodes within a wave execute concurrently), then re-run any node
    * whose input store changed AFTER that node last ran (possible only
    * for out-of-band writes — e.g. a code node writing to a store it
    * does not declare as an output, so wave order could not sequence
    * the consumer after it). Repeats until quiescent or `maxWaves`.
    */
  def run(maxWaves: Int = 3): Unit = {
    val errors = validate()
    require(errors.isEmpty, s"graph compile errors:\n${errors.mkString("\n")}")
    changedStores.clear()
    waveOrder.foreach(runWave)
    var wave = 0
    var stale = staleNodes()
    while (stale.nonEmpty && wave < maxWaves) {
      stale.foreach(runNode)
      wave += 1
      stale = staleNodes()
    }
    // Drain consumed change signals: every consumer just ran after its
    // producers (the stale loop covered out-of-band writes), so keeping
    // entries would make the next propagateOnce()/tick spuriously
    // re-run dependents of everything this run wrote. Only stores a
    // still-stale node (maxWaves exhausted) reads keep their entry.
    val keep = staleNodes().flatMap(id => nodeById(id)._1.inputs.values).toSet
    changedStores.filterInPlace(keep.contains)
  }

  /** Nodes holding an input store that changed after their last run. */
  private def staleNodes(): List[String] =
    topoOrder.filter { id =>
      val (f, _) = nodeById(id)
      f.kind != "webhook" && f.inputs.values.exists(store =>
        changedAt.getOrElse(store, 0) > ranAt.getOrElse(id, 0))
    }

  /** Webhook ingest: append JSON-lines micro-batch to the webhook's
    * auto-created same-name table (create.py:177-197; node.py:544-553).
    */
  def ingestWebhook(name: String, jsonLinesPath: String): Unit = {
    val df = spark.read.json(jsonLinesPath)
    val h = tableHandle(name)
    h.append(df)
    h.flush()
  }

  /** Webhook ingest from in-memory JSON bodies (the HTTP edge's path):
    * parse with Spark's JSON inference, stamp the request key the
    * respond contract is keyed on (node.py:544-553).
    */
  private val ingestLock = new Object
  def ingestWebhookJson(name: String, jsonBodies: Seq[String],
      requestKey: String): Unit = {
    import spark.implicits._
    val df = spark.read.json(jsonBodies.toDS())
      .withColumn("patterns_request_key",
        org.apache.spark.sql.functions.lit(requestKey))
    // serialize ingest+propagate (concurrent FIRST writes would race
    // version creation: two newVersion/setActive pairs, last one wins
    // and the other's rows land in a non-active version); response
    // POLLING stays concurrent — that is what the server pool buys
    ingestLock.synchronized {
      val h = tableHandle(name)
      h.append(df)
      h.flush()
    }
  }

  /** Response row for a request key, as a JSON object with the key
    * column stripped (the HTTP edge returns the node's payload, not the
    * plumbing). None until `respondToRequest` has written it.
    */
  def webhookResponse(webhookName: String, requestKey: String): Option[String] = {
    responseReads.incrementAndGet()
    val h = tableHandle(s"${webhookName}_responses")
    if (!h.exists) return None
    val hits = h.read
      .filter(org.apache.spark.sql.functions.col("patterns_request_key") === requestKey)
      .drop("patterns_request_key")
    hits.toJSON.take(1).headOption
  }

  // In-memory wake-up latches for `?wait=true` HTTP requests, keyed by
  // request key. The WAITER registers the latch (before ingesting, so a
  // responder running inline can never complete-before-register), and
  // respondToRequest completes it if one is present — a waiting edge
  // then does exactly one confirming table read instead of launching a
  // parquet-scan Spark job every 50 ms for up to the whole timeout
  // (≈200 jobs per waiting request). The `<name>_responses` table stays
  // the durable record; the latch carries no payload.
  private val responseLatches = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[Unit]]()
  /** Table-read counter for the response path (spec: ≤2 per waited request). */
  private[graph] val responseReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graph] def responseLatch(
      requestKey: String): java.util.concurrent.CompletableFuture[Unit] =
    responseLatches.computeIfAbsent(requestKey,
      _ => new java.util.concurrent.CompletableFuture[Unit]())

  private[graph] def dropResponseLatch(requestKey: String): Unit =
    responseLatches.remove(requestKey)

  /** respond_to_request (node.py:544-553): reply to a webhook request by
    * writing the payload row keyed by `patterns_request_key` into the
    * hook's `<name>_responses` table; the platform edge delivers it to
    * the waiting HTTP request (woken via the request's latch).
    */
  def respondToRequest(webhookName: String, requestKey: String,
      payload: Map[String, Any]): Unit = {
    val h = tableHandle(s"${webhookName}_responses")
    h.appendRecords(Seq(payload + ("patterns_request_key" -> requestKey)))
    h.flush()
    // wake a waiting edge AFTER the durable write; only waiters create
    // latches, so completing an absent key is a no-op, not a leak
    Option(responseLatches.get(requestKey)).foreach(_.complete(()))
  }

  /** Nodes whose cron trigger fires in the minute of `t`
    * (G2 — the scheduler loop polls this).
    */
  def dueNodes(t: java.time.LocalDateTime): Seq[String] =
    flatNodes.collect {
      case (id, f, _) if f.trigger.exists(Cron(_).matches(t)) => id
    }

  private[graph] def changedStoresSnapshot: Set[String] = changedStores.toSet
  /** Drop pending change signals (requestNewRun(triggerDownstream=false)
    * suppresses downstream propagation of that run's writes —
    * node.py:483-499).
    */
  private[graph] def suppressChanges(stores: Set[String]): Unit =
    changedStores --= stores

  /** Run dependents of stores changed since the last call (one signal
    * wave — G4); returns the node ids that ran.
    */
  def propagateOnce(): Seq[String] = ingestLock.synchronized {
    // serialized with ingest: two concurrent signal drains would each
    // run the same dependents (double processing) or lose a signal
    // cleared by the other
    val changed = changedStores.toSet
    changedStores.clear()
    val dependents = topoOrder.filter { id =>
      val (f, _) = nodeById(id)
      f.kind != "webhook" && f.inputs.values.exists(changed.contains)
    }
    dependents.foreach(runNode)
    dependents
  }
}

/** Cron + run-request scheduler loop over a GraphRunner (G2/T9): each
  * tick runs cron-due nodes and any follow-up runs previously requested
  * via `State.requestNewRun`, then propagates one signal wave to
  * downstream consumers. Driven by an external clock so it is testable
  * and embeddable (call `tick` from any timer).
  */
final class Scheduler(runner: GraphRunner) {
  // follow-up run time + whether that run's writes propagate downstream
  private val followUps =
    scala.collection.mutable.Map.empty[String, (java.time.LocalDateTime, Boolean)]

  def pendingFollowUps: Map[String, java.time.LocalDateTime] =
    followUps.view.mapValues(_._1).toMap

  def tick(t: java.time.LocalDateTime): Seq[String] = {
    val dueFollowUps = followUps.collect {
      case (id, (at, _)) if !at.isAfter(t) => id
    }.toList
    // trigger_downstream=false governs the REQUESTED follow-up run, not
    // the run that requested it (node.py request_new_run): a follow-up
    // scheduled with false executes, but its writes stay out of this
    // tick's propagation wave. (A store another due node changed before
    // this one ran is outside the before/after diff and still
    // propagates.)
    val cronDue = runner.dueNodes(t)
    // a node that is ALSO cron-due this tick runs on the schedule's
    // authority — the follow-up's no-propagate flag must not mute it
    val suppressFor =
      dueFollowUps.filter(id => !followUps(id)._2).toSet -- cronDue
    dueFollowUps.foreach(followUps.remove)
    val due = (cronDue ++ dueFollowUps).distinct
    due.foreach { id =>
      val before = runner.changedStoresSnapshot
      runner.runNode(id)
      if (suppressFor(id))
        runner.suppressChanges(runner.changedStoresSnapshot -- before)
      val st = runner.stateFor(id)
      st.pendingNewRun.foreach { case (triggerDownstream, waitSecs) =>
        followUps(id) = (t.plusSeconds(waitSecs), triggerDownstream)
      }
      st.clearNewRun()
    }
    val propagated = if (due.nonEmpty) runner.propagateOnce() else Nil
    due ++ propagated
  }
}

object GraphRunner {
  /** Local component registry (G6): resolves `org/component@v1` to
    * `<root>/<org>/<component>/<version>/graph.yml`
    * (edit.py:175-200; services/download.py:8-20 fetches zips from the
    * platform registry — locally the registry is a directory tree).
    */
  def componentResolverFromDir(root: String): String => Option[GraphManifest] =
    ref => {
      val m = raw"([^/@]+)/([^/@]+)@(.+)".r
      ref match {
        case m(org, name, version) =>
          val p = java.nio.file.Paths.get(root, org, name, version, "graph.yml")
          if (java.nio.file.Files.exists(p)) Some(GraphManifest.load(p.toString))
          else None
        case _ => None
      }
    }
}
