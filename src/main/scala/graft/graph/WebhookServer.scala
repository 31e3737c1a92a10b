package graft.graph

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Loopback HTTP edge for webhook nodes — the smallest honest version
  * of the platform's per-webhook URL (the reference serves
  * `POST .../webhooks/<name>`; see patterns/cli/services/api.py:186-188
  * and node.py:544-553 for the request-key / respond contract).
  *
  * `POST /webhooks/<name>` with a JSON object body:
  *  - appends the parsed body (plus a generated `patterns_request_key`
  *    column) to the webhook's same-name table,
  *  - runs one downstream signal wave (the platform runs consumers
  *    asynchronously; a loopback edge can afford to run them inline),
  *  - with `?wait=true`, polls `<name>_responses` for a row carrying
  *    this request's key (written by `GraphRunner.respondToRequest`)
  *    and returns its payload as the HTTP response body; otherwise
  *    responds 202 with the request key.
  *
  * Pure JDK (`com.sun.net.httpserver`) — no added dependencies; binds
  * 127.0.0.1 only. JSON parsing is Spark's own (`spark.read.json`), so
  * body schemas follow the same inference rules as file ingest.
  */
final class WebhookServer(runner: GraphRunner, port: Int = 0,
    responseTimeoutMs: Long = 10000L) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val reqCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  server.createContext("/webhooks/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error":${jsonStr(e.getMessage)}}""")
      } finally ex.close()
  })
  // Small pool, not serial dispatch: a `?wait=true` client polling for
  // its response must not block other posts (including the one whose
  // downstream run produces that response). Concurrent ingests to one
  // table are safe: batch sequences and meta updates serialize behind
  // the catalog's per-table lock.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)
  server.start()

  /** Bound port (pass port=0 to let the OS pick a free one). */
  def boundPort: Int = server.getAddress.getPort
  def url(name: String): String = s"http://127.0.0.1:$boundPort/webhooks/$name"

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def route(ex: HttpExchange): Unit = {
    val name = ex.getRequestURI.getPath.stripPrefix("/webhooks/").takeWhile(_ != '/')
    if (ex.getRequestMethod != "POST" || name.isEmpty) {
      respond(ex, 405, """{"error":"use POST /webhooks/<name>"}"""); return
    }
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8).trim
    if (body.isEmpty || body.head != '{') {
      respond(ex, 400, """{"error":"body must be a JSON object"}"""); return
    }
    val key = f"req-${reqCounter.incrementAndGet()}%08d"
    val wait = Option(ex.getRequestURI.getQuery).exists(_.split('&').contains("wait=true"))
    // register the latch BEFORE ingesting: a responder running inline in
    // the propagation wave completes it via respondToRequest, so the
    // waiter can never miss the wake-up
    val latch = if (wait) Some(runner.responseLatch(key)) else None
    runner.ingestWebhookJson(name, Seq(body), key)
    runner.propagateOnce()
    if (!wait) {
      respond(ex, 202, s"""{"patterns_request_key":"$key"}"""); return
    }
    // at most 2 table reads per waited request: one up-front check
    // (covers respond-before-wait), one confirming read after the latch
    // fires — never a 50 ms Spark-job poll loop
    try {
      var resp: Option[String] = runner.webhookResponse(name, key)
      if (resp.isEmpty) {
        try {
          latch.get.get(responseTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          resp = runner.webhookResponse(name, key)
        } catch { case _: java.util.concurrent.TimeoutException => () }
      }
      resp match {
        case Some(json) => respond(ex, 200, json)
        case None => respond(ex, 504,
          s"""{"error":"no response for key","patterns_request_key":"$key"}""")
      }
    } finally runner.dropResponseLatch(key)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def jsonStr(s: String): String =
    "\"" + Option(s).getOrElse("").replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
