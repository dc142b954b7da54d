package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * K7 — management/status surface. The reference runs a read-only HTTP
 * status page showing engine state, EPS load, memory and process
 * health (reference: src/Management/Server.php:16-60,
 * src/Management/Actions/Index.php:133-252). Spark already serves the
 * interactive equivalent (the Spark UI + Structured Streaming tab);
 * this object provides the PROGRAMMATIC face: one JSON document per
 * engine built from `StreamingQueryProgress`, carrying the same
 * information the reference page renders —
 *
 *  reference field              | here
 *  -----------------------------|-----------------------------------
 *  engine state (running/...)   | query.status (isDataAvailable etc.)
 *  EPS + load averages          | inputRowsPerSecond / processedRowsPerSecond
 *  matcher counts / memory      | stateOperators (numRowsTotal, memoryUsedBytes)
 *  statistics counters          | observedMetrics (Metrics.observed)
 *  recent events                | Metrics.recentEvents over the sink table
 *
 * [[serve]] exposes the document on a loopback HTTP endpoint
 * (JDK-built-in server, no dependencies) — the full K7 face; the
 * engine can also stay headless and dump the JSON on a timer.
 */
object Status {

  /** Minimal JSON string escaping (quotes, backslashes, control
   * chars) — query names are user-chosen and served over HTTP. */
  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Status document for one query: identity, run state, the latest
   * progress (rates, state-store sizes, watermark) and observed
   * metrics — `StreamingQueryProgress.json` is Spark's own stable
   * serialisation, embedded verbatim. */
  def queryStatusJson(q: StreamingQuery): String = {
    val progress = Option(q.lastProgress).map(_.json).getOrElse("null")
    val name = Option(q.name).map(n => "\"" + jsonEsc(n) + "\"").getOrElse("null")
    s"""{"id":"${q.id}","runId":"${q.runId}","name":$name,"active":${q.isActive},"status":${q.status.json},"lastProgress":$progress}"""
  }

  /** The whole engine: every active query on the session, newest
   * progress each — the one-call analogue of the reference's status
   * page fetch. */
  def engineStatusJson(spark: SparkSession): String =
    spark.streams.active.map(queryStatusJson).mkString("[", ",", "]")

  /** Per-rule fire statistics over a Fired table/stream — the
   * rule-level half of the reference's statistics block
   * (init_matcher / handled / completed_matcher_timeout counters,
   * reference: src/CorrelationEngine.php:222,261,293): one row per
   * (rule, kind) with fire count and first/last fire times. Batch: run
   * on the routed fires table; streaming: aggregate inside a
   * foreachBatch or over the sink table. */
  def ruleStats(fired: DataFrame): DataFrame =
    fired.groupBy("rule", "kind").agg(
      count(lit(1)).as("n_fires"),
      min("firedAt").as("first_fire"),
      max("firedAt").as("last_fire"))

  /** Event-level `seen` counters (reference incrStat('seen', type),
   * src/CorrelationEngine.php:179): one row per event type. */
  def seenStats(events: org.apache.spark.sql.Dataset[graft.model.Event]): DataFrame =
    events.toDF().groupBy("event").agg(count(lit(1)).as("n_seen"))

  private def htmlEsc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def fmtRate(r: Double): String =
    if (r.isNaN || r.isInfinite) "&mdash;"
    else String.format(java.util.Locale.ROOT, "%.1f", Double.box(r))

  /**
   * K7 — the HUMAN face of the status surface: a dependency-free HTML
   * page over the same per-query progress the JSON document carries
   * (the reference serves an HTML status page listing engine state,
   * per-matcher counts and load; reference:
   * src/Management/Actions/Index.php:133-252). One table row per
   * active query: name/id, run state, input vs processed rates, last
   * batch duration, state-store rows and memory, watermark.
   */
  def statusHtml(spark: SparkSession): String = {
    val active = spark.streams.active
    val rows = active.map { q =>
      val p = Option(q.lastProgress)
      val name = htmlEsc(Option(q.name).getOrElse("(unnamed)"))
      val inRate = p.map(x => fmtRate(x.inputRowsPerSecond)).getOrElse("&mdash;")
      val procRate = p.map(x => fmtRate(x.processedRowsPerSecond)).getOrElse("&mdash;")
      val batchMs = p.flatMap(x => Option(x.durationMs.get("triggerExecution")))
        .map(_.toString + " ms").getOrElse("&mdash;")
      val stateRows = p.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateMem = p.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
      val watermark = p.flatMap(x => Option(x.eventTime.get("watermark")))
        .map(htmlEsc).getOrElse("&mdash;")
      val state = if (q.isActive) "running" else "stopped"
      s"""<tr><td>$name</td><td><code>${q.id}</code></td><td>$state</td>
         |<td>$inRate</td><td>$procRate</td><td>$batchMs</td>
         |<td>$stateRows</td><td>$stateMem</td><td>$watermark</td></tr>""".stripMargin
    }.mkString("\n")
    val body =
      if (active.isEmpty) "<p>No active streaming queries.</p>"
      else
        s"""<table border="1" cellpadding="4" cellspacing="0">
           |<tr><th>query</th><th>id</th><th>state</th>
           |<th>input rows/s</th><th>processed rows/s</th><th>last batch</th>
           |<th>state rows</th><th>state bytes</th><th>watermark</th></tr>
           |$rows
           |</table>""".stripMargin
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft engine status</title></head>
       |<body><h1>graft engine status</h1>
       |<p>${active.length} active ${if (active.length == 1) "query" else "queries"}
       | &middot; <a href="/status">JSON</a></p>
       |$body
       |</body></html>""".stripMargin
  }

  /**
   * K7 — the management HTTP endpoint itself (reference:
   * src/Management/Server.php:16-60 serves a read-only status page on
   * a local socket): `GET /status` returns [[engineStatusJson]];
   * `GET /` renders [[statusHtml]] (the reference's human-readable
   * page; reference: src/Management/Actions/Index.php:133-252).
   * JDK-built-in `com.sun.net.httpserver` — zero dependencies, a
   * couple of driver threads, no executor involvement. Binds loopback
   * by default (the reference's page is operator-only too); port 0
   * picks an ephemeral port (see `getAddress.getPort`). Caller stops
   * it with `stop(0)`.
   */
  def serve(spark: SparkSession, port: Int = 0,
      host: String = "127.0.0.1"): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(host, port), 0)
    // a status endpoint must answer even when the engine is sick: a
    // failure building the document returns 500 instead of leaving
    // the client hanging until its socket timeout
    def handle(ex: com.sun.net.httpserver.HttpExchange,
        contentType: String, render: () => String, renderErr: Throwable => String): Unit = {
      val (code, body) =
        try (200, render().getBytes("UTF-8"))
        catch { case scala.util.control.NonFatal(e) => (500, renderErr(e).getBytes("UTF-8")) }
      try {
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(code, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      } finally ex.close()
    }
    server.createContext("/status", (ex: com.sun.net.httpserver.HttpExchange) =>
      handle(ex, "application/json", () => engineStatusJson(spark),
        e => s"""{"error":"${jsonEsc(String.valueOf(e.getMessage))}"}"""))
    // "/" is the fallback context in com.sun.net.httpserver: exact
    // /status requests still hit the JSON handler above
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) =>
      handle(ex, "text/html; charset=utf-8", () => statusHtml(spark),
        e => s"<html><body><h1>error</h1><pre>${htmlEsc(String.valueOf(e.getMessage))}</pre></body></html>"))
    server.start()
    server
  }
}
