package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

import graft.SparkSpec
import graft.model.Event
import graft.rules.{OutputData, RuleSpec}

class SinksSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(t: String, typ: String, key: String, id: String): Event =
    Event(typ, Some(id), ts(t), None, Map("key" -> key))

  private val rule = RuleSpec.sequenceWithTimeout(
    "order_payment", Seq(Set("signup"), Set("purchase")), Duration.ofMinutes(60),
    _.payload("key"),
    onComplete = _ => Seq(
      OutputData.action("notify", Map("ch" -> "email")),
      OutputData.memory("orders", "last", "done")),
    onTimeout = _ => Seq(OutputData.event("payment_overdue")))

  private def fired = {
    import spark.implicits._
    RuleEngine.runBatch(spark.createDataset(Seq(
      ev("2024-01-01 10:00:00", "signup", "u1", "1"),
      ev("2024-01-01 10:30:00", "purchase", "u1", "2"),
      ev("2024-01-01 12:00:00", "signup", "u2", "3"))), Seq(rule))
  }

  test("batch router splits outputs into per-kind tables") {
    val dir = Files.createTempDirectory("sinks").toString
    val counts = Sinks.routeFiredBatch(fired.toDF(), dir)
    assert(counts("action") == 1L)   // u1 completed → notify
    assert(counts("memory") == 1L)   // u1 completed → memory write
    assert(counts("event") == 1L)    // u2 timed out → derived event
    assert(spark.read.parquet(s"$dir/actions").count() == 1)
    val e = spark.read.parquet(s"$dir/events").collect().head
    assert(e.getAs[String]("name") == "payment_overdue")
  }

  test("executeActions captures failures as dead letter (at-least-once)") {
    val outs = Sinks.outputsOf(fired.toDF()).filter("out_kind = 'action'")
    val results = Sinks.executeActions(spark, outs, (cmd, _) =>
      if (cmd == "notify") throw new RuntimeException("smtp down")).collect()
    assert(results.length == 1)
    assert(!results.head.ok && results.head.error.contains("smtp down"))
  }

  test("derivedEvents tolerates a user var named 'key' (engine key wins)") {
    val clashRule = RuleSpec.matchSingle("clash", Set("signup"),
      onMatch = _ => Seq(OutputData.event("derived", Map("key" -> "user-value", "x" -> "1"))))
    import spark.implicits._
    val f = RuleEngine.runBatch(spark.createDataset(Seq(
      ev("2024-01-01 10:00:00", "signup", "u9", "1"))), Seq(clashRule))
    val derived = Sinks.derivedEvents(spark, f.toDF()).collect()
    assert(derived.length == 1)
    // matchSingle correlates by event type, so the engine key is "signup"
    // — the point is that the user's clashing "key" var did not crash
    // map_concat and did not win
    assert(derived.head.payload("key") == "signup")
    assert(derived.head.payload("x") == "1")
  }

  test("S4 on-demand source requests route to the sources table") {
    val srcRule = RuleSpec.matchSingle("fetch", Set("signup"),
      onMatch = _ => Seq(OutputData.source("poll_crm", Map("mode" -> "once"))))
    import spark.implicits._
    val f = RuleEngine.runBatch(spark.createDataset(Seq(
      ev("2024-01-01 10:00:00", "signup", "u1", "1"))), Seq(srcRule))
    val dir = Files.createTempDirectory("sinksrc").toString
    val counts = Sinks.routeFiredBatch(f.toDF(), dir)
    assert(counts("source") == 1L)
    val row = spark.read.parquet(s"$dir/sources").collect().head
    assert(row.getAs[String]("name") == "poll_crm")
  }

  test("K3 action validation splits on required vars; invalid not retried") {
    val outs = Sinks.outputsOf(fired.toDF()).filter("out_kind = 'action'")
    val (valid, invalid) = Sinks.validateActionVars(outs,
      Map("notify" -> Seq("ch", "missing_key")))
    assert(valid.count() == 0 && invalid.count() == 1)
    val (v2, i2) = Sinks.validateActionVars(outs, Map("notify" -> Seq("ch")))
    assert(v2.count() == 1 && i2.count() == 0)
  }

  test("streaming router splits per micro-batch with a checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("sinkstream").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RuleEngine.Fired]
    val query = Sinks.routeFiredStreaming(stream.toDS(), s"$base/out", s"$base/ck")
    try {
      stream.addData(fired.collect().toSeq)
      query.processAllAvailable()
    } finally query.stop()
    assert(spark.read.parquet(s"$base/out/actions").count() == 1)
    assert(spark.read.parquet(s"$base/out/events").count() == 1)
    assert(spark.read.parquet(s"$base/out/memory_writes").count() == 1)
  }

  test("heartbeat stream starts and emits control events (rate source)") {
    val hb = graft.sources.Sources.heartbeatStream(spark, intervalSec = 1)
    val query = hb.writeStream.format("memory").queryName("hb_out")
      .outputMode("append").start()
    try {
      // rate source is wall-clock driven: give it a couple of seconds
      Thread.sleep(2500)
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("hb_out").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("event") == graft.model.Event.Control.Heartbeat))
  }

  test("derived events re-enter the engine: chained pass fires downstream rule") {
    val downstream = RuleSpec.matchSingle(
      "escalate", Set("payment_overdue"),
      onMatch = _ => Seq(OutputData.action("page_oncall", Map.empty)))
    import spark.implicits._
    val all = Sinks.runBatchChained(
      spark.createDataset(Seq(ev("2024-01-01 12:00:00", "signup", "u2", "3"))),
      Seq(rule, downstream), passes = 3)
    val rules = all.collect().map(_.getAs[String]("rule"))
    assert(rules.contains("order_payment")) // pass 1: timeout
    assert(rules.contains("escalate"))      // pass 2: derived event consumed
  }
}
