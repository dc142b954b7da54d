package graft.sources

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.Event
import graft.rules.{OutputData, RuleSpec}
import graft.streaming.RuleEngine

class SourcesSpec extends SparkSpec {

  test("NDJSON source parses loose datetimes: unix seconds, TZ string, absent") {
    import spark.implicits._
    val lines = Seq(
      """{"event":"a","datetime":"2018-07-26 10:00:01","orderid":"12345"}""",
      """{"event":"b","datetime":"1532599201"}""",
      """{"event":"c"}""").toDF("value")
    val got = Sources.fromJsonLines(lines,
      org.apache.spark.sql.functions.lit("2024-01-01 00:00:00").cast("timestamp"))
      .collect().map(r => r.getAs[String]("event") -> r.getAs[Timestamp]("datetime")).toMap
    assert(got("a") == Timestamp.valueOf("2018-07-26 10:00:01"))
    assert(got("b") == Timestamp.valueOf("2018-07-26 10:00:01")) // unix 1532599201 UTC
    assert(got("c") == Timestamp.valueOf("2024-01-01 00:00:00")) // ingest default
    // dynamic payload stays reachable through the raw JSON
    val raw = Sources.fromJsonLines(lines).filter("event = 'a'")
      .selectExpr("get_json_object(raw, '$.orderid')").head().getString(0)
    assert(raw == "12345")
  }

  test("control events bracket a replay; OnStartup/OnShutdown rules fire once") {
    import spark.implicits._
    val events = spark.createDataset(Seq(
      Event("view", Some("1"), Timestamp.valueOf("2024-01-01 10:00:00"), None, Map("key" -> "u1"))))
    val rules = Seq(
      RuleSpec.onStartup("boot", _ => Seq(OutputData.action("load_config", Map.empty))),
      RuleSpec.onShutdown("drain", _ => Seq(OutputData.action("flush", Map.empty))))
    val fired = RuleEngine.runBatch(
      Sources.withControlEvents(spark, events), rules).collect()
    assert(fired.count(f => f.rule == "boot" && f.kind == "complete") == 1)
    assert(fired.count(f => f.rule == "drain" && f.kind == "complete") == 1)
  }

  test("control events on an empty replay window still bracket deterministically") {
    import spark.implicits._
    val empty = spark.emptyDataset[Event]
    val got = Sources.withControlEvents(spark, empty).collect()
    assert(got.map(_.event).toSeq.sorted ==
      Seq(Event.Control.Start, Event.Control.Stop).sorted)
  }

  test("S4 on-demand source launches the registered read; its events feed chained rules") {
    // mirrors reference tests/SchedulerSourceTest.php's on-demand case:
    // a rule emits ExecuteSource(cmd, vars) → the registered source
    // runs once → its events re-enter the engine on the next tick
    import spark.implicits._
    val trigger = RuleSpec.matchSingle("fetch", Set("signup"),
      onMatch = _ => Seq(OutputData.source("poll_crm", Map("segment" -> "vip"))))
    val downstream = RuleSpec.matchSingle("ingest", Set("crm_record"),
      onMatch = _ => Seq(OutputData.action("upsert", Map.empty)))
    val registry = Map[String, (org.apache.spark.sql.SparkSession, Map[String, String]) => org.apache.spark.sql.Dataset[Event]](
      "poll_crm" -> ((s, vars) => {
        import s.implicits._
        // request vars parameterize the read (reference: extra env)
        s.createDataset(Seq(Event("crm_record", Some(vars("segment")),
          Timestamp.valueOf("2024-01-01 10:01:00"), None, Map("key" -> "u1"))))
      }))
    val events = spark.createDataset(Seq(
      Event("signup", Some("1"), Timestamp.valueOf("2024-01-01 10:00:00"), None, Map("key" -> "u1"))))
    val all = graft.streaming.Sinks.runBatchChained(
      events, Seq(trigger, downstream), passes = 3, sourceRegistry = registry)
    val byRule = all.collect().map(_.getAs[String]("rule"))
    assert(byRule.contains("fetch"))  // pass 1: source request emitted
    assert(byRule.contains("ingest")) // pass 2: sourced event consumed
    // unregistered commands are skipped, like the reference's log+skip
    val none = Sources.executeOnDemand(spark,
      graft.streaming.RuleEngine.runBatch(events, Seq(trigger)).toDF(),
      Map.empty)
    assert(none.count() == 0)
  }

  test("S2/S3 DataSourceV2 generator: emits the full ordered sequence (CountToTen shape)") {
    // reference: tests/SchedulerSourceTest.php generator ordering 1..10
    // via src/Library/Source/GeneratorSource.php
    val q = spark.readStream
      .format(classOf[GeneratorSourceProvider].getName)
      .option("rowsPerBatch", 3).option("maxRows", 10)
      .option("eventType", "count")
      .load()
      .writeStream.format("memory").queryName("gen_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("gen_out").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[String]("id")).sortBy(_.toInt).toSeq == (0 until 10).map(_.toString))
    assert(rows.forall(_.getAs[String]("event") == "count"))
    // event time advances one interval per element
    val ts = rows.sortBy(_.getAs[String]("id").toInt).map(_.getAs[Timestamp]("datetime"))
    assert(ts.head.getTime + 9000L == ts.last.getTime)
    assert(rows.forall(r => r.getAs[Map[String, String]]("payload")("seq") == r.getAs[String]("id")))
  }

  test("S5 generator checkpoint: restart resumes mid-sequence without duplicates") {
    val base = java.nio.file.Files.createTempDirectory("genck")
    val ckDir = s"$base/ck"; val outDir = s"$base/out"
    def run(maxRows: Int) = {
      val q = spark.readStream
        .format(classOf[GeneratorSourceProvider].getName)
        .option("rowsPerBatch", 4).option("maxRows", maxRows)
        .load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(maxRows = 6)  // run 1 consumes prefix 0..5 and checkpoints
    run(maxRows = 10) // restart: offset log replays, emits only 6..9
    val ids = spark.read.parquet(outDir).collect().map(_.getAs[String]("id").toInt).sorted
    assert(ids.toSeq == (0 until 10), s"got ${ids.toSeq}") // no dups, no gaps
  }

  test("batch heartbeat grid spans the data at the configured interval") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val hb = Sources.heartbeatGrid(events, intervalSec = 3600)
    val n = hb.count()
    // fixture spans ~30 days → ~720 hourly beats
    assert(n > 700 && n < 740)
    assert(hb.select("event").distinct().head().getString(0) == Event.Control.Heartbeat)
  }
}
