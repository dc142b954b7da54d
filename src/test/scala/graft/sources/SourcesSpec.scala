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

  test("batch heartbeat grid spans the data at the configured interval") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val hb = Sources.heartbeatGrid(events, intervalSec = 3600)
    val n = hb.count()
    // fixture spans ~30 days → ~720 hourly beats
    assert(n > 700 && n < 740)
    assert(hb.select("event").distinct().head().getString(0) == Event.Control.Heartbeat)
  }
}
