package graft.memory

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mirrors the reference's memory tests (reference: tests/MemoryTest
 * .php: round-trips, TTL expiry, purge). */
class MemoryStoreSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def writes(rows: (String, String, String, Long, Boolean, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("namespace", "key", "value", "ttl_sec", "persistent", "w")
      .withColumn("written_at", col("w").cast("timestamp")).drop("w")
  }

  test("last writer wins per (namespace, key)") {
    val m = MemoryStore.applyWrites(MemoryStore.empty(spark), writes(
      ("ns", "k", "v1", 0L, false, "2024-01-01 10:00:00"),
      ("ns", "k", "v2", 0L, false, "2024-01-01 11:00:00")))
    val got = m.collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("value") == "v2")
  }

  test("ttl > 0 sets expiry; liveAsOf filters expired entries") {
    val m = MemoryStore.applyWrites(MemoryStore.empty(spark), writes(
      ("ns", "short", "v", 3600L, false, "2024-01-01 10:00:00"),
      ("ns", "forever", "v", 0L, false, "2024-01-01 10:00:00")))
    val live = MemoryStore.liveAsOf(m, lit("2024-01-01 12:00:00").cast("timestamp"))
      .collect().map(_.getAs[String]("key")).toSet
    assert(live == Set("forever"))
    val early = MemoryStore.liveAsOf(m, lit("2024-01-01 10:30:00").cast("timestamp"))
      .collect().map(_.getAs[String]("key")).toSet
    assert(early == Set("short", "forever"))
  }

  test("negative ttl deletes the entry") {
    val base = MemoryStore.applyWrites(MemoryStore.empty(spark), writes(
      ("ns", "k", "v", 0L, false, "2024-01-01 10:00:00")))
    val m = MemoryStore.applyWrites(base, writes(
      ("ns", "k", "ignored", -1L, false, "2024-01-01 11:00:00")))
    assert(m.count() == 0)
  }

  test("full loop: rule memory emissions apply to the store and enrich later events") {
    import java.time.Duration
    import graft.model.Event
    import graft.rules.{OutputData, RuleSpec}
    import graft.streaming.{RuleEngine, Sinks}
    import spark.implicits._
    val rule = RuleSpec.matchSingle("remember", Set("purchase"),
      onMatch = ch => Seq(OutputData.memory("users", ch.head.payload("key"),
        ch.head.payload("amount"), ttlSec = 3600L)))
    val fired = RuleEngine.runBatch(spark.createDataset(Seq(
      Event("purchase", Some("1"), ts("2024-01-01 10:00:00"), None,
        Map("key" -> "u1", "amount" -> "99")))), Seq(rule))
    val writes = MemoryStore.writesFromOutputs(Sinks.outputsOf(fired.toDF()))
    val mem = MemoryStore.applyWrites(MemoryStore.empty(spark), writes)
    val entry = mem.collect().head
    assert(entry.getAs[String]("namespace") == "users")
    assert(entry.getAs[String]("key") == "u1")
    assert(entry.getAs[String]("value") == "99")
    assert(entry.getAs[Timestamp]("expires_at") == ts("2024-01-01 11:00:00"))
    // enrich a later event through the store
    val events = Seq(("u1", "login")).toDF("user", "event_type")
    val got = MemoryStore.lookup(events, mem, "users", org.apache.spark.sql.functions.col("user"))
      .collect().head
    assert(got.getAs[String]("memory_value") == "99")
  }

  test("memory keys containing colons round-trip through output encoding") {
    import graft.rules.OutputData
    import graft.streaming.{RuleEngine, Sinks}
    import graft.model.Event
    import java.time.Duration
    import spark.implicits._
    val rule = graft.rules.RuleSpec.matchSingle("m", Set("x"),
      onMatch = _ => Seq(OutputData.memory("ns", "a:b:c", "v")))
    val fired = RuleEngine.runBatch(spark.createDataset(Seq(
      Event("x", Some("1"), ts("2024-01-01 10:00:00"), None, Map.empty))), Seq(rule))
    val entry = MemoryStore.applyWrites(MemoryStore.empty(spark),
      MemoryStore.writesFromOutputs(Sinks.outputsOf(fired.toDF()))).collect().head
    assert(entry.getAs[String]("namespace") == "ns")
    assert(entry.getAs[String]("key") == "a:b:c")
  }

  test("K6 bootstrap: save/load round-trips persistent entries, purging expired on load") {
    // mirrors reference MemoryEngine.loadFromBackend
    // (src/Memory/MemoryEngine.php:109-123): expired entries are
    // filtered while populating the store at startup
    val dir = java.nio.file.Files.createTempDirectory("membackend").toString + "/memory"
    val m = MemoryStore.applyWrites(MemoryStore.empty(spark), writes(
      ("users", "gold", "v", 0L, true, "2024-01-01 10:00:00"),      // no expiry
      ("users", "short", "v", 3600L, true, "2024-01-01 10:00:00"),  // expires 11:00
      ("users", "ephemeral", "v", 0L, false, "2024-01-01 10:00:00"))) // not persistent
    MemoryStore.save(m, dir)

    // restart before expiry: both persistent entries load
    val early = MemoryStore.load(spark, dir, lit("2024-01-01 10:30:00").cast("timestamp"))
    assert(early.collect().map(_.getAs[String]("key")).toSet == Set("gold", "short"))

    // restart after expiry: the TTL'd entry is purged on load
    val late = MemoryStore.load(spark, dir, lit("2024-01-01 12:00:00").cast("timestamp"))
    assert(late.collect().map(_.getAs[String]("key")).toSet == Set("gold"))

    // the loaded store is upsert- and lookup-ready (full engine loop)
    val warmed = MemoryStore.applyWrites(late, writes(
      ("users", "gold", "v2", 0L, true, "2024-01-01 12:30:00")))
    assert(warmed.collect().map(_.getAs[String]("value")).toSeq == Seq("v2"))

    // the full engine lifecycle writes BACK to the same backend path it
    // loaded from (load → applyWrites → save at shutdown) — the save
    // must not trip over its own read lineage
    MemoryStore.save(warmed, dir)
    val reloaded = MemoryStore.load(spark, dir, lit("2024-01-01 13:00:00").cast("timestamp"))
    assert(reloaded.collect().map(r =>
      (r.getAs[String]("key"), r.getAs[String]("value"))).toSeq == Seq("gold" -> "v2"))

    // first boot: no backend table yet → empty store, same schema
    val fresh = MemoryStore.load(spark, dir + "-missing",
      lit("2024-01-01 12:00:00").cast("timestamp"))
    assert(fresh.count() == 0)
    assert(fresh.columns.toSeq == MemoryStore.columns)
  }

  test("persistent subset survives; lookup enriches via broadcast join") {
    import spark.implicits._
    val m = MemoryStore.applyWrites(MemoryStore.empty(spark), writes(
      ("users", "1", "gold", 0L, true, "2024-01-01 10:00:00"),
      ("users", "2", "silver", 0L, false, "2024-01-01 10:00:00")))
    assert(MemoryStore.persistentEntries(m).count() == 1)
    val events = Seq((1L, "login"), (3L, "login")).toDF("user_id", "event_type")
    val got = MemoryStore.lookup(events, m, "users", col("user_id").cast("string"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        Option(r.getAs[String]("memory_value"))).toMap
    assert(got(1L).contains("gold"))
    assert(got(3L).isEmpty)
  }

  test("J9 live: a memory write in batch N enriches events from batch N+1 on") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("memlive").toString
    val memPath = s"$base/memory"
    val results = scala.collection.mutable.Map[Long, Seq[(Long, Option[String])]]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = MemoryStore.enrichStream(
      stream.toDF().toDF("user_id", "event_type"), memPath, "users",
      col("user_id").cast("string"), s"$base/ck") { (enriched, batchId) =>
      results.synchronized {
        results(batchId) = enriched.collect().toSeq.map(r =>
          r.getAs[Long]("user_id") -> Option(r.getAs[String]("memory_value")))
      }
    }
    try {
      // batch with NO memory yet: lookup misses
      stream.addData((1L, "login"))
      query.processAllAvailable()
      // the write lands between triggers (a rule's memory emission
      // routed through applyWrites + save)
      val writes = Seq(("users", "1", "gold", 0L, false,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
        .toDF("namespace", "key", "value", "ttl_sec", "persistent", "written_at")
        .withColumn("persistent", lit(true))
      MemoryStore.save(
        MemoryStore.applyWrites(MemoryStore.empty(spark), writes), memPath)
      // next batch sees it — per-trigger re-read, one-batch lag over
      stream.addData((1L, "click"))
      query.processAllAvailable()
    } finally query.stop()
    assert(results(0) == Seq(1L -> None))
    assert(results(1) == Seq(1L -> Some("gold")))
  }
}
