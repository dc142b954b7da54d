package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.rules.{OutputData, RuleSpec}
import graft.streaming.RuleEngine

/** T1/T3 live cron ticks — schedule-advance semantics mirroring the
 * reference's CronRuleTest (tests/CronRuleTest.php:106-203: the timer
 * re-arms after each fire; advancing the clock fires every due tick
 * exactly once), driven by a virtual clock stream. */
class ScheduleStreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("T1 live ticks: clock advance fires every due tick exactly once (catch-up)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clock = MemoryStream[Timestamp]
    val cron = Schedule.parse("*/2 * * * *")
    val query = Schedule.tickStream(clock.toDF(), cron, "report", tsCol = "value")
      .writeStream.format("memory").queryName("tick_out").outputMode("append").start()
    try {
      clock.addData(ts("2024-01-01 10:00:30"))
      query.processAllAvailable()
      // clock jumps 10:00 → 10:05: both intermediate due ticks fire
      // (the reference fires each due timeout then re-arms on advance)
      clock.addData(ts("2024-01-01 10:05:10"))
      query.processAllAvailable()
      // a clock reading behind the cursor must not re-fire anything
      clock.addData(ts("2024-01-01 10:03:00"))
      query.processAllAvailable()
      clock.addData(ts("2024-01-01 10:06:05"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("tick_out").as[graft.model.Event].collect()
    assert(got.forall(_.event == "GRAFT:Cron:report"))
    assert(got.map(_.datetime).sortBy(_.getTime).toSeq == Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"),
      ts("2024-01-01 10:04:00"), ts("2024-01-01 10:06:00")))
  }

  test("T1 live ticks evaluate cron fields on the rule's local wall clock") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clock = MemoryStream[Timestamp]
    // 09:30 America/New_York = 14:30 UTC in January (EST)
    val cron = Schedule.parse("30 9 * * *")
    val query = Schedule.tickStream(clock.toDF(), cron, "ny_report",
      tz = "America/New_York", tsCol = "value")
      .writeStream.format("memory").queryName("tick_tz_out").outputMode("append").start()
    try {
      clock.addData(ts("2024-01-01 14:00:00"))
      query.processAllAvailable()
      clock.addData(ts("2024-01-01 15:00:00"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("tick_tz_out").as[graft.model.Event].collect()
    assert(got.map(_.datetime).toSeq == Seq(ts("2024-01-01 14:30:00")))
  }

  test("ticksTz DST: local 9:30 NY fires exactly once per day across BOTH transitions") {
    import spark.implicits._
    val cron = Schedule.parse("30 9 * * *")
    // spring-forward day 2024-03-10 (America/New_York, EST→EDT): the
    // 9:30 local tick must exist exactly once each day, landing at
    // 14:30 UTC while EST (-5) holds and 13:30 UTC once EDT (-4) does —
    // the classic wrong-by-an-hour bug this pins down
    val spring = Seq(ts("2024-03-09 00:00:00"), ts("2024-03-11 23:59:00")).toDF("ts")
    val got = Schedule.ticksTz(spring, cron, "America/New_York")
      .orderBy("tick_ts").select("tick_ts").as[Timestamp].collect().toSeq
    assert(got == Seq(
      ts("2024-03-09 14:30:00"),   // EST, UTC-5
      ts("2024-03-10 13:30:00"),   // EDT from 02:00 local, UTC-4
      ts("2024-03-11 13:30:00")))
    // fall-back day 2024-11-03 (EDT→EST)
    val fall = Seq(ts("2024-11-02 00:00:00"), ts("2024-11-04 23:59:00")).toDF("ts")
    val got2 = Schedule.ticksTz(fall, cron, "America/New_York")
      .orderBy("tick_ts").select("tick_ts").as[Timestamp].collect().toSeq
    assert(got2 == Seq(
      ts("2024-11-02 13:30:00"),   // EDT, UTC-4
      ts("2024-11-03 14:30:00"),   // EST from 02:00 local, UTC-5
      ts("2024-11-04 14:30:00")))
  }

  test("ticksTz DST edges: nonexistent local minute never fires; repeated one fires twice") {
    import spark.implicits._
    // grid-through-wall-clock semantics: a UTC minute fires iff its
    // LOCAL reading matches the cron fields. So local 02:30 on the
    // spring-forward day does not exist → zero ticks; local 01:30 on
    // the fall-back day exists twice (once EDT, once EST) → two ticks.
    // This matches evaluating the schedule on the wall clock, which is
    // what "9am local" schedules mean (reference: src/Rule/Cron.php
    // carries a per-rule DateTimeZone).
    val springDay = Seq(ts("2024-03-10 00:00:00"), ts("2024-03-10 23:59:00")).toDF("ts")
    assert(Schedule.ticksTz(springDay, Schedule.parse("30 2 * * *"), "America/New_York")
      .count() == 0)
    val fallDay = Seq(ts("2024-11-03 00:00:00"), ts("2024-11-03 23:59:00")).toDF("ts")
    val doubled = Schedule.ticksTz(fallDay, Schedule.parse("30 1 * * *"), "America/New_York")
      .orderBy("tick_ts").select("tick_ts").as[Timestamp].collect().toSeq
    assert(doubled == Seq(
      ts("2024-11-03 05:30:00"),   // first pass, EDT (UTC-4)
      ts("2024-11-03 06:30:00")))  // second pass, EST (UTC-5)
  }

  test("tickStream DST: the live 9:30 NY tick lands on the right UTC instant per day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clock = MemoryStream[Timestamp]
    val cron = Schedule.parse("30 9 * * *")
    val query = Schedule.tickStream(clock.toDF(), cron, "ny_dst",
      tz = "America/New_York", tsCol = "value")
      .writeStream.format("memory").queryName("tick_dst_out").outputMode("append").start()
    try {
      clock.addData(ts("2024-03-09 13:00:00"))
      query.processAllAvailable()
      // the clock advances a full day over the spring-forward boundary:
      // catch-up must fire Mar 9's tick at 14:30 UTC (EST) and Mar 10's
      // at 13:30 UTC (EDT) — each exactly once
      clock.addData(ts("2024-03-10 14:00:00"))
      query.processAllAvailable()
      clock.addData(ts("2024-03-11 14:00:00"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("tick_dst_out").as[graft.model.Event].collect()
      .map(_.datetime).sortBy(_.getTime).toSeq
    assert(got == Seq(
      ts("2024-03-09 14:30:00"),
      ts("2024-03-10 13:30:00"),
      ts("2024-03-11 13:30:00")))
  }

  test("T1 tick cursor survives a checkpoint restart: no duplicate or missed ticks") {
    // the live scheduler's analogue of the reference persisting
    // cronLastRun in saved state (src/Rule/Cron.php:204-212 next-run
    // derived from the restored clock): after a restart the catch-up
    // resumes from the checkpointed cursor, so no tick fires twice and
    // none is skipped
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cktick")
    val inDir = s"$base/in"; val ckDir = s"$base/ck"; val outDir = s"$base/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val cron = Schedule.parse("*/2 * * * *")

    def startQuery() = {
      val clock = spark.readStream.text(inDir)
        .select(org.apache.spark.sql.functions.col("value").cast("timestamp").as("ts"))
      Schedule.tickStream(clock, cron, "report", tsCol = "ts")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/clock1.txt"),
      "2024-01-01 10:00:30\n2024-01-01 10:05:10\n")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/clock2.txt"),
      "2024-01-01 10:09:10\n")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[graft.model.Event].collect()
      .map(_.datetime).sortBy(_.getTime).toSeq
    assert(got == Seq(
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"),
      ts("2024-01-01 10:04:00"), ts("2024-01-01 10:06:00"),
      ts("2024-01-01 10:08:00")))
  }

  test("T3 OnSchedule rule fires from the live stream clock") {
    // reference: src/Rule/OnSchedule.php:24-38 — a Cron rule whose
    // alarm invokes the injected closure; here the tick stream feeds
    // the live rule interpreter and a matchSingle on the tick type
    // fires per schedule
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clock = MemoryStream[Timestamp]
    val cron = Schedule.parse("*/2 * * * *")
    val rule = RuleSpec.matchSingle("daily_report", Set("GRAFT:Cron:report"),
      onMatch = ch => Seq(OutputData.action("run_report",
        Map("at" -> ch.head.datetime.toString))))
    val ticks = Schedule.tickStream(clock.toDF(), cron, "report", tsCol = "value")
    val query = RuleEngine.runStreaming(ticks, Seq(rule))
      .writeStream.format("memory").queryName("onschedule_out")
      .outputMode("append").start()
    try {
      clock.addData(ts("2024-01-01 10:00:30"))
      query.processAllAvailable()
      clock.addData(ts("2024-01-01 10:04:10"))
      query.processAllAvailable()
    } finally query.stop()
    val fired = spark.table("onschedule_out").as[RuleEngine.Fired].collect()
    assert(fired.length == 3) // ticks at 10:00, 10:02, 10:04
    assert(fired.forall(f => f.rule == "daily_report" && f.kind == "complete"))
    assert(fired.flatMap(_.outputs).forall(_.name == "run_report"))
  }
}
