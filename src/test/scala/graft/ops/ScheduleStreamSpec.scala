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
