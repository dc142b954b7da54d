package graft.ops

import org.apache.spark.sql.Observation

import graft.SparkSpec
import graft.rules.{OutputData, RuleSpec}
import graft.streaming.RuleEngine

class MetricsSpec extends SparkSpec {

  test("A4 observe: metrics ride the job without an extra pass") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val obs = Observation("stats")
    Metrics.observed(events, obs).count()
    val m = obs.get
    assert(m("seen") == 1000L)
    assert(m("with_value") == 1000L)
    assert(m("sum_value").asInstanceOf[Double] > 0.0)
  }

  test("A5 histogram buckets are powers of two within the clamp") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val buckets = Metrics.histogram(docs, "n_chars").collect()
      .map(_.getAs[Long]("bucket"))
    buckets.foreach { b =>
      assert(b >= 64L && b <= 1048576L)
      assert(java.lang.Long.bitCount(b) == 1, s"$b not a power of two")
    }
  }

  test("J4/A7 chain state: final trimmed chain holds the last n ids in order") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val events = (1 to 5).map(i =>
      (i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 7L))
      .toDF("event_id", "ts", "user_id")
    val got = Metrics.lastChainState(events, 3).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("chain_ids") == "3,4,5")
  }

  test("T1-tz: timezone cron evaluates fields on local wall time") {
    import spark.implicits._
    // 14:30 UTC on Mon 2024-01-15 = 09:30 in America/New_York (UTC-5)
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 14:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 15:00:00")))
      .toDF("event_id", "ts")
    val ticks = Schedule.ticksTz(events, Schedule.parse("30 9 * * 1-5"), "America/New_York")
      .collect()
    assert(ticks.length == 1)
    assert(ticks.head.getAs[java.sql.Timestamp]("tick_ts") ==
      java.sql.Timestamp.valueOf("2024-01-15 14:30:00"))
    assert(ticks.head.getAs[java.sql.Timestamp]("local_ts") ==
      java.sql.Timestamp.valueOf("2024-01-15 09:30:00"))
  }

  test("T3 cron tick events drive an OnSchedule rule through the interpreter") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val cron = Schedule.parse("@daily")
    val ticks = Schedule.tickEvents(spark, events, cron, "nightly")
    val nTicks = ticks.count()
    assert(nTicks >= 29 && nTicks <= 31) // fixture spans ~30 days

    val rule = RuleSpec.matchSingle("nightly_report", Set("GRAFT:Cron:nightly"),
      onMatch = ch => Seq(OutputData.action("report", Map("at" -> ch.head.datetime.toString))))
    val fired = RuleEngine.runBatch(ticks, Seq(rule)).collect()
    assert(fired.count(_.kind == "complete") == nTicks)
  }
}
