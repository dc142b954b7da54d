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
