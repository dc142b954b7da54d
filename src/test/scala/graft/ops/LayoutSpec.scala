package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("co-bucketed tables sort-merge join with ZERO exchange and match the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val left = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val right = ev.groupBy("user_id").agg(max("ts").as("last_ts"))
    Layout.writeBucketed(left, "layout_left", s"$dir/left", "user_id", 8)
    Layout.writeBucketed(right, "layout_right", s"$dir/right", "user_id", 8)
    // force the join shape bucketing is for: a big-big sort-merge join
    // (broadcast off), with AQE off so the executed plan is final and
    // inspectable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Layout.bucketedJoin(spark, "layout_left", "layout_right", "user_id")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
      val expected = left.join(right, "user_id").count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS layout_left")
      spark.sql("DROP TABLE IF EXISTS layout_right")
    }
  }

  test("aggregation on the bucket key also plans with zero exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets-agg").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeBucketed(ev.select("event_id", "user_id", "value"),
      "layout_events", s"$dir/events", "user_id", 8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = spark.table("layout_events")
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("v"))
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed aggregation should not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == ev.select("user_id").distinct().count())
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS layout_events")
    }
  }
}
