package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Event

/** A1/A2 streaming faces: the EPS counter as a watermarked windowed
 * aggregation (reference ring buffer → window counts,
 * SURVEY §1.4 mapping). */
class StreamingMetricsSpec extends SparkSpec {

  private def ev(t: String, id: String): Event =
    Event("view", Some(id), Timestamp.valueOf(t), None, Map.empty)

  test("streaming EPS: per-minute counts finalise as the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val counts = stream.toDS()
      .withWatermark("datetime", "0 seconds")
      .groupBy(window($"datetime", "1 minute").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("bucket_ts"), $"n_events")
    val query = counts.writeStream.format("memory").queryName("eps_out")
      .outputMode("append").start()
    try {
      stream.addData(
        ev("2024-01-01 10:00:10", "1"), ev("2024-01-01 10:00:50", "2"),
        ev("2024-01-01 10:01:10", "3"))
      query.processAllAvailable()
      stream.addData(ev("2024-01-01 10:05:00", "4")) // watermark past both windows
      query.processAllAvailable()
      stream.addData(ev("2024-01-01 10:09:00", "5"))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("eps_out").collect()
      .map(r => r.getAs[Timestamp]("bucket_ts") -> r.getAs[Long]("n_events")).toMap
    assert(got(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
    assert(got(Timestamp.valueOf("2024-01-01 10:01:00")) == 1L)
  }

  test("multimodal frame sampling keeps fixed stride and partition-local fan-out") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = graft.ops.Multimodal.fromDocuments(docs.limit(10))
    val frames = graft.ops.Multimodal.frameSample(spark, media, everyN = 4, frameBytes = 64)
      .collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.media_id).values.foreach { fs =>
      assert(fs.map(_.frame_idx).forall(_ % 4 == 0))
      assert(fs.forall(_.frame.length <= 64))
    }
    val resized = graft.ops.Multimodal.resizeFeature(Array.tabulate(16)(_.toFloat), 4)
    assert(resized.toSeq == Seq(1.5f, 5.5f, 9.5f, 13.5f))
  }
}
