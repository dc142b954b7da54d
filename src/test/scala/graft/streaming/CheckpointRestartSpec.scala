package graft.streaming

import java.nio.file.{Files, Paths}
import java.time.Duration

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Event
import graft.rules.{OutputData, RuleSpec}
import graft.sources.Sources

/** K5/S5 parity: the reference checkpoints engine state and resumes,
 * replaying matchers (reference: src/SaveHandler/FileAdapter.php,
 * src/CorrelationEngine.php:680-766 restore). Spark equivalent: the
 * streaming state store + checkpointLocation. This spec proves matcher
 * state genuinely survives a query restart: a sequence whose steps
 * span the restart completes, and a timer armed before the restart
 * fires after it. */
class CheckpointRestartSpec extends SparkSpec {

  private val rules = Seq(RuleSpec.sequenceWithTimeout(
    "order_payment", Seq(Set("signup"), Set("purchase")), Duration.ofMinutes(60),
    _.payload.getOrElse("key", ""),
    onComplete = _ => Seq(OutputData.action("paid", Map.empty)),
    onTimeout = _ => Seq(OutputData.action("reminder", Map.empty))))

  test("matcher state and event-time timers survive a checkpoint restart") {
    val base = Files.createTempDirectory("ckrestart")
    val inDir = s"$base/in"; val ckDir = s"$base/ck"; val outDir = s"$base/out"
    Files.createDirectories(Paths.get(inDir))

    def startQuery() = {
      import spark.implicits._
      val lines = spark.readStream.text(inDir)
      val events = Sources.fromJsonLines(lines)
        .select(col("event"), col("id"), col("datetime"),
          col("receivedTime"),
          map(lit("key"), get_json_object(col("raw"), "$.key")).as("payload"))
        .as[Event]
      RuleEngine.runStreaming(events, rules)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
    }

    // run 1: two pending matchers (u1 will be paid after restart; u2
    // will time out after restart)
    Files.writeString(Paths.get(s"$inDir/batch1.json"),
      """{"event":"signup","id":"1","datetime":"2024-01-01 10:00:00","key":"u1"}
        |{"event":"signup","id":"2","datetime":"2024-01-01 10:05:00","key":"u2"}
        |""".stripMargin)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // run 2: restart from the checkpoint; u1's purchase arrives inside
    // the window, a late kicker advances the watermark past u2's deadline
    Files.writeString(Paths.get(s"$inDir/batch2.json"),
      """{"event":"purchase","id":"3","datetime":"2024-01-01 10:30:00","key":"u1"}
        |{"event":"noise","id":"4","datetime":"2024-01-01 13:00:00","key":"zz"}
        |{"event":"noise","id":"5","datetime":"2024-01-01 14:00:00","key":"zz"}
        |""".stripMargin)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val fired = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("kind")))
    assert(fired.contains(("u1", "complete")), s"got ${fired.toSeq}")
    assert(fired.contains(("u2", "timeout")), s"got ${fired.toSeq}")
  }
}
