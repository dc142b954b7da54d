package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Event

/**
 * Source-side operators (SURVEY.md §2.1): the reference's child-process
 * NDJSON sources, heartbeat generator and lifecycle control events,
 * re-expressed on Spark's source connectors. Spark already provides the
 * process-management/backpressure/checkpoint machinery (S5/S8 are
 * built-in: offsets in checkpointLocation, codec'd IO), so what remains
 * is Event normalisation and the synthetic streams.
 */
object Sources {

  /** Canonical Event schema for raw JSON lines. */
  private val rawSchema = "event STRING, id STRING, datetime STRING, receivedTime STRING"

  /**
   * S1 — NDJSON event source (the reference's wire format: one JSON
   * object per line with `event` + loose `datetime` + open payload;
   * reference: src/Scheduler/SourceExecutionCoordinator.php:246-276).
   * Works for both batch (`spark.read.text`) and streaming
   * (`spark.readStream.text`) inputs: pass the lines DataFrame.
   * Unknown keys stay available via the raw JSON column for
   * `get_json_object` projection (dynamic payload, SURVEY §1.1).
   */
  def fromJsonLines(lines: DataFrame, defaultNow: Column = current_timestamp()): DataFrame = {
    val parsed = lines
      .withColumn("j", from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(rawSchema)))
    parsed.select(
      col("j.event").as("event"),
      col("j.id").as("id"),
      // loose datetime: unix seconds | TZ-aware string | absent
      Event.normalizeDatetime(col("j.datetime"), defaultNow).as("datetime"),
      to_timestamp(col("j.receivedTime")).as("receivedTime"),
      col("value").as("raw"))
  }

  /**
   * S6 — Heartbeat source: a synthetic engine event every `intervalSec`
   * (reference: src/Scheduler/Heartbeat.php:255-288 emits
   * `runtime`/`seq` fields). Streaming: the rate source mapped onto
   * control events — unioned into the event stream so heartbeat rules
   * (OnHeartbeat, T4) are plain filters.
   */
  def heartbeatStream(spark: SparkSession, intervalSec: Long): Dataset[Event] = {
    import spark.implicits._
    // rate takes an integer rowsPerSecond; emit 1/s and keep every
    // intervalSec-th row for sub-1Hz beats
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", "1")
      .load()
      .select(col("timestamp"), col("value"))
      .as[(java.sql.Timestamp, Long)]
      .filter(r => r._2 % intervalSec == 0L)
      .map { case (ts, seq) =>
        val beat = seq / intervalSec
        Event(Event.Control.Heartbeat, Some(beat.toString), ts, None,
          Map("seq" -> beat.toString))
      }
  }

  /** T1/T3 live cron wiring: [[graft.ops.Schedule.tickStream]] over
   * the wall-clock rate source (1 row/s is plenty — ticks are minute-
   * grained). Union the result with the event stream feeding the rule
   * interpreter; an OnSchedule rule is a matchSingle on
   * `GRAFT:Cron:$name` (reference: src/Rule/Cron.php:97-132 arms a
   * live timer; catch-up semantics are covered by ScheduleStreamSpec
   * via the virtual-clock face). */
  def cronStream(spark: SparkSession, expr: String, name: String,
      tz: String = "UTC"): Dataset[Event] =
    graft.ops.Schedule.tickStream(
      spark.readStream.format("rate").option("rowsPerSecond", "1").load(),
      graft.ops.Schedule.parse(expr), name, tz)

  /** Batch heartbeat grid for historical replay — one heartbeat per
   * interval across the data's time span (same shape the scheduler
   * would have injected live). */
  def heartbeatGrid(events: DataFrame, intervalSec: Long): DataFrame =
    events
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .select(posexplode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL $intervalSec SECONDS"))).as(Seq("seq", "ts")))
      .select(
        lit(Event.Control.Heartbeat).as("event"),
        // deterministic id: the tick's ordinal (reference heartbeats
        // carry a seq field; src/Scheduler/Heartbeat.php:255-288)
        col("seq").cast("string").as("id"),
        col("ts").as("datetime"),
        lit(null).cast("timestamp").as("receivedTime"),
        map(lit("seq"), col("seq").cast("string")).as("payload"))

  /** S2/S3 — the DataSource V2 generator stream as a typed
   * Dataset[Event] (see [[GeneratorSourceProvider]] for options and
   * the offset/checkpoint contract). */
  def generatorStream(spark: SparkSession, rowsPerBatch: Long = 100L,
      maxRows: Long = Long.MaxValue, eventType: String = "gen"): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .format(classOf[GeneratorSourceProvider].getName)
      .option("rowsPerBatch", rowsPerBatch)
      .option("maxRows", maxRows)
      .option("eventType", eventType)
      .load()
      .as[Event]
  }

  /**
   * S4 — on-demand source execution: a rule emits
   * `ExecuteSource(cmd, vars)` and the engine launches the REGISTERED
   * source once, its events re-entering the stream (reference: emit
   * mapping src/CorrelationEngine.php:107-112; launch
   * src/Scheduler.php:823-838 — unknown commands are skipped with a
   * log, registered ones run once with the request vars as extra env).
   * Spark face: the registry maps a source name to a batch-read
   * closure; each `source`-kind output row triggers one closure call.
   * The request rows are collected driver-side — launching a read job
   * IS a driver action (the analogue of the reference's process
   * spawn); the data those jobs read stays distributed.
   */
  def executeOnDemand(spark: SparkSession, fired: DataFrame,
      registry: Map[String, (SparkSession, Map[String, String]) => Dataset[Event]]): Dataset[Event] = {
    import spark.implicits._
    val requests = graft.streaming.Sinks.outputsOf(fired)
      .filter(col("out_kind") === "source")
      .select(col("name"), col("vars"))
      .collect()
    val runs = requests.toSeq.flatMap { r =>
      val vars = Option(r.getAs[Map[String, String]]("vars")).getOrElse(Map.empty)
      registry.get(r.getAs[String]("name")).map(f => f(spark, vars))
    }
    runs.reduceOption(_ union _).getOrElse(spark.emptyDataset[Event])
  }

  /**
   * S7 — Control events: Start/Restored at stream start, Stop at
   * shutdown (reference: src/Scheduler.php:163-188,727-737,986-988).
   * Batch face: bracket the dataset with synthetic rows just before the
   * first and after the last event so OnStartup/OnShutdown rules (T2)
   * fire inside the same replay.
   */
  def withControlEvents(spark: SparkSession, events: Dataset[Event],
      restored: Boolean = false): Dataset[Event] = {
    import spark.implicits._
    // bracket in ENGINE time (receivedTime override applied) — raw
    // datetime bounds could place Stop before a corrected late event
    val eff = coalesce($"receivedTime", $"datetime")
    val bounds = events.agg(min(eff), max(eff)).head()
    // empty replay window: bracket the epoch origin so Start/Stop rules
    // still fire deterministically (no wall-clock dependence)
    val lo = Option(bounds.getTimestamp(0)).getOrElse(new java.sql.Timestamp(1L))
    val hi = Option(bounds.getTimestamp(1)).getOrElse(new java.sql.Timestamp(1L))
    val start = Event(
      if (restored) Event.Control.Restored else Event.Control.Start,
      Some("start"), new java.sql.Timestamp(lo.getTime - 1), None, Map.empty)
    val stop = Event(Event.Control.Stop, Some("stop"),
      new java.sql.Timestamp(hi.getTime + 1), None, Map.empty)
    spark.createDataset(Seq(start)).union(events).union(spark.createDataset(Seq(stop)))
  }
}
