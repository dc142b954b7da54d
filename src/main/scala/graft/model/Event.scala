package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The engine's single data abstraction: a time-ordered Event.
 *
 * Mirrors the reference's Event record (reference: src/Event.php:35-86):
 * `event` is the type/dispatch key, `datetime` is event time (normalised
 * to UTC), `receivedTime` is an optional server-arrival correction that
 * overrides `datetime` when set (reference: src/Event.php:128-141), and
 * everything else is open key/value payload
 * (reference: src/Event.php:34,83-85).
 *
 * Spark-first representation: a typed `Dataset[Event]` for the stateful
 * correlation core; the relational surface keeps the parquet fixture's
 * flat schema (`event_id, ts, user_id, event_type, value, props`).
 */
case class Event(
    event: String,
    id: Option[String],
    datetime: Timestamp,
    receivedTime: Option[Timestamp],
    payload: Map[String, String]) {

  /** Effective event time: receivedTime overrides datetime when present
   * (reference: src/Event.php:128-141). */
  def effectiveTime: Timestamp = receivedTime.getOrElse(datetime)
}

object Event {

  /** Control events injected at engine lifecycle points
   * (reference: src/Scheduler.php:163-188, 727-737, 986-988). */
  object Control {
    val Start = "GRAFT:Engine:Start"
    val Restored = "GRAFT:Engine:Restored"
    val Stop = "GRAFT:Engine:Stop"
    val Heartbeat = "GRAFT:Engine:Heartbeat"
    val all: Seq[String] = Seq(Start, Restored, Stop, Heartbeat)
  }

  /** Wildcard event-type matcher (reference: src/StateMachine/IEventMatcher.php:27). */
  val MatchAny = "*"

  /**
   * Timestamp normalisation for loosely-typed inputs
   * (reference: src/Event.php:61-86): ints are unix seconds, strings are
   * parsed TZ-aware, absent defaults to `fallback`.
   */
  def normalizeDatetime(raw: Column, fallback: Column): Column =
    coalesce(
      // numeric unix seconds (guarded: ANSI mode would throw on a bare cast)
      when(raw.rlike("^[0-9]+$"), timestamp_seconds(raw.cast("bigint"))),
      // TZ-aware / loose string; try_ variant tolerates malformed input
      try_to_timestamp(raw),
      fallback)
}
