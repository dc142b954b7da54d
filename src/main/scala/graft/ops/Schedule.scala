package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scheduled/temporal operators (SURVEY.md §2.6): the reference's Cron
 * rule (reference: src/Rule/Cron.php:32-233) fires `onSchedule(ts)` per
 * 5-field cron expression with @aliases; in batch replay the next-run is
 * derived from observed event time (reference: src/Rule/Cron.php:204-212).
 *
 * Batch face: expand the schedule over the data's event-time span as a
 * distributed minute grid (`sequence` + `explode`) filtered by the cron
 * field sets — no driver-side loop, scales to arbitrary spans.
 */
object Schedule {

  /** Parsed 5-field cron: sets of accepted values per field.
   * dom/dow carry whether the field was restricted (non-`*`), because
   * standard cron ORs dom/dow when BOTH are restricted. */
  final case class Cron(
      minutes: Set[Int], hours: Set[Int], dom: Set[Int], months: Set[Int], dow: Set[Int],
      domRestricted: Boolean, dowRestricted: Boolean)

  private val aliases = Map(
    "@hourly" -> "0 * * * *",
    "@daily" -> "0 0 * * *",
    "@midnight" -> "0 0 * * *",
    "@weekly" -> "0 0 * * 0",
    "@monthly" -> "0 0 1 * *",
    "@yearly" -> "0 0 1 1 *",
    "@annually" -> "0 0 1 1 *")

  /** Parse one cron field: star, step (star-slash-n), range, list, range-with-step. */
  private[ops] def parseField(field: String, lo: Int, hi: Int, normalize: Int => Int = identity): (Set[Int], Boolean) = {
    if (field == "*") ((lo to hi).toSet, false)
    else {
      val vals = field.split(',').flatMap { part =>
        val (rangePart, step) = part.split('/') match {
          case Array(r) => (r, 1)
          case Array(r, s) => (r, s.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron field: $field")
        }
        val (a, b) =
          if (rangePart == "*") (lo, hi)
          else rangePart.split('-') match {
            case Array(x) => (x.toInt, if (step > 1) hi else x.toInt)
            case Array(x, y) => (x.toInt, y.toInt)
            case _ => throw new IllegalArgumentException(s"bad cron range: $rangePart")
          }
        (a to b by step).map(normalize)
      }.toSet
      (vals, true)
    }
  }

  /** Parse a 5-field cron expression or @alias (reference supports both;
   * src/Rule/Cron.php:48-54). @reboot/@shutdown map to control events,
   * not schedules — handled by the streaming lifecycle, not here. */
  def parse(expr: String): Cron = {
    val resolved = aliases.getOrElse(expr.trim, expr.trim)
    require(!resolved.startsWith("@"), s"non-schedule alias: $resolved")
    val fields = resolved.split("\\s+")
    require(fields.length == 5, s"cron needs 5 fields: $expr")
    val (mins, _) = parseField(fields(0), 0, 59)
    val (hrs, _) = parseField(fields(1), 0, 23)
    val (dom, domR) = parseField(fields(2), 1, 31)
    val (mons, _) = parseField(fields(3), 1, 12)
    // dow 0-7, 0 and 7 both Sunday; normalise to 0-6 (0=Sunday)
    val (dow, dowR) = parseField(fields(4), 0, 7, v => if (v == 7) 0 else v)
    Cron(mins, hrs, dom, mons, dow, domR, dowR)
  }

  /** Next fire time strictly after `after` (driver-side; used by the
   * streaming scheduler and tests). Minute resolution like the reference. */
  def nextAfter(cron: Cron, after: Timestamp): Timestamp = {
    var t = after.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .withSecond(0).withNano(0).plusMinutes(1)
    var guard = 0
    val maxScan = 366 * 24 * 60 * 5 // 5 years of minutes
    while (!matches(cron, t) && guard < maxScan) {
      t = t.plusMinutes(1); guard += 1
    }
    if (!matches(cron, t))
      throw new IllegalArgumentException(
        s"cron never matches within 5 years (impossible schedule like Feb 31?)")
    Timestamp.from(t.toInstant(java.time.ZoneOffset.UTC))
  }

  private def matches(cron: Cron, t: java.time.LocalDateTime): Boolean = {
    val dowOk = cron.dow.contains(t.getDayOfWeek.getValue % 7) // ISO 1-7 Mon-Sun → 0=Sunday
    val domOk = cron.dom.contains(t.getDayOfMonth)
    val dayOk =
      if (cron.domRestricted && cron.dowRestricted) domOk || dowOk // standard cron OR
      else domOk && dowOk
    cron.minutes.contains(t.getMinute) && cron.hours.contains(t.getHour) &&
      cron.months.contains(t.getMonthValue) && dayOk
  }

  /**
   * T1 batch face — expand cron ticks over the event-time span of `df`'s
   * `tsCol`. Produces one row per matching minute. The minute grid is
   * generated distributed (sequence+explode from the aggregated bounds);
   * the cron-set membership filters are plain `isin` — codegen'd.
   */
  /** T3 — cron ticks as synthetic engine events, union-ready for the
   * rule interpreter: an OnSchedule rule is then a plain matchSingle on
   * the tick type (reference: src/Rule/OnSchedule.php:24-38 — Cron with
   * an injected closure). */
  def tickEvents(spark: SparkSession, df: DataFrame, cron: Cron,
      name: String): org.apache.spark.sql.Dataset[graft.model.Event] = {
    import spark.implicits._
    ticks(df, cron).select(
      lit(s"GRAFT:Cron:$name").as("event"),
      col("tick_ts").cast("string").as("id"),
      col("tick_ts").as("datetime"),
      lit(null).cast("timestamp").as("receivedTime"),
      map(lit("key"), lit(name)).as("payload"))
      .as[graft.model.Event]
  }

  def ticks(df: DataFrame, cron: Cron, tsCol: String = "ts"): DataFrame = {
    val bounds = df.agg(
      date_trunc("minute", min(col(tsCol))).as("lo"),
      date_trunc("minute", max(col(tsCol))).as("hi"))
    val grid = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MINUTE"))).as("tick_ts"))
    grid.filter(cronMatch(cron, col("tick_ts")))
  }

  /**
   * T1 with a per-rule timezone (reference: src/Rule/Cron.php carries a
   * DateTimeZone per rule — schedules like "9am daily" mean LOCAL 9am):
   * the minute grid stays UTC; the cron fields are evaluated on the
   * wall-clock time in `tz`. Returns both the UTC tick and the local
   * wall time. DST is handled by the tz database on both engines.
   */
  def ticksTz(df: DataFrame, cron: Cron, tz: String, tsCol: String = "ts"): DataFrame = {
    val bounds = df.agg(
      date_trunc("minute", min(col(tsCol))).as("lo"),
      date_trunc("minute", max(col(tsCol))).as("hi"))
    val grid = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MINUTE"))).as("tick_ts"))
      .withColumn("local_ts", from_utc_timestamp(col("tick_ts"), tz))
    grid.filter(cronMatch(cron, col("local_ts")))
  }

  /**
   * T1/T3 streaming face — LIVE cron ticks emitted into a running
   * query (reference: src/Rule/Cron.php:97-132 arms a wall-clock timer
   * on getNextRunDate and re-arms after each fire; catch-up: every due
   * tick fires when the clock advances past it, one alarm per
   * scheduled minute). `clock` is any streaming DataFrame with a
   * timestamp column — `spark.readStream.format("rate")` in
   * production (1 row/s is plenty), a MemoryStream in tests — so the
   * tick cadence is testable with a virtual clock, exactly like the
   * reference's batch/live dual clock.
   *
   * Stateful catch-up: one tiny flatMapGroupsWithState group per rule
   * name remembers the last minute inspected; each micro-batch emits
   * every cron-matching minute between that cursor and the batch's max
   * clock reading (so a clock jump fires all intermediate due ticks,
   * mirroring the reference's repeated timeout-fire-and-re-arm on
   * clock advance). The group is metadata-scale — clock rows per
   * trigger number in the seconds, never data-scale — so the single
   * group is not a shuffle bottleneck. The first batch includes its
   * own starting minute when it matches, consistent with the batch
   * [[ticks]] grid face.
   *
   * `tz`: cron fields are evaluated on the wall clock in `tz` (ticks
   * are emitted as UTC instants), like [[ticksTz]]. Jumps larger than
   * `maxCatchupMinutes` catch up only the trailing window (a bounded
   * replay valve; use the batch face for historical spans).
   *
   * Output events are union-ready with the rule interpreter's input:
   * an OnSchedule rule is a matchSingle on `GRAFT:Cron:$name`
   * (reference: src/Rule/OnSchedule.php:24-38).
   */
  def tickStream(clock: DataFrame, cron: Cron, name: String,
      tz: String = "UTC", tsCol: String = "timestamp",
      maxCatchupMinutes: Int = 10080): org.apache.spark.sql.Dataset[graft.model.Event] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = clock.sparkSession
    import spark.implicits._
    val zone = java.time.ZoneId.of(tz)
    // id must render like the batch face's `tick_ts.cast("string")` —
    // the SESSION timezone, captured at plan time as a string (ZoneId/
    // DateTimeFormatter are not serializable into the closure);
    // Timestamp.toString would use the executor JVM's default zone
    // (and append ".0"), breaking batch/streaming id equality across
    // machines
    val idZoneId = spark.sessionState.conf.sessionLocalTimeZone
    clock.select(col(tsCol).cast("timestamp")).as[Timestamp]
      .groupByKey(_ => name)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (n: String, it: Iterator[Timestamp], state: GroupState[Long]) => {
          val readings = it.map(_.getTime).toVector
          if (readings.isEmpty) Iterator.empty
          else {
            val minuteMs = 60000L
            val hi = math.floorDiv(readings.max, minuteMs) * minuteMs
            val firstMinute = math.floorDiv(readings.min, minuteMs) * minuteMs
            // cursor = last minute already inspected (exclusive)
            val cursor = state.getOption.getOrElse(firstMinute - minuteMs)
            val from = math.max(cursor, hi - maxCatchupMinutes.toLong * minuteMs)
            val ticks = Iterator.iterate(from + minuteMs)(_ + minuteMs)
              .takeWhile(_ <= hi)
              .filter { m =>
                val local = java.time.Instant.ofEpochMilli(m).atZone(zone).toLocalDateTime
                matches(cron, local)
              }
              .map(new Timestamp(_))
              .toVector
            if (hi > cursor) state.update(hi)
            val idFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
              .withZone(java.time.ZoneId.of(idZoneId))
            ticks.iterator.map { t =>
              val id = idFmt.format(java.time.Instant.ofEpochMilli(t.getTime))
              graft.model.Event(s"GRAFT:Cron:$name", Some(id), t, None,
                Map("key" -> name))
            }
          }
        })
  }

  /** Cron-set membership of one (wall-clock) timestamp column — plain
   * isin filters, codegen'd. */
  private def cronMatch(cron: Cron, t: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dowCol = dayofweek(t) - 1 // Spark: 1=Sunday..7 → 0=Sunday..6
    val dayPred =
      if (cron.domRestricted && cron.dowRestricted)
        dayofmonth(t).isin(cron.dom.toSeq: _*) || dowCol.isin(cron.dow.toSeq: _*)
      else
        dayofmonth(t).isin(cron.dom.toSeq: _*) && dowCol.isin(cron.dow.toSeq: _*)
    minute(t).isin(cron.minutes.toSeq: _*) &&
      hour(t).isin(cron.hours.toSeq: _*) &&
      month(t).isin(cron.months.toSeq: _*) &&
      dayPred
  }
}
