package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Derived-metric operators (SURVEY.md §2.5): the reference's EPS ring
 * buffer, load averages, statistics counters, histograms, event-chain
 * accessors and the recent-event log, re-expressed as declarative
 * aggregations.
 *
 * Scale notes: every aggregation here benefits from partial (map-side)
 * aggregation; the per-bucket cardinalities (seconds, buckets,
 * event types) are tiny relative to input, so the shuffle after partial
 * agg carries only the reduced stream.
 */
object Metrics {

  /**
   * Order-independent exact sum for fixed-decimal data: casting each
   * row to DECIMAL before summing makes the aggregate integer-scaled
   * (associative, no float drift), so results hash-match the DuckDB
   * oracle regardless of partitioning/summation order. Cast back to
   * double for a stable output schema.
   */
  def exactSum(c: Column, scale: Int): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale))).cast("double")

  /**
   * A1 — EPS counter (reference: src/Counter.php:128-236): events per
   * time bucket. The ring buffer becomes a groupBy on the truncated
   * timestamp; `bucket` is a date_trunc unit ("second", "minute", ...).
   */
  def epsCounter(events: DataFrame, bucket: String = "minute"): DataFrame =
    events
      .groupBy(date_trunc(bucket, col("ts")).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"))

  /**
   * A2 — Load averages (reference: src/CorrelationEngine.php:802-813):
   * sliding mean event-rate over the trailing `slots` buckets. The
   * reference zero-fills skipped ring slots (src/Counter.php:150-170),
   * so we densify with `sequence()` before the sliding window.
   */
  def loadAverage(events: DataFrame, slots: Int = 60): DataFrame = {
    val perMinute = epsCounter(events, "minute")
    val bounds = perMinute.agg(
      min("bucket_ts").as("lo"), max("bucket_ts").as("hi"))
    val dense = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MINUTE"))).as("bucket_ts"))
    val w = Window.orderBy("bucket_ts").rowsBetween(-(slots - 1), Window.currentRow)
    dense
      .join(perMinute, Seq("bucket_ts"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("load_avg", round(avg("n_events").over(w), 6))
  }

  /**
   * A3 — Statistics counters (reference: src/CorrelationEngine.php:790-796):
   * monotonic per-group counters (`seen`, per-type counts). Batch face:
   * counts per event_type plus total value stats.
   */
  def statistics(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("seen"),
        count(col("value")).as("with_value"),
        exactSum(col("value"), 2).as("sum_value"))

  /**
   * A5 — Power-of-two histogram (reference: src/Library/Histogram.php:124-158):
   * bucket = smallest power of two >= value, clamped to [minBucket, maxBucket]
   * (reference buckets 64..1048576 for packet sizes).
   */
  def pow2Bucket(v: Column, minBucket: Long = 64L, maxBucket: Long = 1048576L): Column =
    least(
      greatest(pow(lit(2.0), ceil(log2(greatest(v, lit(1.0))))).cast("bigint"), lit(minBucket)),
      lit(maxBucket))

  def histogram(df: DataFrame, valueCol: String,
      minBucket: Long = 64L, maxBucket: Long = 1048576L): DataFrame =
    df.groupBy(pow2Bucket(col(valueCol), minBucket, maxBucket).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /**
   * A6 — Event-chain accessors (reference:
   * src/StateMachine/AEventProcessor.php:267-350): first/last event and
   * timestamps over each key's consumed chain; `min_by`/`max_by` keep it
   * a single aggregation pass (no window + filter round trip).
   * Ties broken by event_id via struct ordering — deterministic.
   */
  def chainAccessors(events: DataFrame, key: String = "user_id"): DataFrame =
    events.groupBy(col(key))
      .agg(
        count(lit(1)).as("chain_len"),
        min("ts").as("first_ts"),
        max("ts").as("last_ts"),
        min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
        max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("last_event_id"),
        min(when(col("event_type") === "error", col("ts"))).as("first_error_ts"))

  /**
   * A7 — trimEventChain (reference:
   * src/StateMachine/AEventProcessor.php:321-332): bounded trailing
   * buffer of the last N events per key — batch face: trailing-frame
   * window aggregate (rows between -(n-1) and current).
   */
  def trailingChain(events: DataFrame, n: Int, key: String = "user_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(n - 1), Window.currentRow)
    events.select(
      col(key), col("event_id"), col("ts"),
      count(lit(1)).over(w).as("chain_size"),
      sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .over(w).cast("double").as("chain_sum_value"))
  }

  /**
   * A4 — MetricsCollector (reference: src/Scheduler/MetricsCollector
   * .php:279-333, periodic gauge/counter snapshots): Spark-native form
   * is `Dataset.observe` — metrics ride the existing job, no extra
   * pass. Use the returned Observation after an action:
   * `obs.get("seen")`. Streaming: the same metrics appear per batch in
   * StreamingQueryProgress.observedMetrics.
   */
  def observed(df: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame =
    df.observe(obs,
      count(lit(1)).as("seen"),
      count(col("value")).as("with_value"),
      exactSum(col("value"), 2).as("sum_value"))

  /**
   * A8 — EventLog: the last `n` events engine-wide (reference:
   * src/Library/EventLog.php:94-116, bounded FIFO of 100). TakeOrdered
   * physical op — no full sort at scale.
   */
  def recentEvents(events: DataFrame, n: Int = 100): DataFrame =
    events
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(n)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

  /**
   * J4/A7 content face — the final trimmed chain per key: the ids of
   * the last `n` events in order, as a matcher's bounded buffer would
   * hold them after consuming the stream (reference: trimEventChain,
   * src/StateMachine/AEventProcessor.php:321-332 + continuous
   * consumption src/Rule/MatchSingleContinuously.php:21-43). A running
   * trailing-frame string aggregate, keeping each key's LAST row — one
   * window pass, no per-key collect.
   */
  def lastChainState(events: DataFrame, n: Int = 3, key: String = "user_id"): DataFrame = {
    val wAsc = Window.partitionBy(col(key)).orderBy(col("ts"), col("event_id"))
    val wChain = wAsc.rowsBetween(-(n - 1), Window.currentRow)
    // whole-partition frame shares the ascending sort (computed once per
    // partition) — cheaper than a second, descending sort for "is last"
    val wAll = Window.partitionBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("chain_ids",
        array_join(collect_list(col("event_id").cast("string")).over(wChain), ","))
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("rn") === col("cnt"))
      .select(col(key), col("chain_ids"),
        col("ts").as("last_ts"))
  }

  /**
   * Exact value percentiles per group: the distribution face of the
   * statistics counters (reference keeps only monotonic counts,
   * src/CorrelationEngine.php:790-796; an analytics engine needs the
   * quantiles too). Uses Spark's exact `percentile` aggregate
   * (sort-based partial aggregation, one shuffle on the group key);
   * linear-interpolation definition is shared with DuckDB's
   * quantile_cont, so results hash-match after 6-dp rounding. At
   * extreme cardinality swap in approx_percentile (t-digest sketch,
   * mergeable map-side) — the exact form is the oracle baseline.
   */
  def percentiles(events: DataFrame,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    events.groupBy(col("event_type"))
      .agg(percentile(col("value"), array(ps.map(lit): _*)).as("qs"))
      .select(col("event_type"),
        posexplode(col("qs")).as(Seq("pos", "q")))
      .select(col("event_type"),
        array(ps.map(lit): _*).getItem(col("pos")).as("p"),
        round(col("q"), 6).as("q"))
}
