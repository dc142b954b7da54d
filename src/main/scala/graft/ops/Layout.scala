package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Storage-layout operators: bucketed persistence for shuffle-free
 * repeated joins and aggregations.
 *
 * The reference is a single process and has no storage layout at all;
 * at 100 TB the layout IS the optimisation: a fact table that is
 * joined/grouped on the same key by every downstream query should be
 * written bucketed on that key ONCE, so every subsequent sort-merge
 * join or aggregation on the key runs with ZERO exchange — the
 * one-time shuffle at write time is amortised across all consumers.
 * (This is the batch analogue of the reference keeping per-key matcher
 * state partitioned in memory — reference: src/CorrelationEngine.php:74-79
 * keys its matcher index by event type once and reuses it per event.)
 *
 * Verified in LayoutSpec: joining two tables bucketed on the same key
 * with the same bucket count produces a physical plan with no
 * ShuffleExchange on either side.
 */
object Layout {

  /**
   * Persist `df` as a parquet table bucketed and sorted by `key` at
   * `path`. Bucketing metadata lives in the session catalog (on a real
   * deployment: the metastore), which is what lets the planner elide
   * the exchange for joins/aggregations keyed on `key`.
   *
   * Bucket count is a layout decision: pick it so one bucket of the
   * LARGEST co-located table fits an executor's shuffle memory
   * (e.g. ~256 MB/bucket at 100 TB ⇒ O(100k) buckets); all tables
   * joined together must share key AND bucket count.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed catalog tables on their bucket key —
   * plans as a sort-merge join with no exchange (asserted in
   * LayoutSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
