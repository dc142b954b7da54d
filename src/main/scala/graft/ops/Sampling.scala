package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling/splitting for training-data pipelines. All
 * decisions are HASH-based (mdhash of a stable key), not RNG-based:
 * the same row lands in the same sample/split on every engine, every
 * run, every partitioning — which is what makes 100 TB pipelines
 * reproducible, incremental (new data doesn't reshuffle old
 * assignments), and oracle-checkable. Pure map-side filters: no
 * shuffle, no driver state, fully codegen'd.
 */
object Sampling {

  /** Hash of the sampling key folded into [0, 1e6) — the decision
   * space for rates with micro precision. */
  private def bucket(key: Column): Column =
    pmod(Dedup.mdhash(key.cast("string")), lit(1000000L))

  /**
   * Deterministic sample: keep rows whose key hash falls below `rate`.
   * Unlike `df.sample()` (partition-order-dependent RNG), membership
   * is a pure function of the key.
   */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(bucket(key) < lit(math.round(rate * 1e6)))

  /**
   * Stratified sample with per-stratum rates (e.g. language
   * rebalancing / temperature sampling: upweight low-resource
   * languages by giving them higher keep rates). Unlisted strata fall
   * back to `defaultRate`.
   */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rateCol = rates.foldLeft(lit(math.round(defaultRate * 1e6))) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * 1e6))).otherwise(acc)
    }
    df.filter(bucket(key) < rateCol)
  }

  /**
   * Deterministic train/val/test split on a percent grid: same key →
   * same split forever (documents added later never flip old
   * assignments — the property that keeps eval sets uncontaminated
   * across dataset versions).
   */
  def split(df: DataFrame, key: Column, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "train+val must fit in 100%")
    val b = pmod(Dedup.mdhash(key.cast("string")), lit(100L))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
