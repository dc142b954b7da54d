package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
   * Temperature-weighted source mixing — the APPLY stage of the
   * training-data recipe whose weights TextAnalysis.sourceMixWeights
   * reports: per-source keep rate ∝ n_tokens^(alpha−1), normalised so
   * the most up-weighted source keeps everything, which makes the
   * EXPECTED sampled token mass per source ∝ n_tokens^alpha (the
   * standard temperature-resampling used to rebalance multilingual /
   * multi-source corpora; alpha < 1 up-weights small sources).
   * Rates are derived from one tiny per-source aggregate and
   * broadcast back; the keep decision is the same deterministic
   * key-hash filter as [[hashSample]] — map-side, reproducible,
   * incremental. Output: kept rows' (doc_id, source, keep_rate).
   */
  def weightedMixSample(documents: DataFrame, key: Column,
      alpha: Double = 0.5): DataFrame = {
    val per = documents.groupBy("source")
      // functions.split qualified: this object's own `split` (the
      // train/val/test splitter) shadows it
      .agg(sum(size(org.apache.spark.sql.functions.split(col("text"), " "))
        .cast("long")).as("n_tokens"))
    // w_raw rounded before the ratio, the ratio rounded before the
    // micro-rate: every float crossing an engine boundary is pinned,
    // so the DuckDB oracle reproduces identical keep decisions
    val w = per.withColumn("w_raw",
      round(pow(col("n_tokens").cast("double"), lit(alpha - 1)), 9))
    val maxW = w.agg(max("w_raw").as("w_max"))
    val rates = w.crossJoin(broadcast(maxW))
      .select(col("source"), round(col("w_raw") / col("w_max"), 6).as("keep_rate"))
    documents.join(broadcast(rates), "source")
      .filter(bucket(key) < round(col("keep_rate") * 1e6).cast("long"))
      .select(col("doc_id"), col("source"), col("keep_rate"))
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

  /**
   * Leakage-safe train/val/test split: near-duplicate documents must
   * never straddle a split boundary (a val doc whose near-copy sits in
   * train contaminates the eval), so the split key is the near-dup
   * CLUSTER label — every member of a cluster hashes identically,
   * singleton docs hash on their own id. Same percent-grid stability
   * as [[split]]: adding documents later can merge clusters (which
   * re-keys only THOSE docs) but never flips an untouched doc's
   * assignment.
   *
   * Scale shape: `pairs` comes from any banded finder (no all-pairs);
   * [[Dedup.duplicateClusters]] is the O(log diameter) min-label CC;
   * the label join shuffles on doc_id once (AQE broadcasts it when the
   * clustered subset is small — typical, since most docs are
   * singletons and absent from the label table); the split itself
   * stays a map-side hash.
   */
  def clusterSplit(documents: DataFrame, pairs: DataFrame,
      trainPct: Int = 90, valPct: Int = 5): DataFrame =
    split(
      documents.join(Dedup.duplicateClusters(pairs), Seq("doc_id"), "left")
        .withColumn("group_key", coalesce(col("cluster"), col("doc_id"))),
      col("group_key"), trainPct, valPct)
      .select(col("doc_id"), col("group_key"), col("split"))

  /**
   * Deterministic per-stratum cap: at most `n` documents per source,
   * picked in stable key-hash order — a uniform-without-replacement
   * subsample whose membership never changes as unrelated documents
   * arrive (the dominance control applied before mixing, so no single
   * source can swamp the corpus regardless of its raw size).
   *
   * Plan: one window shuffle keyed by source. The rank orders by
   * (hash, doc_id), so the kept set is reproducible on any engine and
   * any partitioning; `pick` is the stable within-source sample index
   * (pick <= m gives a nested smaller sample for every m < n).
   */
  def perSourceCap(documents: DataFrame, n: Int = 10): DataFrame = {
    val w = Window.partitionBy("source").orderBy(bucket(col("doc_id")), col("doc_id"))
    documents
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= n)
      .select(col("doc_id"), col("source"), col("pick"))
  }

  /**
   * Deterministic global shuffle + re-shard — the "shuffle the corpus
   * before training" step: every document gets a pseudorandom shard
   * and a pseudorandom position within it, both pure functions of
   * (seed, doc_id), so the permutation is reproducible, resumable,
   * and stable under re-runs (unlike `df.orderBy(rand())`, whose
   * result depends on the partitioning of the moment).
   *
   * Plan: shard assignment is map-side hash arithmetic — NO global
   * sort, no single-partition window (the classic scale trap for
   * "shuffle" is a global row_number). The only shuffle is one window
   * keyed by shard for the within-shard position; with nShards at or
   * above cluster parallelism each shard is a bounded slice of the
   * corpus (100 TB / nShards), the same unit a shard writer holds
   * anyway.
   */
  def shuffleShards(documents: DataFrame, nShards: Int = 64, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"),
        Dedup.mdhash(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /**
   * Contiguous token-budget shards: documents are assigned, in
   * (source, doc_id) order, to shards of ~`capacity` whitespace
   * tokens — the deterministic packing step that cuts a corpus into
   * equal-token training shards (shard = ⌊tokens-before-me /
   * capacity⌋, so every shard except a source's last holds at least
   * `capacity` tokens and assignments never change when later docs
   * arrive).
   *
   * Plan: one running-sum window partitioned by source — the
   * per-source sequential semantics IS the operator, so the partition
   * key is the contract, not a skew accident. At extreme per-source
   * scale the same operator composes with a finer partition key
   * (source, day): packing is order-local, nothing global.
   */
  def tokenShards(documents: DataFrame, capacity: Long = 500L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("source"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n_tokens"))
      .withColumn("shard",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(capacity)).cast("int"))
  }

  /**
   * Concat-and-chunk sequence packing — the standard pretraining
   * packing: per source, documents are conceptually concatenated in
   * doc_id order and cut into fixed `window`-token training sequences,
   * so a document that straddles a cut contributes a SPAN to each
   * sequence it touches (unlike [[tokenShards]], which moves whole
   * documents). Emits one row per (doc, sequence) span:
   * `seq_id` (per-source sequence number), `tok_start`/`tok_end` (the
   * span inside the doc, end-exclusive) and `seq_off` (where the span
   * begins inside the sequence). Every sequence except a source's last
   * is exactly `window` tokens, no padding — reassembling the spans
   * per seq_id reconstructs the concatenated stream.
   *
   * Plan: one running-sum window per source (the sequential semantics
   * IS the contract, as in [[tokenShards]]) + a map-side explode of
   * each doc's touched-sequence range — pure integer arithmetic,
   * no second shuffle, output rows = docs + cut-crossings.
   *
   * Per-source ceiling (measured): the whole corpus in ONE source —
   * the worst skew the contract admits — still packs ~1.8M docs/s
   * through the single window partition (ScaleProbe `pack_one_source`:
   * 10M docs, 5.6 s, local[32]; the window sort + running sum are the
   * serial cost). A source above that budget composes the key to
   * (source, day): packing is order-local, nothing global.
   */
  def packSequences(documents: DataFrame, window: Long = 512L): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("source"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("c0", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        expr(s"c0 div $window"), expr(s"(c0 + n_tokens - 1) div $window"))))
      .withColumn("seq_start", col("seq_id") * window)
      .withColumn("tok_start", greatest(lit(0L), col("seq_start") - col("c0")))
      .withColumn("tok_end",
        least(col("n_tokens"), col("seq_start") + window - col("c0")))
      .withColumn("seq_off", greatest(lit(0L), col("c0") - col("seq_start")))
      .select(col("source"), col("seq_id"), col("doc_id"),
        col("n_tokens"), col("tok_start"), col("tok_end"), col("seq_off"))
  }

  /**
   * Deterministic fractional oversampling (repeat-factor epoch
   * mixing): each document in source `s` appears `r(s)` times in the
   * training epoch — `floor(r)` whole copies plus one more iff the
   * key-hash fraction falls below `frac(r)`, so the EXPECTED copy
   * count is exactly `r` while membership stays a pure function of
   * the key (the up-sampling half of the mixing recipe whose
   * down-sampling half is [[weightedMixSample]]; weights above 1
   * replicate, weights below 1 subsample, both from the same
   * deterministic hash). Output one row per copy:
   * (doc_id, source, n_copies, copy_idx).
   *
   * Scale shape: a map-side projection + explode — no shuffle, no
   * state; output rows = Σ copies. Weights arrive as a literal
   * per-source map folded into one when/otherwise column (the same
   * broadcast-free shape as [[stratifiedHashSample]]).
   */
  def repeatFactorSample(documents: DataFrame, key: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "repeat factors must be non-negative")
    val wCol = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, r)) => when(col("source") === s, lit(r)).otherwise(acc)
    }
    documents
      .withColumn("n_copies",
        (floor(wCol).cast("long") +
          when(bucket(key) < round((wCol - floor(wCol)) * 1e6).cast("long"), 1L)
            .otherwise(0L)).cast("long"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
  }

  /** One packed span: [[packSequences]]' output row shape, shared by
   * the batch and streaming faces. */
  case class PackedSpan(source: String, seq_id: Long, doc_id: Long,
      n_tokens: Long, tok_start: Long, tok_end: Long, seq_off: Long)

  /**
   * Streaming face of [[packSequences]]: the per-source token cursor
   * lives in 8 bytes of group state, so an unbounded document stream
   * packs into the same fixed-window sequences with no growing state
   * and no retraction — spans are append-only, each micro-batch
   * extends the concatenated stream where the last one stopped.
   * Within a trigger, documents pack in doc_id order; ACROSS triggers
   * the arrival order is the packing order (the same append-only
   * input contract as the retention streaming face). When documents
   * arrive in doc_id order the output equals the batch face exactly
   * (parity-pinned in SamplingSpec).
   *
   * Scale shape: one keyed shuffle per trigger (by source — the
   * sequential packing semantics IS the partition contract, as in the
   * batch face), state is one Long per source, output rows =
   * docs + cut-crossings.
   */
  def packSequencesStreaming(documents: DataFrame,
      window: Long = 512L): org.apache.spark.sql.Dataset[PackedSpan] = {
    require(window > 0, s"window must be positive: $window")
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("source"), col("doc_id").cast("long"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, it: Iterator[(String, Long, Long)], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = it.toVector.sortBy(_._2).iterator.flatMap { case (_, docId, n) =>
            if (n <= 0) Iterator.empty
            else {
              val c0 = cum
              cum += n
              (c0 / window to (c0 + n - 1) / window).iterator.map { seq =>
                val seqStart = seq * window
                PackedSpan(source, seq, docId, n,
                  tok_start = math.max(0L, seqStart - c0),
                  tok_end = math.min(n, seqStart + window - c0),
                  seq_off = math.max(0L, c0 - seqStart))
              }
            }
          }.toVector
          state.update(cum)
          out.iterator
        })
  }
}
