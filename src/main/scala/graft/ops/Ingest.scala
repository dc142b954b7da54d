package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ingest-time filtering: the composition a training-data pipeline runs
 * on raw documents BEFORE anything expensive touches them — language
 * gate, quality gate, then exact dedup. The point of gating at ingest
 * is scale economics: every downstream pass (minhash, embeddings,
 * scoring) pays per surviving byte, so the cheap map-side filters run
 * first and the corpus shrinks before its first shuffle.
 *
 * The same code runs batch and streaming: the gate is pure stateless
 * projections/filters (stream-safe by construction), and the dedup
 * stage picks the engine-appropriate form — groupBy on the content
 * hash in batch, watermark-bounded dropDuplicates in streaming
 * ([[Dedup.streamingExactDedup]]). This mirrors the reference's
 * ValidateEnrichFilter → Suppress chain at event ingest (reference:
 * src/Rule/ValidateEnrichFilter.php:39-91, suppress
 * src/CorrelationEngine.php:230-236) lifted to document corpora.
 */
object Ingest {

  /**
   * Stateless quality gate: keep documents whose predicted language is
   * in `langs` and whose quality score clears `minQuality`. All input
   * columns pass through, annotated with the two gate signals.
   * Map-side only — no shuffle, no state; safe on batch and streaming
   * DataFrames alike.
   */
  def qualityGate(docs: DataFrame, minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en")): DataFrame = {
    // The expensive signals (split + marker scans + punctuation regex)
    // are computed ONCE per row behind a Generate barrier —
    // explode(array(struct)) emits exactly one row and predicates
    // cannot push below a generator, so neither predicate pushdown nor
    // the CASE chain's conditional branches (which codegen's
    // subexpression elimination skips) can re-evaluate them. The
    // language argmax then runs over the materialised hit counts
    // (cheap int compares). Measured 5.7s → 0.7s on the 100k-doc probe
    // vs inlining TextAnalysis.predictedLangCol into the filter.
    val sig = struct(
      graft.functions.Texts.markerHits(
        split(col("text"), " "), TextAnalysis.langMarkers.map(_._2)).as("mh"),
      TextAnalysis.qualityScoreCol(col("text")).as("q"))
    val idx = TextAnalysis.langMarkers.map(_._1).zipWithIndex.toMap
    docs
      .withColumn("_sig", explode(array(sig)))
      .withColumn("predicted_lang",
        TextAnalysis.predictedFromHits(l => element_at(col("_sig.mh"), idx(l) + 1)))
      .withColumn("quality_score", col("_sig.q"))
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang").isin(langs: _*))
      .drop("_sig")
  }

  /**
   * Batch ingest: gate, then keep ONE document per distinct content
   * (lowest doc_id wins — deterministic). One shuffle on the content
   * hash, after the gate has already shrunk the corpus. The canonical
   * pick is a row_number window, not aggregate-then-join-back: the
   * join form re-evaluates the gate lineage on both sides (measured 4×
   * slower at 100k docs in ScaleProbe), the window form evaluates it
   * once and shuffles it once.
   */
  def runBatch(docs: DataFrame, minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    qualityGate(docs, minQuality, langs)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /**
   * Streaming ingest: the same gate composed with watermark-bounded
   * exact dedup — first-arrival wins within the `delay` horizon and
   * state stays bounded. `docs` must carry a `ts` event-time column.
   * The dedup helper's internal hash column is dropped so the batch
   * and streaming faces emit the SAME schema (input columns +
   * predicted_lang + quality_score).
   */
  def runStreaming(docs: DataFrame, minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en"), delay: String = "10 minutes"): DataFrame =
    Dedup.streamingExactDedup(qualityGate(docs, minQuality, langs), delay)
      .drop("text_md5")

  /**
   * Streaming NEAR-dedup against a growing index — the streaming face
   * of the incremental dedup workflow: per micro-batch,
   *  (1) documents with a banded near-dup already in the INDEX are
   *      dropped FIRST (before within-batch canonical selection — the
   *      other order loses a whole within-batch cluster whenever only
   *      its canonical matches the index);
   *  (2) the survivors collapse within-batch to one canonical per
   *      cluster via [[Dedup.applyNearDedup]];
   *  (3) admitted documents land under `outDir/batch_id=N` and their
   *      signature + band rows under `indexDir/sig|bands/batch_id=N`
   *      — so later batches dedup against everything admitted so far.
   *      The per-batch-id OVERWRITE makes a replayed trigger (crash
   *      between the writes and the checkpoint commit) idempotent:
   *      at-least-once execution, exactly-once corpus.
   *
   * Scale shape: the index stores one compact signature row AND its
   * precomputed band rows per admitted doc — nothing indexed is ever
   * re-shingled or re-banded; a trigger's join probes the stored band
   * table with O(batch · bands) rows. (At very large index sizes,
   * persist the band table bucketed by band_hash via saveAsTable so
   * the probe prunes to the buckets the batch hits.) Empty triggers
   * write nothing (no file-count bloat).
   */
  def runStreamingNearDedup(docs: DataFrame, indexDir: String, outDir: String,
      checkpoint: String, shingleSize: Int = 3, bands: Int = 20,
      rowsPerBand: Int = 2, threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // index layout: indexDir/sig/batch_id=N + indexDir/bands/batch_id=N
        val sigDir = s"$indexDir/sig"
        val bandDir = s"$indexDir/bands"
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // BOTH halves must exist: a crash during the very first
        // admitting batch can leave one written without the other, and
        // treating that torn state as "no index" lets the replay
        // rebuild both (there was no earlier index to lose)
        val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(sigDir)) &&
          fs.exists(new org.apache.hadoop.fs.Path(bandDir))
        // the whole batch's signatures, computed ONCE: index probe +
        // both verify sides + the within-batch pair finder + the
        // admitted signature append all derive from this table
        val batchSig = Dedup.signatureTable(batch, shingleSize, bands * rowsPerBand)
          .localCheckpoint()
        val survivorIds =
          if (!hasIndex) batchSig.select("doc_id")
          else {
            // exclude THIS batch id from the index reads: a replayed
            // trigger (crash after the writes, before the checkpoint
            // commit) must not match its own just-written rows
            val idxBands = spark.read.parquet(bandDir)
              .filter(col("batch_id") =!= batchId)
              .select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
            val idxSig = spark.read.parquet(sigDir)
              .filter(col("batch_id") =!= batchId)
            val cand = Dedup.bandsOf(batchSig, bands, rowsPerBand)
              .withColumnRenamed("doc_id", "doc_a")
              .join(idxBands, Seq("band_idx", "band_hash"))
              .select("doc_a", "doc_b")
              .dropDuplicates("doc_a", "doc_b")
            val dupIds = Dedup.verifyJaccard(cand, batchSig, idxSig, threshold)
              .select(col("doc_a").as("doc_id")).distinct()
            batchSig.select("doc_id").join(dupIds, Seq("doc_id"), "left_anti")
          }
        // within-batch canonical selection among index-survivors, pairs
        // derived from the SAME signature table (no re-shingling)
        val survivorsSig = batchSig
          .join(survivorIds, Seq("doc_id"), "left_semi")
          .localCheckpoint() // feeds pair finding, verify, and the index append
        val sa = Dedup.bandsOf(survivorsSig, bands, rowsPerBand)
          .withColumnRenamed("doc_id", "doc_a")
        val sb = sa.select(col("band_idx"), col("band_hash"), col("doc_a").as("doc_b"))
        val withinPairs = Dedup.verifyJaccard(
          sa.join(sb, Seq("band_idx", "band_hash"))
            .filter(col("doc_a") < col("doc_b"))
            .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b"),
          survivorsSig, survivorsSig, threshold)
        val admitted = Dedup.applyNearDedup(
          batch.join(survivorIds, Seq("doc_id"), "left_semi"), withinPairs)
          .localCheckpoint()
        if (!admitted.isEmpty) {
          val admittedSig = survivorsSig
            .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
            .localCheckpoint() // two writes below; severs the sigDir read
          admitted.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          admittedSig.write.mode("overwrite").parquet(s"$sigDir/batch_id=$batchId")
          Dedup.bandsOf(admittedSig, bands, rowsPerBand)
            .write.mode("overwrite").parquet(s"$bandDir/batch_id=$batchId")
        }
        ()
      }
      .start()
}
