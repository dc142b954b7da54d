package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec

/**
 * Streaming faces of the shard-list walkers: the locator tables are
 * stateless partition-local mapPartitions transforms, so the SAME
 * function body runs on a file-source stream over a growing media
 * directory — the q_x16 ingest pattern for media corpora. Each test
 * feeds two arrival waves into a directory and asserts the streamed
 * shard list equals the batch walk over the final directory
 * (batch-equivalence: no rows lost at the trigger boundary, no state
 * needed, blobs stay partition-local per micro-batch).
 */
class ShardListStreamSpec extends SparkSpec {

  private val mediaSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "media_id BIGINT, mime_type STRING, media BINARY")

  private def writeWave(dir: String, rows: Seq[(Long, String, Array[Byte])]): Unit = {
    import spark.implicits._
    rows.toDF("media_id", "mime_type", "media")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** Run `table` over a 2-wave stream of `rows`; return the sink name. */
  private def streamed(name: String, rows: Seq[(Long, String, Array[Byte])],
      table: (SparkSession, DataFrame) => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"shardstream_$name").toString
    val (w1, w2) = rows.splitAt(rows.size / 2)
    writeWave(dir, w1)
    val in = spark.readStream.schema(mediaSchema).parquet(dir)
    val query = table(spark, in)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      query.processAllAvailable()
      writeWave(dir, w2) // second arrival wave: the directory GROWS
      query.processAllAvailable()
    } finally query.stop()
    // batch-equivalence oracle: the same walker over the final dir
    val batch = table(spark, spark.read.schema(mediaSchema).parquet(dir))
    val got = spark.table(name).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = batch.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty, s"$name: streamed no rows")
    assert(got.toSeq == want.toSeq, s"$name: streamed != batch")
    name
  }

  test("streamed MP4 keyframe locator equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.AvcMp4Fixture.row(id)
      (id, mime, bytes)
    }
    streamed("kf_stream", rows, Multimodal.mp4KeyframeTable)
  }

  test("streamed Ogg page locator equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.OggFixture.row(id)
      (id, mime, bytes)
    }
    streamed("ogg_stream", rows, Multimodal.oggPageTable)
  }

  test("streamed WebM block locator equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WebmFixture.row(id)
      (id, mime, bytes)
    }
    streamed("webm_stream", rows, Multimodal.webmBlockTable)
  }

  test("streamed animated-WebP frame table equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.AnimWebpFixture.row(id)
      (id, mime, bytes)
    }
    streamed("webpanim_stream", rows, Multimodal.webpAnimTable)
  }

  test("streamed TS PES locator equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.TsFixture.row(id)
      (id, mime, bytes)
    }
    streamed("ts_stream", rows, Multimodal.tsPesTable)
  }

  test("streamed WARC record walk equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("warc_stream", rows, Archives.warcRecordTable)
  }

  test("streamed warc.gz member walk equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcGzFixture.row(id)
      (id, mime, bytes)
    }
    streamed("warcgz_stream", rows, Archives.warcGzMemberTable)
  }

  test("streamed WARC HTTP split equals the batch split over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("warchttp_stream", rows, Archives.warcHttpTable)
  }

  test("streamed WET body-text extraction equals the batch extraction over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("wet_stream", rows, (s, df) =>
      Archives.warcBodyTextTable(s, df)
        .withColumn("visible_text",
          TextAnalysis.htmlVisibleText(
            org.apache.spark.sql.functions.col("body_text"))))
  }

  test("streamed warc.gz WET extraction equals the batch extraction over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcGzFixture.row(id)
      (id, mime, bytes)
    }
    streamed("wgzwet_stream", rows, Archives.warcGzBodyTextTable)
  }

  test("streamed URL rule filter equals the batch audit over the grown directory") {
    import spark.implicits._
    // the rule stage is stateless (map-side regexes + a broadcast
    // blocklist join), so it streams straight off the record walk —
    // the crawl-frontier position it holds in a live pipeline; the
    // keep-latest dedup stays a batch/COMPLETE face (windowed state)
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("urlfilter_stream", rows, (s, df) =>
      Archives.urlFilter(
        Archives.warcRecordTable(s, df)
          .filter(org.apache.spark.sql.functions.col("target_uri").isNotNull),
        Archives.defaultBlockedHosts.toDF("blocked_host")))
  }

  test("streamed URL canonicalization equals the batch rewrite over the grown directory") {
    // pure map-side rewrite: streams straight off the record walk
    // (the distinct/alias-count of q_w16 stays a batch face)
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("urlcanon_stream", rows, (s, df) =>
      Archives.urlCanonical(
        Archives.warcRecordTable(s, df)
          .filter(org.apache.spark.sql.functions.col("target_uri").isNotNull)
          .select("target_uri")))
  }

  test("streamed incremental crawl delta equals batch, and batch crawlDelta minus removed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // previous snapshot (static): ids 160-199; arriving snapshot:
    // ids 200-229. robots.txt URIs are fetched by every shard and
    // are excluded (politeness metadata, not corpus pages)
    val oldIds = (160L until 200L).filterNot(_ % 8 == 7)
    val newIds = (200L until 230L).filterNot(_ % 8 == 7)
    val oldMedia = oldIds.map(id => (id, "application/warc", graft.tools.WarcFixture.row(id)._2))
      .toDF("media_id", "mime_type", "media")
    val old = Archives.pageDigests(
        Archives.warcRecordTable(spark, oldMedia),
        Archives.warcBodyTextTable(spark, oldMedia))
      .filter(!col("target_uri").endsWith("/robots.txt"))
      .localCheckpoint()
    val rows = newIds.map(id =>
      (id, "application/warc", graft.tools.WarcFixture.row(id)._2))
    val name = streamed("delta_stream", rows, (s, df) =>
      Archives.incrementalDelta(
        Archives.pageDigestTable(s, df)
          .filter(!col("target_uri").endsWith("/robots.txt")), old))
    // semantic cross-check: for URIs with exactly ONE response fetch
    // in the new window (most of them), the streamed per-fetch delta
    // IS the batch crawlDelta without its removed set. Multi-fetch
    // URIs differ by design: the stream reports every fetch, and the
    // batch keep-latest can even select a NON-extractable fetch (a
    // 404 re-fetch of a text page), dropping the URI entirely —
    // counting ALL responses (not just text ones) captures that
    val newMedia = rows.toDF("media_id", "mime_type", "media")
    val uniq = Archives.warcRecordTable(spark, newMedia)
      .filter(org.apache.spark.sql.functions.lower(col("warc_type")) === "response" &&
        col("target_uri").isNotNull &&
        !col("target_uri").endsWith("/robots.txt"))
      .groupBy("target_uri").count().filter(col("count") === 1)
      .select("target_uri").as[String].collect().toSet
    assert(uniq.size > 50, s"expected a mostly-unique window, got ${uniq.size}")
    val batchDelta = Archives.crawlDelta(old.select("target_uri", "digest"),
        Archives.pageDigests(
          Archives.warcRecordTable(spark, newMedia),
          Archives.warcBodyTextTable(spark, newMedia))
          .filter(!col("target_uri").endsWith("/robots.txt")))
      .filter(col("status") =!= "removed")
      .select("target_uri", "old_digest", "new_digest", "status")
      .as[(String, Option[String], Option[String], String)].collect().toSet
      .filter(r => uniq(r._1))
    val streamedSet = spark.table(name)
      .select("target_uri", "old_digest", "new_digest", "status")
      .as[(String, Option[String], Option[String], String)].collect().toSet
      .filter(r => uniq(r._1))
    assert(streamedSet == batchDelta)
    assert(streamedSet.map(_._4).contains("added") &&
      streamedSet.map(_._4).contains("changed"))
  }

  test("streamed image dhash equals the batch decode over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.ImageDupFixture.row(id)
      (id, mime, bytes)
    }
    streamed("imgdhash_stream", rows, ImageHash.dhashTable)
  }

  test("streamed PDF xref walk equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.PdfFixture.row(id)
      (id, mime, bytes)
    }
    streamed("pdf_stream", rows, Archives.pdfXrefTable)
  }

  test("streamed tar member walk equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.TarFixture.row(id)
      (id, mime, bytes)
    }
    streamed("tar_stream", rows, Archives.tarMemberTable)
  }

  test("streamed ZIP entry walk equals the batch walk over the grown directory") {
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.ZipFixture.row(id)
      (id, mime, bytes)
    }
    streamed("zip_stream", rows, Archives.zipEntryTable)
  }

  test("streamed WebDataset pair table equals the batch pairing over the grown directory") {
    // unlike webdatasetSamples, the pair table groups INSIDE the
    // partition-local shard walk, so its streaming face is a plain
    // stateless transform like the walkers — append mode, no state
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.TarFixture.row(id)
      (id, mime, bytes)
    }
    streamed("wdspair_stream", rows, Archives.webdatasetPairTable)
  }

  test("streamed WebDataset sample table equals the batch grouping over the grown directory") {
    // unlike the stateless walkers, the sample table AGGREGATES
    // (groupBy media_id, sample_key) — its streaming face is a
    // streaming aggregation in COMPLETE output mode: each trigger
    // re-emits the up-to-date sample index. No watermark is needed
    // because shards arrive whole (one row = one complete tar blob),
    // so a sample's members can never straddle arrival waves; the
    // grouping state is bounded by the index rows, never the blobs.
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.TarFixture.row(id)
      (id, mime, bytes)
    }
    val dir = java.nio.file.Files.createTempDirectory("wdsstream").toString
    val (w1, w2) = rows.splitAt(rows.size / 2)
    writeWave(dir, w1)
    val in = spark.readStream.schema(mediaSchema).parquet(dir)
    val query = Archives.webdatasetSamples(Archives.tarMemberTable(spark, in))
      .writeStream.format("memory").queryName("wds_stream")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      writeWave(dir, w2)
      query.processAllAvailable()
    } finally query.stop()
    val batch = Archives.webdatasetSamples(
      Archives.tarMemberTable(spark, spark.read.schema(mediaSchema).parquet(dir)))
    val got = spark.table("wds_stream").collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = batch.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty, "wds_stream: streamed no rows")
    assert(got.toSeq == want.toSeq, "wds_stream: streamed != batch")
    // the long-key shards grouped on their full overridden names too
    assert(got.exists(_.exists {
      case s: String => s.length > 100; case _ => false }))
  }

  test("streamed robots rule parse equals the batch parse over the grown directory") {
    import org.apache.spark.sql.functions.{col, lower, regexp_extract}
    // the rule parse is a per-file FOLD (no window), so it runs
    // unchanged on the stream: shards arrive, each robots.txt body
    // yields its *-group rule rows immediately
    val rows = (0L until 12L).filter(id => id % 8 != 7).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("robots_stream", rows, (s, media) =>
      Archives.robotsRuleLines(
        Archives.warcPageTable(s, media)
          .filter(col("target_uri").endsWith("/robots.txt") &&
            col("body_text").isNotNull)
          .select(lower(regexp_extract(col("target_uri"),
            "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)).as("host"),
            col("body_text").as("body"))))
  }

  test("streamed sitemap parse equals the batch parse over the grown directory") {
    // the per-fetch parse is stateless given the ACCEPTED-URI set;
    // discovery (robots-declared ∪ well-known ∪ index children) is a
    // batch-side pass whose result joins the stream as a STATIC frame
    // (stream-static semi join, append mode). Rows mix the plain
    // well-known shape with the SitemapFixture's robots-declared
    // index + gz children
    val rows = (0L until 12L).filter(id => id % 8 != 7).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    } ++ (0L until 6L).filter(id => id % 5 != 4).map { id =>
      val (mime, bytes) = graft.tools.SitemapFixture.row(id)
      (id + 100L, mime, bytes)
    }
    val accepted = {
      import spark.implicits._
      val batchMedia = rows.toDF("media_id", "mime_type", "media")
      Archives.sitemapAcceptedUris(
        Archives.warcPageTable(spark, batchMedia)).localCheckpoint()
    }
    streamed("sitemap_stream", rows, (s, media) =>
      Archives.sitemapUrlLines(Archives.warcPageTable(s, media), accepted))
  }

  test("streamed WAT metadata equals the batch projection over the grown directory") {
    // WAT is a pure projection over the one-pass page walk — fully
    // stateless, so the same body runs append-mode unchanged
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }
    streamed("wat_stream", rows, (s, media) =>
      Archives.watMetadata(Archives.warcPageTable(s, media)))
  }

  /** Stream `table(media)` rows into a parquet INDEX accumulator via
   * foreachBatch (two arrival waves), then return (accumulated,
   * batch-over-final-directory) frames — the streaming architecture
   * for aggregation/join composites: the blob WALK streams, the
   * index-sized rows accumulate, the composite recomputes over the
   * store on a schedule. */
  private def accumulated(name: String,
      rows: Seq[(Long, String, Array[Byte])],
      table: (SparkSession, DataFrame) => DataFrame): (DataFrame, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(s"acc_src_$name").toString
    val idx = java.nio.file.Files.createTempDirectory(s"acc_idx_$name").toString
    val (w1, w2) = rows.splitAt(rows.size / 2)
    writeWave(dir, w1)
    val in = spark.readStream.schema(mediaSchema).parquet(dir)
    val query = table(spark, in).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(idx)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"acc_ck_$name").toString)
      .start()
    try {
      query.processAllAvailable()
      writeWave(dir, w2)
      query.processAllAvailable()
    } finally query.stop()
    (spark.read.parquet(idx),
      table(spark, spark.read.schema(mediaSchema).parquet(dir)))
  }

  private def assertFramesEqual(name: String, got: DataFrame, want: DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val w = want.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(g.nonEmpty, s"$name: streamed no rows")
    assert(g.toSeq == w.toSeq, s"$name: streamed != batch")
  }

  test("streamed revisit resolution equals the batch resolution (index-accumulator)") {
    // the member WALK streams (stateless, blob-local); the digest
    // aggregation + join recompute over the accumulated index rows —
    // exact equivalence because resolution is a pure function of the
    // member index, and the file source delivers each shard once
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcGzFixture.row(id)
      (id, mime, bytes)
    }
    val (idx, batchMembers) =
      accumulated("revisit", rows, Archives.warcGzMemberTable)
    assertFramesEqual("revisit_stream",
      Archives.revisitResolve(idx),
      Archives.revisitResolve(batchMembers))
  }

  test("streamed crawl candidates equal the batch frontier (derivative accumulators)") {
    import org.apache.spark.sql.functions.{col, lower}
    // three stateless derivative streams accumulate (per-fetch
    // sitemap lines, link rows, fetched URIs); the candidate
    // agg + anti-join recomputes over the stores. Duplicate sitemap
    // rows across fetches are harmless (max semantics); links arrive
    // exactly once per page
    val rows = ((0L until 12L).filter(id => id % 8 != 7).map { id =>
      val (mime, bytes) = graft.tools.WarcFixture.row(id)
      (id, mime, bytes)
    }) ++ (0L until 6L).filter(id => id % 5 != 4).map { id =>
      val (mime, bytes) = graft.tools.SitemapFixture.row(id)
      (id + 100L, mime, bytes)
    }
    val accepted = {
      import spark.implicits._
      Archives.sitemapAcceptedUris(Archives.warcPageTable(spark,
        rows.toDF("media_id", "mime_type", "media"))).localCheckpoint()
    }
    val (smIdx, smBatchPages) = accumulated("cand_sm", rows, (s, media) =>
      Archives.sitemapUrlLines(Archives.warcPageTable(s, media), accepted))
    val (lkIdx, _) = accumulated("cand_lk", rows, (s, media) =>
      Archives.linkTable(Archives.warcPageTable(s, media)
        .filter(col("body_text").isNotNull &&
          lower(col("content_type")).startsWith("text/html"))))
    val (feIdx, _) = accumulated("cand_fe", rows, (s, media) =>
      Archives.warcPageTable(s, media)
        .filter(lower(col("warc_type")) === "response" &&
          col("target_uri").isNotNull)
        .select("target_uri"))
    val want = Archives.crawlCandidates(Archives.warcPageTable(spark, {
      import spark.implicits._
      rows.toDF("media_id", "mime_type", "media")
    }))
    assertFramesEqual("candidates_stream",
      Archives.crawlCandidatesFrom(smIdx.distinct(), lkIdx, feIdx),
      want)
  }

  test("streamed charset/encoding WET rows equal the batch decode over the grown directory") {
    import org.apache.spark.sql.functions.col
    // the whole HTTP decode stack (chunked -> content-coding ->
    // BOM/meta/charset) is per-record map-side work, so it streams
    // append-mode unchanged — one face covers q_w33..q_w36's rows
    val rows = (0L until 12L).filter(id => id % 5 != 4).map { id =>
      val (mime, bytes) = graft.tools.SitemapFixture.row(id)
      (id, mime, bytes)
    }
    streamed("charset_stream", rows, (s, media) =>
      Archives.warcPageTable(s, media)
        .filter(col("target_uri").contains("/txt/"))
        .select("media_id", "target_uri", "content_type", "body_text"))
  }

  test("streamed CDX index equals the batch index over the grown directory") {
    import org.apache.spark.sql.functions.{col, lower}
    val rows = (0L until 12L).map { id =>
      val (mime, bytes) = graft.tools.WarcGzFixture.row(id)
      (id, mime, bytes)
    }
    streamed("cdx_stream", rows, (s, media) =>
      Archives.urlCanonical(
        Archives.warcGzMemberTable(s, media)
          .filter(lower(col("warc_type")).isin("response", "revisit") &&
            col("target_uri").isNotNull))
        .select(col("surt_key"), col("warc_date"), col("target_uri"),
          col("warc_type"), col("payload_digest"),
          col("media_id"), col("member_offset"),
          col("member_comp_bytes")))
  }

  test("streamed caption cue parse equals the batch parse over the grown directory") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "media_id BIGINT, kind STRING, content STRING")
    val dir = java.nio.file.Files.createTempDirectory("capstream").toString
    def wave(ids: Range): Unit =
      ids.map { i =>
        val (kind, content) = graft.tools.CaptionFixture.row(i.toLong)
        (i.toLong, kind, content)
      }.toDF("media_id", "kind", "content")
        .coalesce(1).write.mode("append").parquet(dir)
    wave(0 until 6)
    val query = Captions.cueTable(spark, spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("cue_stream").outputMode("append").start()
    try {
      query.processAllAvailable()
      wave(6 until 12)
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("cue_stream").collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = Captions.cueTable(spark, spark.read.schema(schema).parquet(dir))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  // Zstd transports: all three walkers are stateless per-blob byte
  // passes, so they stream as plain mapPartitions transforms in
  // append mode — the jsonl/warc.zst/tar.zst shard kinds of
  // ZstFixture (kind key media_id % 3).

  test("streamed jsonl shard decode equals the batch walk over the grown directory") {
    val rows = (0L until 48L).filter(_ % 3 == 0).map { id =>
      val (mime, bytes) = graft.tools.ZstFixture.row(id)
      (id, mime, bytes)
    }
    streamed("jsonlzst_stream", rows, ZstdTransport.jsonlDocTable)
  }

  test("streamed warc.zst record index equals the batch walk over the grown directory") {
    val rows = (0L until 48L).filter(_ % 3 == 1).map { id =>
      val (mime, bytes) = graft.tools.ZstFixture.row(id)
      (id, mime, bytes)
    }
    streamed("warczst_stream", rows, ZstdTransport.warcZstRecordTable)
  }

  test("streamed tar.zst member index equals the batch walk over the grown directory") {
    val rows = (0L until 48L).filter(_ % 3 == 2).map { id =>
      val (mime, bytes) = graft.tools.ZstFixture.row(id)
      (id, mime, bytes)
    }
    streamed("tarzst_stream", rows, ZstdTransport.tarZstMemberTable)
  }

  test("streamed FLAC PCM decode equals the batch walk over the grown directory") {
    // the decode is a stateless per-blob pass — same append-mode
    // batch-equivalence as every shard-list walker
    val rows = (0L until 24L).map { id =>
      val (mime, bytes) = graft.tools.FlacPcmFixture.row(id)
      (id, mime, bytes)
    }
    streamed("flacpcm_stream", rows, Flac.pcmTable)
  }

  test("streamed audio fingerprints equal the batch walk over the grown directory") {
    val rows = (0L until 24L).map { id =>
      val (mime, bytes) = graft.tools.AudioDupFixture.row(id)
      (id, mime, bytes)
    }
    streamed("audiofp_stream", rows, AudioFp.fingerprintTable)
  }

  test("streamed video re-mux signatures equal the batch walk over the grown directory") {
    val rows = (0L until 24L).map { id =>
      val (mime, bytes) = graft.tools.VideoDupFixture.row(id)
      (id, mime, bytes)
    }
    streamed("videosig_stream", rows, VideoDup.signatureTable)
  }

  test("streamed GIF animation table equals the batch walk over the grown directory") {
    val rows = (0L until 24L).map { id =>
      val (mime, bytes) = graft.tools.GifAnimFixture.row(id)
      (id, mime, bytes)
    }
    streamed("gifanim_stream", rows, Multimodal.gifAnimTable)
  }

  test("streamed GIF frame hashes equal the batch walk over the grown directory") {
    val rows = (0L until 24L).map { id =>
      val (mime, bytes) = graft.tools.GifAnimFixture.row(id)
      (id, mime, bytes)
    }
    streamed("gifhash_stream", rows, Multimodal.gifFrameHashTable)
  }

  test("streamed MP3 fingerprints equal the batch walk over the grown directory") {
    // the Layer III decode is a stateless per-blob pass — the codec
    // twin of the FLAC streaming face
    val rows = (0L until 16L).map { id =>
      val (mime, bytes) = graft.tools.Mp3DupFixture.row(id)
      (id, mime, bytes)
    }
    streamed("mp3fp_stream", rows, AudioFp.fingerprintTable)
  }

  test("streamed Vorbis fingerprints equal the batch walk over the grown directory") {
    // the Ogg demux + Vorbis decode is a stateless per-blob pass —
    // the in-stream-tables codec joins the streaming dedup family
    val rows = (0L until 16L).map { id =>
      val (mime, bytes) = graft.tools.VorbisDupFixture.row(id)
      (id, mime, bytes)
    }
    streamed("vorbisfp_stream", rows, AudioFp.fingerprintTable)
  }
}
