package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.ops.{Correlate, Dedup, Relational, Similarity, TextAnalysis}

/**
 * Physical-plan audit: the 100 TB design properties (pushdown, column
 * pruning, broadcast placement, shuffle counts) asserted as regression
 * tests, so a refactor that silently turns a broadcast join into a
 * shuffle join — invisible at fixture scale, fatal at cluster scale —
 * fails CI instead of the cluster. AQE is disabled inside each check so
 * the inspected plan is final (the assertions are about the STATIC
 * plan shape; AQE can only improve on it at runtime).
 */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def audited[A](df: => DataFrame)(check: SparkPlan => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try check(df.queryExecution.executedPlan)
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  private def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
  private def broadcastJoins(p: SparkPlan) = p.collect { case j: BroadcastHashJoinExec => j }

  test("event-type dispatch pushes the filter into the parquet scan") {
    audited(Relational.ofType(Tables.events(spark, sf), "error")
      .select("event_id", "user_id", "ts")) { plan =>
      val s = plan.toString
      assert(s.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]"), s)
    }
  }

  test("projection prunes the scan schema to the referenced columns") {
    audited(Tables.events(spark, sf)
      .filter(Relational.rangeInclusive(col("value"), 50.0, 150.0))
      .select("event_id", "value")) { plan =>
      val s = plan.toString
      // no event_type/user_id/props in the read schema
      assert(s.contains("ReadSchema: struct<event_id:bigint,value:double>"), s)
    }
  }

  test("star-schema revenue join broadcasts dimensions and never goes cartesian") {
    audited(Relational.customerRevenue(
      Tables.customer(spark, sf), Tables.orders(spark, sf), Tables.lineitem(spark, sf))) { plan =>
      assert(broadcastJoins(plan).nonEmpty, plan.toString)
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
    }
  }

  test("brute-force ANN broadcasts the query side; the corpus is never shuffled before scoring") {
    audited(Similarity.bruteForceTopK(Tables.embeddings(spark, sf))) { plan =>
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bnlj.nonEmpty, plan.toString)
      // the only exchange is the per-query ranking window (tiny:
      // nQueries × corpus candidates after scoring)
      assert(shuffles(plan).size <= 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("sequence-timeout face is a single keyed shuffle (window form, no time-range self-join)") {
    audited(Correlate.sequenceTimeout(
      Tables.events(spark, sf), "signup", "purchase", "1 HOUR")) { plan =>
      assert(shuffles(plan).size <= 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("decontamination broadcasts the benchmark side; the corpus side stays put") {
    audited(TextAnalysis.decontaminate(Tables.documents(spark, sf))) { plan =>
      assert(broadcastJoins(plan).nonEmpty, plan.toString)
      // corpus side: explode + join + one aggregation shuffle on doc_id
      assert(shuffles(plan).size <= 2, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("MinHash LSH banded exchanges ship id+hash rows only — no arrays through the exploded shuffle") {
    // the banded rows are exploded bands× and self-joined; a shingle or
    // signature array in that exchange would ship every document's
    // shingle set through the shuffle `bands` times — the q_d2/q_d3
    // scale contract (Dedup.scala banded comment)
    for ((bands, rowsPerBand) <- Seq((12, 4), (20, 2))) { // q_d2, q_d3 exports
      audited(Dedup.minhashLsh(Tables.documents(spark, sf),
        3, bands, rowsPerBand, 0.5)) { plan =>
        // every operator carrying a band hash — whichever side of the
        // self-join, broadcast (fixture scale) or shuffled (cluster
        // scale) — must be free of array columns
        val banded = plan.collect { case n if n.output.exists(_.name == "band_hash") => n }
        assert(banded.nonEmpty, s"no banded operator found:\n$plan")
        banded.foreach { n =>
          assert(!n.output.exists(_.dataType.isInstanceOf[ArrayType]),
            s"array column rode the banded rows: ${n.output.map(a => s"${a.name}:${a.dataType.simpleString}")}\n$plan")
          assert(!n.output.exists(a => Set("sh", "sig", "text").contains(a.name)),
            s"wide column rode the banded rows: ${n.output.map(_.name)}\n$plan")
        }
      }
    }
  }

  test("incremental dedup prunes the index scan: the band side reads signatures, never shingles") {
    // the q_d10 contract — the persisted index is touched twice (band
    // join + exact verify) and the band side must NOT drag the shingle
    // arrays through its scan: column pruning has to reach parquet
    val dir = java.nio.file.Files.createTempDirectory("planidx").toString + "/sig"
    Dedup.signatureTable(Tables.documents(spark, sf)).write.parquet(dir)
    audited(Dedup.minhashLshIncrementalSig(
      Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1),
      spark.read.parquet(dir))) { plan =>
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("planidx")) => s
      }
      assert(scans.nonEmpty, s"no index scans found:\n$plan")
      // at least one index scan (the band side) pruned `sh` away
      assert(scans.exists(!_.output.exists(_.name == "sh")),
        s"every index scan reads the shingle column:\n${scans.map(_.output.map(_.name))}\n$plan")
      // and banded rows stay array-free regardless of join strategy
      plan.collect { case n if n.output.exists(_.name == "band_hash") => n }
        .foreach { n =>
          assert(!n.output.exists(_.dataType.isInstanceOf[ArrayType]),
            s"array column rode the banded rows: ${n.output.map(_.name)}\n$plan")
        }
    }
  }

  test("SimHash is one map-side-combined aggregation shuffle") {
    audited(Dedup.simhash(Tables.documents(spark, sf))) { plan =>
      // one exchange: the groupBy(doc_id) with the native bit-vote
      // aggregate; the explode-by-bit form would show 60× the shuffle
      // and the parallel-sums form 60 long columns
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.toString.contains("partial_graft_simhash_agg"),
        s"no map-side partial aggregation:\n$plan")
    }
  }

  test("PQ ANN: codebook and query sides broadcast; no join ever shuffles the corpus") {
    audited(Similarity.pqTopK(Tables.embeddings(spark, sf))) { plan =>
      // encode join (codebook) + ADC join (query subvectors) both
      // broadcast — the corpus-side code rows never move for a join
      assert(broadcastJoins(plan).size >= 2, plan.toString)
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty, plan.toString)
      assert(plan.collect { case j: ShuffledHashJoinExec => j }.isEmpty, plan.toString)
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
    }
  }

  test("ingest gate is map-side until the single dedup shuffle") {
    audited(graft.ops.Ingest.runBatch(Tables.documents(spark, sf))) { plan =>
      // exactly the row_number window's shuffle on md5(text) — the
      // aggregate-then-join-back form this op replaced (measured 4×
      // slower) would show 2-3 exchanges and must fail here
      assert(shuffles(plan).size <= 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("chunking is pure map-side: zero exchanges at any scale") {
    audited(TextAnalysis.chunk(Tables.documents(spark, sf))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("span dedup: map-side span generation, then exactly the dedup + reassembly shuffles") {
    audited(Dedup.spanDedup(Tables.documents(spark, sf))) { plan =>
      // one exchange keyed by span text (keep-first window), one keyed
      // by doc_id (reassembly agg) — anything more means the span
      // explode grew a shuffle it must never have
      assert(shuffles(plan).size == 2, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
    }
  }

  test("shuffle shards: hash arithmetic map-side, one shard-keyed window, no global sort") {
    audited(graft.ops.Sampling.shuffleShards(Tables.documents(spark, sf))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      // the window must partition by shard — a global (single-partition)
      // row_number would show an exchange with no partition expressions
      val s = plan.toString
      assert(s.contains("hashpartitioning(shard"), s)
    }
  }

  test("token shards: one window shuffle keyed by source, nothing else") {
    audited(graft.ops.Sampling.tokenShards(Tables.documents(spark, sf))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("pack sequences: one source-keyed window shuffle, map-side explode, nothing else") {
    audited(graft.ops.Sampling.packSequences(Tables.documents(spark, sf))) { plan =>
      // the running sum is the only exchange; the touched-sequence
      // explode and all span arithmetic ride map-side above it
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.toString.contains("hashpartitioning(source"), plan.toString)
    }
  }

  test("repeat-factor mixing is pure map-side: zero exchanges at any scale") {
    audited(graft.ops.Sampling.repeatFactorSample(Tables.documents(spark, sf),
      org.apache.spark.sql.functions.col("doc_id"),
      Map("src0" -> 2.5, "src1" -> 1.5, "src2" -> 0.4))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("k-means final assignment is map-side: the corpus is never shuffled or joined") {
    // kmeansAssign's iteration updates aggregate k·dim scalars (their
    // own bounded job); the OUTPUT plan — assignment against literal
    // centroids — must be a pure projection over the corpus scan
    audited(graft.ops.Similarity.kmeansAssign(
      Tables.embeddings(spark, sf), k = 4, iters = 1)) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
    }
  }

  test("tf-idf: doc length rides the rank window's doc_id exchange; one vocab join (r22 pin)") {
    // r21 folded the dedicated docLen aggregation + doc_id join into a
    // window sum over the rank window's own partition (guide §2.4:
    // same-key operations share one exchange). Pin the shape: exactly
    // ONE doc_id-only exchange (both windows ride it) and ONE
    // equi-join (tf ⋈ dfreq on w) — a regression to the old shape
    // re-adds a doc_id join and a second doc_id-keyed exchange.
    audited(TextAnalysis.tfidfTopTerms(Tables.documents(spark, sf))) { plan =>
      val docIdOnly = shuffles(plan).filter { e =>
        e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.length == 1 &&
              h.expressions.head.references.toSeq.map(_.name) == Seq("doc_id")
          case _ => false
        }
      }
      assert(docIdOnly.size == 1,
        s"expected ONE doc_id-only exchange (shared window partition), got ${docIdOnly.size}:\n$plan")
      val equiJoins = plan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
        case j: BroadcastHashJoinExec => j
      }
      assert(equiJoins.size == 1, s"expected ONE equi-join (dfreq on w):\n$plan")
    }
  }

  test("k-means assignment reads the SHARED materialised corpus, never re-scans parquet (r22 pin)") {
    // r21 made kmeansAssign share one normalised-corpus
    // materialisation between the Lloyd iterations and the final
    // assignment; pin that the output plan contains no parquet scan
    // (a re-scan would mean the sharing regressed).
    audited(graft.ops.Similarity.kmeansAssign(
      Tables.embeddings(spark, sf), k = 4, iters = 1)) { plan =>
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.isEmpty,
        s"assignment must read the materialised corpus, not re-scan parquet:\n$plan")
    }
  }

  test("ann recall: all six index pipelines read ONE materialised corpus (r22 pin)") {
    audited(graft.ops.Similarity.recallAtK(
      Tables.embeddings(spark, sf), nQueries = 4, k = 2)) { plan =>
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.isEmpty,
        s"recall must read the shared corpus only — parquet scans found:\n$plan")
    }
  }

  test("container metadata decode is pure map-side: zero exchanges over the blobs") {
    audited(graft.ops.Multimodal.avMetaTable(spark, Tables.mp4(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.avMetaTable(spark, Tables.audio(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("keyframe locators are pure map-side: zero exchanges over the video blobs") {
    // both layouts — self-contained (stss walk) and fragmented
    // (moof/trun walk) — must keep the blobs partition-local: only
    // fixed-shape (sample_no, offset, size) rows ever move
    audited(graft.ops.Multimodal.mp4KeyframeTable(spark, Tables.mp4Avc(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.mp4FragmentedKeyframeTable(spark, Tables.mp4Frag(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("ogg/webm/exif shard-list tables are pure map-side: zero exchanges over the blobs") {
    audited(graft.ops.Multimodal.oggPageTable(spark, Tables.ogg(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.webmBlockTable(spark, Tables.webm(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.exifTable(spark, Tables.exif(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.mp3FrameTable(spark, Tables.mp3(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.adtsFrameTable(spark, Tables.aac(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.tsPesTable(spark, Tables.ts(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.flacFrameTable(spark, Tables.flac(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.tsPtsTable(spark, Tables.ts(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.mp4FragmentedKeyframeTimeTable(spark, Tables.mp4Frag(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.oggPageTimeTable(spark, Tables.ogg(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Multimodal.webmBlockTimeTable(spark, Tables.webm(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("archive walkers are pure map-side: zero exchanges over the shard blobs") {
    // warc/tar/zip index a shard without the blob ever leaving its
    // partition — at corpus scale only fixed-shape index rows move
    audited(graft.ops.Archives.warcRecordTable(spark, Tables.warc(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.tarMemberTable(spark, Tables.tar(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.zipEntryTable(spark, Tables.zip(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.warcGzMemberTable(spark, Tables.warcgz(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.warcHttpTable(spark, Tables.warc(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.pdfXrefTable(spark, Tables.pdf(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // page-text extraction resolves the xref chain, follows /Contents
    // and inflates INSIDE the partition — a whole PDF → text pipeline
    // with zero exchanges
    audited(graft.ops.Archives.pdfPageTextTable(spark, Tables.pdf(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the RESOLVED object table adds exactly the keep-latest window:
    // one (media_id, obj_num)-keyed shuffle of index rows
    audited(graft.ops.Archives.pdfObjectTable(spark, Tables.pdf(spark))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
    // the WET face including the visible-text/langid/quality layer:
    // the whole web-text curation pipeline is ONE map-side pass
    audited(graft.ops.Archives.warcBodyTextTable(spark, Tables.warc(spark))
        .withColumn("v",
          graft.ops.TextAnalysis.htmlVisibleText(
            org.apache.spark.sql.functions.col("body_text")))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.Archives.warcGzBodyTextTable(spark, Tables.warcgz(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the CDX fetch index (member walk + canonicalizer + SURT) is a
    // map-side composition end to end: zero exchanges
    audited(graft.SparkEntry.queries("q_w22_cdx")(spark, sf)) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the image-text pair table groups a sample INSIDE the partition
    // that walks its shard (a sample's members never straddle
    // shards), so the whole multimodal pairing is zero-exchange
    audited(graft.ops.Archives.webdatasetPairTable(spark, Tables.tar(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("url host stats: keyed index-row shuffles only (distinct agg), blobs stay put") {
    // record walk (zero-exchange) → host groupBy with a distinct-URI
    // count: the standard two-phase distinct aggregation over small
    // keyed rows — at most 2 exchanges, none carrying the media blob
    audited(graft.ops.Archives.urlHostStats(
      graft.ops.Archives.warcRecordTable(spark, Tables.warc(spark)))) { plan =>
      assert(shuffles(plan).size <= 2, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("url dedup: ONE map-side-combined aggregation shuffle, never a self-join") {
    audited(graft.ops.Archives.urlDedup(
      graft.ops.Archives.warcRecordTable(spark, Tables.warc(spark)))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
      // skew-immunity is structural: a PARTIAL aggregate must sit
      // below the exchange (hot URIs shrink before the shuffle) —
      // the window form this replaced sorted everything per key
      val partialAggs = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.aggregateExpressions.exists(_.mode ==
              org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
      }
      assert(partialAggs.nonEmpty, s"no partial aggregate below the exchange:\n$plan")
    }
  }

  test("host cap: URI-window then host-window shuffles over index rows, blobs stay put") {
    audited(graft.ops.Archives.hostCap(
      graft.ops.Archives.urlDedup(
        graft.ops.Archives.warcRecordTable(spark, Tables.warc(spark))), 15)) { plan =>
      assert(shuffles(plan).size <= 2, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("url filter: blocklist joins broadcast; rules add no exchange over the dedup window") {
    import spark.implicits._
    audited(graft.ops.Archives.urlFilter(
      graft.ops.Archives.urlDedup(
        graft.ops.Archives.warcRecordTable(spark, Tables.warc(spark))),
      graft.ops.Archives.defaultBlockedHosts.toDF("blocked_host"))) { plan =>
      // the URI-keyed dedup window is the ONLY shuffle — the rule
      // regexes are map-side projection and the blocklist (millions
      // of hosts at scale, still MiBs) ships broadcast, never a
      // record-table shuffle
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(broadcastJoins(plan).nonEmpty, plan.toString)
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("corpus build: keyed index/text-row exchanges only, blobs never shuffle") {
    import spark.implicits._
    audited(graft.SparkEntry.queries("q_w15_corpus_build")(spark, sf)) { plan =>
      // URI window + host window + the (media_id, record_idx) join of
      // the capped URL table with the extracted text — every exchange
      // carries fixed-shape index rows or the extracted text itself,
      // never the shard blob
      assert(shuffles(plan).size <= 4, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("url canonicalization: map-side rewrite; only the distinct + alias-count window shuffle") {
    audited(graft.SparkEntry.queries("q_w16_url_canonical")(spark, sf)) { plan =>
      // two-phase distinct + the canonical-keyed count window — all
      // over bare URI strings; the rewrite itself adds no exchange
      assert(shuffles(plan).size <= 3, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("link graph: ONE blob scan (single-pass page walk), host agg keys small rows") {
    // q_w26 persists the shared page table; a cached run earlier in
    // the suite would substitute an InMemoryRelation here and hide
    // the scan this test exists to count — audit the uncached plan
    spark.catalog.clearCache()
    audited(graft.SparkEntry.queries("q_w24_host_graph")(spark, sf)) { plan =>
      assert(shuffles(plan).size <= 4, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
      // the r14 shape composed record table + WET table: TWO full
      // scans of the archive bytes plus a record-keyed join; the
      // one-pass page walk must show exactly ONE scan of the blob
      val blobScans = plan.collect {
        case s: org.apache.spark.sql.execution.LeafExecNode
            if s.output.exists(_.name == "media") => s
      }
      assert(blobScans.size == 1, s"${blobScans.size} blob scans:\n$plan")
    }
  }

  test("crawl frontier releases the page-table cache after materializing") {
    // q_w26 persists the one-pass page table for its diamond, then
    // must UNPERSIST it once the tiny host-level frontier is
    // materialized — a leaked MEMORY_AND_DISK InMemoryRelation of
    // decoded bodies would otherwise pressure executor storage for
    // the rest of a long session. Detection is behavioural: if the
    // cache were still live, Spark's cache manager would substitute
    // an InMemoryTableScan into ANY later plan containing the same
    // page-table subtree (q_w24 does).
    spark.catalog.clearCache()
    val frontier = graft.SparkEntry.queries("q_w26_crawl_frontier")(spark, sf)
    assert(frontier.count() > 0)
    val later = graft.SparkEntry.queries("q_w24_host_graph")(spark, sf)
    val cachedScans = later.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(cachedScans.isEmpty,
      s"page-table cache leaked past q_w26:\n${later.queryExecution.executedPlan}")
  }

  test("http-decode faces: robots-meta is exchange-free; charset faces shuffle once for the distinct") {
    // the whole chunked → content-coding → charset stack runs inside
    // the page walk's partitions: q_w37 must plan ZERO exchanges
    audited(graft.ops.Archives.robotsMetaTable(
      graft.ops.Archives.warcPageTable(spark, Tables.warc(spark)))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // q_w33's only exchange is the cross-shard distinct of tiny rows
    audited(graft.SparkEntry.queries("q_w33_charset_wet")(spark, sf)) { plan =>
      assert(shuffles(plan).size <= 1, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("image dhash: decode is map-side; the pair join ships 7-int signatures only") {
    audited(graft.ops.ImageHash.dhashTable(spark, Tables.imagedup(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.ImageHash.nearDupPairs(
      graft.ops.ImageHash.dhashTable(spark, Tables.imagedup(spark)))) { plan =>
      // band join + pair dedup — keyed exchanges of signature rows;
      // the image blobs never leave their scan partitions
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("robots filter: host/URI-keyed exchanges over rule and index rows only") {
    audited(graft.SparkEntry.queries("q_w20_robots")(spark, sf)) { plan =>
      // dedup window, robots-body join, rule-parse window + distinct,
      // host-keyed rule join, winning-rule window — all small rows
      assert(shuffles(plan).size <= 10, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("crawl delta: URI/coordinate-keyed exchanges over digest rows; shards never re-shuffle") {
    audited(graft.SparkEntry.queries("q_w17_crawl_delta")(spark, sf)) { plan =>
      // per snapshot: one URI dedup window + one coordinate-keyed
      // digest join; then the full-outer URI diff — every exchange
      // ships index/digest rows, never the media blob
      assert(shuffles(plan).size <= 10, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(shuffles(plan).forall(_.output.forall(_.name != "media")),
        s"blob column in an exchange:\n$plan")
    }
  }

  test("webdataset samples: exactly one shuffle, over index rows only") {
    // the sample groupBy shuffles (media_id, sample_key)-keyed index
    // rows — never blobs; partial aggregation keeps it one exchange
    audited(graft.ops.Archives.webdatasetSamples(
      graft.ops.Archives.tarMemberTable(spark, Tables.tar(spark)))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("clip byte spans: window + keyed joins only, never a cartesian") {
    audited(graft.ops.Captions.clipByteSpans(
      graft.ops.Captions.cueTable(spark, Tables.captions(spark)),
      graft.ops.Multimodal.mp4KeyframeTimeTable(spark, Tables.mp4Avc(spark)),
      Tables.mp4Avc(spark))) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
    }
  }

  test("caption cue parse is pure map-side; the clip-caption range join is keyed, never cartesian") {
    audited(graft.ops.Captions.cueTable(spark, Tables.captions(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the alignment joins on media_id with the time window as a join
    // condition: any hash/merge join on the key is fine, a nested-loop
    // or cartesian over cues × keyframes is the 100TB failure mode
    audited(graft.ops.Captions.clipCaptionPairs(
      graft.ops.Captions.cueTable(spark, Tables.captions(spark)),
      graft.ops.Multimodal.mp4KeyframeTimeTable(spark, Tables.mp4Avc(spark)))) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
      val keyed = plan.collect {
        case j: BroadcastHashJoinExec => j
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(keyed.nonEmpty, plan.toString)
    }
    // same contract over the TS time axis (q_m23): container-generic
    // pairing must stay a keyed join
    audited(graft.ops.Captions.clipCaptionPairs(
      graft.ops.Captions.cueTable(spark, Tables.captions(spark)),
      graft.ops.Multimodal.tsPtsTable(spark, Tables.ts(spark)))) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
    }
  }

  test("multi-rule aligned engine face is a single keyed shuffle") {
    // q_e6: three rules share one correlation key — the interpreter
    // must stay ONE repartition-by-key + in-partition sort, exactly
    // like the single-rule face; per-rule shuffles would multiply the
    // event movement by the rule count at scale
    import spark.implicits._
    val rules = Seq(
      graft.rules.RuleSpec.matchSingle("r0", Set("view"), onMatch = _ => Nil)
        .copy(suppressOnMatch = true),
      graft.rules.RuleSpec.sequenceWithTimeout("r1",
        Seq(Set("signup"), Set("purchase")), java.time.Duration.ofHours(1),
        _.payload("key"), onComplete = _ => Nil, onTimeout = _ => Nil))
    audited(graft.streaming.RuleEngine.runBatchAligned(
      Tables.eventsTyped(spark, sf), rules, _.payload("key")).toDF()) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("cluster split joins labels on the doc key — no cartesian, no nested loop over the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLsh(docs, 3, bands = 20, rowsPerBand = 2, 0.5)
    audited(graft.ops.Sampling.clusterSplit(docs, pairs)) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      // the CC label join and the split hash must be equi-joins/maps;
      // the only nested-loop allowed anywhere is a 1-row scalar fold
      val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bnl.isEmpty, s"nested-loop joins in cluster split:\n$plan")
    }
  }

  test("tfidf folds the corpus count in as a broadcast, never a corpus cartesian") {
    audited(TextAnalysis.tfidfTopTerms(Tables.documents(spark, sf))) { plan =>
      // the 1-row n_docs aggregate rides a broadcast nested-loop join;
      // a cartesian product here would be corpus × corpus at scale
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty, plan.toString)
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
    }
  }

  test("per-source cap: one window shuffle keyed by source, nothing else") {
    audited(graft.ops.Sampling.perSourceCap(Tables.documents(spark, sf))) { plan =>
      assert(shuffles(plan).size == 1, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }

  test("copy pairs: every join is a keyed equi-join — pair generation can never go nested-loop") {
    audited(TextAnalysis.copyPairs(Tables.documents(spark, sf))) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
      // the fp self-join and both size joins resolve to hash/merge
      // equi-joins (broadcast or shuffled — either is keyed)
      val keyed = plan.collect {
        case j: SortMergeJoinExec => j.leftKeys
        case j: ShuffledHashJoinExec => j.leftKeys
        case j: BroadcastHashJoinExec => j.leftKeys
      }
      assert(keyed.nonEmpty && keyed.forall(_.nonEmpty), plan.toString)
    }
  }

  test("timed funnel: step joins are keyed on the funnel key, counts are one aggregation") {
    audited(Correlate.funnelTimed(Tables.events(spark, sf),
      Seq("signup", "purchase"), Seq(86400L))) { plan =>
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
    }
  }

  test("streaming near-dedup index probe prunes partitions, buckets and row groups") {
    // the growing-index scale guarantee: a trigger's probe of the band
    // index must read only what its own batch can match — the replayed
    // write's partition excluded, the scan narrowed to the buckets the
    // probe hashes fall in, and the hash list pushed into parquet
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndplan").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = graft.ops.Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck", indexBuckets = 64)
    try {
      stream.addData((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        (2L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"))
      query.processAllAvailable()
    } finally query.stop()
    // a 2-hash probe: at most 2 of the 64 buckets may be scanned
    val probe = graft.ops.Ingest.indexBandProbe(spark, s"$base/index", "someotherwrite_0",
      Some(Seq("00000000000000000000000000000000", "ffffffffffffffffffffffffffffffff")), 64)
    audited(probe) { plan =>
      val s = plan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 64".r.findFirstMatchIn(s)
      assert(sel.isDefined, s)
      assert(sel.get.group(1).toInt <= 2, s)
      assert(s.contains("PushedFilters: [In(band_hash"), s)
    }
    // and a probe under the WRITING stream's own id excludes that partition
    val wid = spark.read.parquet(s"$base/index/bands")
      .select("write_id").distinct().collect().map(_.getString(0))
    assert(wid.length == 1)
    val replay = graft.ops.Ingest.indexBandProbe(spark, s"$base/index", wid.head,
      Some(Seq("00000000000000000000000000000000")), 64)
    assert(replay.count() == 0) // nothing but its own (excluded) partition exists
  }

  test("persisted IVF index query prunes to the probed cells at the partition level") {
    // the deployment-shape guarantee: an ANN query over the persisted
    // index reads nProbe-worth of cells, not the corpus — the probed
    // cell ids must land in PartitionFilters, not a post-scan Filter
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString + "/index"
    graft.ops.Similarity.writeIvfIndex(emb, dir)
    val nCells = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    // 2 queries × 4 probes touch at most 8 of the 16 cells — enough
    // headroom that the partition listing MUST come back pruned
    // (20 queries would legitimately cover all cells at this scale)
    audited(graft.ops.Similarity.ivfIndexTopK(
      spark.read.parquet(dir), emb.filter(col("vec_id") < 2))) { plan =>
      val s = plan.toString
      assert(s.contains("PartitionFilters: [cell"), s)
      // the index scan's driver-side listing must select fewer
      // directories than the index has cells — storage-level pruning,
      // not a post-scan filter
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("ivfplan")) => f
      }
      assert(scans.nonEmpty, s)
      scans.foreach { f =>
        assert(f.selectedPartitions.partitionCount < nCells,
          s"selected ${f.selectedPartitions.partitionCount} of $nCells cells")
      }
    }
  }

  test("compacted near-dedup index keeps the probe's bucket and parquet pruning") {
    // compaction rewrites per-trigger partitions through the same
    // bucketed saveAsTable path — the consolidated partition must
    // still satisfy the probe's plan pins, else compaction would
    // silently trade file count for a full-index scan
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndcplan").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = graft.ops.Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck", indexBuckets = 64)
    try {
      (0 until 3).foreach { i =>
        stream.addData((i.toLong, (0 until 10).map(j => s"c${i}x$j").mkString(" ")))
        query.processAllAvailable()
      }
    } finally query.stop()
    graft.ops.Ingest.compactIndex(spark, s"$base/index",
      graft.ops.Ingest.writeIdFor(s"$base/ck", 2), indexBuckets = 64)
    val parts = new java.io.File(s"$base/index/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(parts.length == 1 && parts.head.startsWith("write_id=compact_"))
    val probe = graft.ops.Ingest.indexBandProbe(spark, s"$base/index", "someotherwrite_0",
      Some(Seq("00000000000000000000000000000000", "ffffffffffffffffffffffffffffffff")), 64)
    audited(probe) { plan =>
      val s = plan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 64".r.findFirstMatchIn(s)
      assert(sel.isDefined, s)
      assert(sel.get.group(1).toInt <= 2, s)
      assert(s.contains("PushedFilters: [In(band_hash"), s)
    }
    // an unfiltered probe still sees every admitted doc's band rows
    val all = graft.ops.Ingest.indexBandProbe(spark, s"$base/index",
      "someotherwrite_0", None, 64)
    assert(all.select("doc_id").distinct().count() == 3)
  }

  test("zstd transport walkers are pure map-side: zero exchanges over the shard blobs") {
    import org.apache.spark.sql.functions.col
    // jsonl field extraction is relational but per-row (regexp on the
    // emitted line) — still no exchange; warc.zst and tar.zst are
    // straight index walks
    audited(graft.ops.ZstdTransport.jsonlDocTable(spark,
        Tables.zst(spark).filter(col("media_id") % 3 === 0))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.ZstdTransport.warcZstRecordTable(spark,
        Tables.zst(spark).filter(col("media_id") % 3 === 1))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    audited(graft.ops.ZstdTransport.tarZstMemberTable(spark,
        Tables.zst(spark).filter(col("media_id") % 3 === 2))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // FLAC PCM decode: one decode per blob inside its partition
    audited(graft.ops.Flac.pcmTable(spark, Tables.flacpcm(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // audio fingerprints: decode + FFTs map-side, zero exchanges;
    // the pair join ships only (id, 8 ints) rows
    audited(graft.ops.AudioFp.fingerprintTable(spark,
        Tables.audiodup(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the banded pair join (q_m37/43/44 share it): the 8-way band
    // explode is a union of projections (NO exchange per band), the
    // self-join keys on (band, key) — bounded exchanges, never a
    // cartesian, and the distinct adds at most one more
    audited(graft.ops.AudioFp.nearDupPairsCodec(
        graft.ops.AudioFp.fingerprintTable(spark, Tables.vorbisdup(spark)))) { plan =>
      assert(shuffles(plan).size <= 3, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case c: BroadcastNestedLoopJoinExec => c }.isEmpty, plan.toString)
    }
    // video re-mux signatures: frame walks + pixel decode map-side
    // (round 20: the NAL-framing normalization stays inside the
    // partition too — the digest derivation adds no exchange)
    audited(graft.ops.VideoDup.signatureTable(spark,
        Tables.videodup(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
    // the q_m38 pair join: digest-keyed equi-join over fixed-shape
    // (id, count, 32-hex, kind) rows — bounded exchanges, never a
    // cartesian or broadcast-nested-loop
    audited(graft.ops.VideoDup.remuxPairs(graft.ops.VideoDup.signatureTable(
        spark, Tables.videodup(spark)))) { plan =>
      assert(shuffles(plan).size <= 3, s"${shuffles(plan).size} shuffles:\n$plan")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, plan.toString)
      assert(plan.collect { case c: BroadcastNestedLoopJoinExec => c }.isEmpty, plan.toString)
    }
    // GIF animation table: structural walk, no LZW decode, map-side
    audited(graft.ops.Multimodal.gifAnimTable(spark,
        Tables.gifanim(spark))) { plan =>
      assert(shuffles(plan).isEmpty, s"${shuffles(plan).size} shuffles:\n$plan")
    }
  }
}
