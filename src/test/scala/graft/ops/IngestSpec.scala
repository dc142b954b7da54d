package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  private val prose =
    "the quick brown fox jumps over the lazy dog and runs to the hills"
  private val junk = "@@@@ #### !!!! %%%% ^^^^"
  private val german = "der hund und die katze ist ein tier und der hund"

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("batch ingest: junk and off-language docs are gated, clones dedup to the lowest id") {
    val in = docs(
      (1L, prose),
      (2L, junk),    // fails the quality gate
      (3L, german),  // fails the language gate
      (4L, prose),   // exact clone of 1 → deduped
      (5L, prose + " extra"))
    val out = Ingest.runBatch(in).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 5L))
    out.foreach { r =>
      assert(r.getAs[String]("predicted_lang") == "en")
      assert(r.getAs[Double]("quality_score") >= 0.3)
    }
  }

  test("streaming ingest applies the same gate with watermark-bounded dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = Ingest.runStreaming(stream.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      stream.addData((1L, t, prose), (2L, t, junk), (3L, t, german), (4L, t, prose))
      query.processAllAvailable()
      // re-delivery of surviving content in a later batch is dropped too
      stream.addData((5L, t, prose))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("ingest_out").collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L))
    // batch and streaming gates agree on the surviving CONTENT
    val batchTexts = Ingest.runBatch(docs((1L, prose), (2L, junk), (3L, german), (4L, prose)))
      .collect().map(_.getAs[String]("text")).toSet
    assert(out.map(_.getAs[String]("text")).toSet == batchTexts)
  }

  test("streaming near-dedup: index grows across batches, near-dups of admitted docs dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("neardedup").toString
    // ten-word docs; "near" variants share 8 leading words (jaccard of
    // 3-shingles well above 0.5), "novel" shares nothing
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val aNear = "w1 w2 w3 w4 w5 w6 w7 w8 zz zz2"
    val b = "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"
    val bNear = "v1 v2 v3 v4 v5 v6 v7 v8 qq qq2"
    val c = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    try {
      // batch 1: a admitted; its within-batch near-dup collapses to a
      stream.addData((1L, a), (2L, aNear))
      query.processAllAvailable()
      // batch 2: near-dup of batch-1's ADMITTED doc dropped via the
      // grown index; novel docs b and c admitted
      stream.addData((3L, aNear), (4L, b), (5L, c))
      query.processAllAvailable()
      // batch 3: near-dup of batch-2's admitted b dropped too
      stream.addData((6L, bNear))
      query.processAllAvailable()
    } finally query.stop()
    val admitted = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(admitted == Seq(1L, 4L, 5L))
    // the index holds exactly the admitted docs' signatures + bands
    val indexed = spark.read.parquet(s"$base/index/sig")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(indexed == Seq(1L, 4L, 5L))
    assert(spark.read.parquet(s"$base/index/bands")
      .select("doc_id").distinct().count() == 3)
  }

  test("streaming near-dedup: a cluster survives when only its canonical near-dups the index") {
    // regression: index-drop must run BEFORE within-batch canonical
    // selection — the other order admits NOTHING from a batch cluster
    // {X, Y} when the index matches only canonical X, silently losing Y
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("nearloss").toString
    val d1 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    // X: jaccard(d1, X) = 6/10 >= 0.5 (shares a1..a8)
    val x = "a1 a2 a3 a4 a5 a6 a7 a8 x9 x10"
    // Y: jaccard(X, Y) = 6/10 >= 0.5, but jaccard(d1, Y) = 4/12 < 0.5
    val y = "a3 a4 a5 a6 a7 a8 x9 x10 zz1 zz2"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    try {
      stream.addData((1L, d1))
      query.processAllAvailable()
      // X near-dups the index; Y near-dups X but NOT the index → X
      // dropped, Y admitted (it duplicates nothing admitted)
      stream.addData((5L, x), (9L, y))
      query.processAllAvailable()
    } finally query.stop()
    val admitted = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(admitted == Seq(1L, 9L))
  }

  test("near-dedup index compaction: partitions fold to one, probes unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndcompact").toString
    def novel(i: Int): String = (0 until 10).map(j => s"t${i}x$j").mkString(" ")
    def listParts(half: String): Seq[String] =
      new java.io.File(s"$base/index/$half").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def countFiles(half: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$base/index/$half"))
    }
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    try {
      (0 until 5).foreach { i =>
        stream.addData((i.toLong, novel(i)))
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(listParts("sig").size == 5 && listParts("bands").size == 5)
    val filesBefore = countFiles("sig") + countFiles("bands")
    // partial frontier: batches 0..2 fold into one compact partition,
    // the later triggers' partitions are untouched
    Ingest.compactIndex(spark, s"$base/index",
      Ingest.writeIdFor(s"$base/ck", 2), indexBuckets = 16)
    assert(listParts("sig").size == 3)
    assert(listParts("sig").count(_.contains("=compact_")) == 1)
    // checkpoint-derived frontier (latest committed batch = 4):
    // everything (including the previous compaction's output) folds
    // into ONE partition per half
    Ingest.compactIndexFromCheckpoint(spark, s"$base/index", s"$base/ck",
      indexBuckets = 16)
    assert(listParts("sig").size == 1 && listParts("bands").size == 1)
    assert(countFiles("sig") + countFiles("bands") < filesBefore)
    // the consolidated partition is ONE file per non-empty bucket —
    // the writer clusters by the bucket column, so compaction restores
    // O(buckets) files, not tasks-x-buckets fragments
    assert(countFiles("sig") <= 16, s"sig files = ${countFiles("sig")}")
    assert(countFiles("bands") <= 16, s"bands files = ${countFiles("bands")}")
    // index content is unchanged: same admitted doc ids in both halves
    assert(spark.read.parquet(s"$base/index/sig")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      (0L until 5L).toSeq)
    assert(spark.read.parquet(s"$base/index/bands")
      .select("doc_id").distinct().count() == 5)
    // probes against the compacted index behave exactly as before: a
    // near-dup of an early admission is dropped, a novel doc admitted
    val nearOf0 = (0 until 8).map(j => s"t0x$j").mkString(" ") + " zz1 zz2"
    val s2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = Ingest.runStreamingNearDedup(s2.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck2")
    try {
      s2.addData((100L, nearOf0), (101L, novel(9)))
      q2.processAllAvailable()
    } finally q2.stop()
    val admitted = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(admitted == (0L until 5L) :+ 101L)
  }

  test("output compaction: write_id dirs fold to O(1) across 10 triggers, rows identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("outcompact").toString
    def novel(i: Int): String = (0 until 10).map(j => s"o${i}y$j").mkString(" ")
    def listOutParts(): Seq[String] =
      new java.io.File(s"$base/out").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq.sorted
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    try {
      (0 until 10).foreach { i =>
        stream.addData((i.toLong, novel(i)))
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(listOutParts().size == 10) // one dir per admitting trigger
    val before = spark.read.parquet(s"$base/out")
      .drop("write_id").collect().map(_.toSeq).toSet
    Ingest.compactOutputFromCheckpoint(spark, s"$base/out", s"$base/ck")
    // everything committed folds into ONE consolidated partition …
    assert(listOutParts().size == 1 && listOutParts().head.startsWith("write_id=compact_"))
    // … with identical admitted rows
    val after = spark.read.parquet(s"$base/out")
      .drop("write_id").collect().map(_.toSeq).toSet
    assert(after == before && after.size == 10)
    // a repeat call with nothing new to fold is a no-op
    Ingest.compactOutputFromCheckpoint(spark, s"$base/out", s"$base/ck")
    assert(listOutParts().size == 1)
    // a LATER compaction folds the previous compaction's output plus
    // new committed triggers — output stays O(1) forever
    val s2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = Ingest.runStreamingNearDedup(s2.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck2")
    try {
      s2.addData((100L, novel(90)))
      q2.processAllAvailable()
    } finally q2.stop()
    Ingest.compactOutputFromCheckpoint(spark, s"$base/out", s"$base/ck2")
    assert(listOutParts().size == 1)
    assert(spark.read.parquet(s"$base/out").count() == 11)
  }

  test("index compaction folds crash-mid-drop duplicates back to one copy") {
    // crash model: compaction wrote the consolidated partition but died
    // before deleting a member — the same rows now exist twice at rest.
    // The NEXT compaction must fold them to one copy (dedup on the
    // half's natural key), not carry them forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndcrashdup").toString
    def novel(i: Int): String = (0 until 10).map(j => s"c${i}z$j").mkString(" ")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    try {
      (0 until 3).foreach { i =>
        stream.addData((i.toLong, novel(i)))
        query.processAllAvailable()
      }
    } finally query.stop()
    // simulate the torn state exactly: a consolidated `compact_*`
    // partition exists holding batch 0's rows, while the member
    // partition it folded was never deleted (crash between the write
    // and the drops) — batch 0's signature row is now on disk twice
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val sigRoot = new java.io.File(s"$base/index/sig")
    val member = sigRoot.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("write_id=")).sorted.head
    copyTree(new java.io.File(sigRoot, member).toPath,
      new java.io.File(sigRoot, "write_id=compact_simtorn").toPath)
    assert(spark.read.parquet(s"$base/index/sig").count() == 4) // 3 + 1 dup
    // the NEXT compaction folds compact_simtorn + the stream's three
    // committed partitions; the dup row must collapse — doc ids come
    // out exactly 0,1,2 with no repeats
    Ingest.compactIndexFromCheckpoint(spark, s"$base/index", s"$base/ck")
    val ids = spark.read.parquet(s"$base/index/sig")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L), s"duplicates persisted: $ids")
  }

  test("streaming near-dedup: index survives a catalog restart and a fresh stream over it") {
    // two restart realities at once: (a) a new session's in-memory
    // catalog has forgotten the bucketed index tables (they must be
    // re-registered from the surviving files), and (b) a FRESH stream
    // (new checkpoint ⇒ batch ids restart at 0) over the old index must
    // still dedup against the old stream's batch 0 — the write_id
    // partition key keeps those ids from colliding
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndrestart").toString
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val aNear = "w1 w2 w3 w4 w5 w6 w7 w8 zz zz2"
    val b = "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"
    val s1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q1 = Ingest.runStreamingNearDedup(s1.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck1")
    try {
      s1.addData((1L, a))
      q1.processAllAvailable()
    } finally q1.stop()
    // simulate the restart: catalog forgets the tables; files remain
    spark.sql(s"DROP TABLE IF EXISTS ${Ingest.bandTableName(s"$base/index")}")
    spark.sql(s"DROP TABLE IF EXISTS ${Ingest.sigTableName(s"$base/index")}")
    val s2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = Ingest.runStreamingNearDedup(s2.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck2")
    try {
      // batch 0 of the NEW stream: near-dup of the OLD stream's batch-0
      // admission must be dropped; the novel doc admitted
      s2.addData((7L, aNear), (8L, b))
      q2.processAllAvailable()
    } finally q2.stop()
    val admitted = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(admitted == Seq(1L, 8L))
  }

  test("soak: 20 triggers + compaction every 5 vs a concurrent locked probe — never a partial view") {
    // End-to-end race soak for the advisory writer lock: a probe loop
    // that takes the SAME lock a trigger takes (the contract for any
    // index reader that needs a consistent cross-half view) must never
    // observe sig and bands halves disagreeing on the admitted doc set
    // — not between the two half-appends of a trigger, not during a
    // compaction's write-then-drop window, not while compaction folds
    // a previous compaction in. Lock-serialized mutation is exactly
    // the property that makes this hold; a violation here is the
    // compaction/stream race the lock exists to close.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ndsoak").toString
    def novel(i: Int): String = (0 until 10).map(j => s"k${i}s$j").mkString(" ")
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stopProbe = false
    val prober = new Thread(() => {
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      while (!stopProbe) {
        try {
          Ingest.withIndexLock(spark, s"$base/index") {
            val haveSig = fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/sig"))
            val haveBands = fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/bands"))
            if (haveSig != haveBands)
              violations.add(s"torn halves: sig=$haveSig bands=$haveBands")
            else if (haveSig) {
              val sigIds = spark.read.parquet(s"$base/index/sig")
                .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
              val bandIds = spark.read.parquet(s"$base/index/bands")
                .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
              if (sigIds != bandIds)
                violations.add(s"halves disagree: sig=$sigIds bands=$bandIds")
            }
          }
        } catch { case e: Throwable => violations.add(s"probe threw: $e") }
        Thread.sleep(5)
      }
    }, "ndsoak-prober")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = Ingest.runStreamingNearDedup(stream.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/out", s"$base/ck")
    prober.start()
    try {
      (0 until 20).foreach { i =>
        stream.addData((i.toLong, novel(i)))
        query.processAllAvailable()
        if (i % 5 == 4)
          Ingest.compactIndexFromCheckpoint(spark, s"$base/index", s"$base/ck",
            indexBuckets = 16)
      }
    } finally {
      query.stop()
      stopProbe = true
      prober.join(30000)
    }
    assert(violations.isEmpty, violations.toArray.mkString("; "))
    // the soak changed nothing about correctness: all 20 novel docs
    // admitted, index halves agree, and the lock file is released
    assert(spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 20L))
    assert(spark.read.parquet(s"$base/index/sig")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 20L))
    assert(!new java.io.File(s"$base/index/_lock").exists())
  }
}
