package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("cosine: known vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0),
      (Array(3.0, 4.0), Array(3.0, 4.0), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("sim"), col("expected")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k: k rows per query, ranked by similarity") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10)
    val byQuery = got.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.length == 10)
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k returns only true-bucket candidates with reasonable recall@10") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(emb, nQueries = 10, k = 10, nPlanes = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // deterministic (seeded hyperplanes, fixed fixture): measured 0.48
    // — the floor sits just beneath so a probe/bucketing nerf fails
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"lsh recall@10 = $recall")
    assert(recall > 0.45, s"recall@10 = $recall")
  }

  test("IVF top-k probes a quarter of the cells with solid recall@10") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 10, k = 10, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // deterministic (seeded KMeans, fixed fixture): measured 0.67 —
    // floor pinned just beneath so a probe nerf fails the suite
    info(s"ivf recall@10 = $recall")
    assert(recall > 0.6, s"recall@10 = $recall")
  }

  test("persisted IVF index reproduces ivfFixedTopK exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/index"
    Similarity.writeIvfIndex(emb, dir)
    val fromIndex = Similarity.ivfIndexTopK(
      spark.read.parquet(dir), emb.filter(col("vec_id") < 20))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Int]("rank"))).toSet
    val direct = Similarity.ivfFixedTopK(emb)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Int]("rank"))).toSet
    assert(fromIndex == direct)
    // the index is laid out one directory per cell — the unit the
    // query's partition filter prunes
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).toSeq
    assert(cellDirs.size > 1 && cellDirs.size <= 16)
  }

  test("recallAtK emits recall-0 rows for queries with an EMPTY approximate list") {
    import spark.implicits._
    // a 1-vector corpus: every index's candidate list for query 0 is
    // empty (self-matches excluded, no other vectors, no centroid
    // seeds present) — the methods × queries universe must still emit
    // one recall-0 row per method rather than dropping the query
    val solo = Seq((0L, Array.fill(64)(0.125f))).toDF("vec_id", "embedding")
    val out = Similarity.recallAtK(solo, nQueries = 1, k = 10).collect()
    assert(out.map(_.getAs[String]("method")).sorted.toSeq ==
      Seq("ivf_fixed", "ivf_trained", "lsh", "pq", "sq8"))
    assert(out.forall(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Long]("hits") == 0L && r.getAs[Double]("recall") == 0.0))
  }

  test("SQ8 quantized top-k tracks the float baseline closely (recall@10)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = tops(Similarity.bruteForceTopK(emb))
    val sq8 = tops(Similarity.quantizedTopK(emb))
    val recall = (exact & sq8).size.toDouble / exact.size
    info(s"sq8 recall@10 = $recall") // measured 0.98; floor just beneath
    assert(recall >= 0.95, s"SQ8 recall@10 too low: $recall")
  }

  test("PQ ADC top-k keeps useful recall at 32x compression") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = tops(Similarity.bruteForceTopK(emb, nQueries = 10))
    val pq = tops(Similarity.pqTopK(emb, nQueries = 10))
    assert(pq.size == exact.size) // k rows per query either way
    // 8 subspaces × 16 fixed (untrained) codes is a coarse quantiser
    // (ADC-only recall measured 0.25), but the exact re-rank of the
    // top-40 ADC survivors lifts recall to whatever P[true neighbor ∈
    // ADC top-40] is — measured 0.52 on this fixture; floor pinned
    // just beneath so a codebook or re-rank nerf fails the suite
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"pq recall@10 = $recall")
    assert(recall >= 0.5, s"PQ recall@10 = $recall")
  }

  test("streaming IVF queries match the batch index face, idempotent per-batch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val indexDir = s"$root/index"
    Similarity.writeIvfIndex(emb, indexDir)
    // two trigger-sized query batches, replayed from the fixture rows
    val fixture = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1)))
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Seq[Float])]
    val outDir = s"$root/out"
    val query = Similarity.ivfStreamingTopK(
      stream.toDF().toDF("vec_id", "embedding"), indexDir, outDir, s"$root/ck")
    try {
      stream.addData(fixture.filter(_._1 < 10).toSeq)
      query.processAllAvailable()
      stream.addData(fixture.filter(t => t._1 >= 10 && t._1 < 20).toSeq)
      query.processAllAvailable()
    } finally query.stop()
    // each trigger's output equals the batch face over the same queries
    val index = spark.read.parquet(indexDir)
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Int]("rank"))).toSet
    val batch0 = tops(spark.read.parquet(s"$outDir/batch_id=0"))
    val batch1 = tops(spark.read.parquet(s"$outDir/batch_id=1"))
    assert(batch0 == tops(Similarity.ivfIndexTopK(index, emb.filter(col("vec_id") < 10))))
    assert(batch1 == tops(Similarity.ivfIndexTopK(
      index, emb.filter(col("vec_id") >= 10 && col("vec_id") < 20))))
    assert((batch0.map(_._1) & batch1.map(_._1)).isEmpty) // distinct query sets
  }

  test("ensureIvfIndex: distinct fixtures get distinct dirs; stale dirs are reclaimed") {
    import java.nio.file.{Files, StandardCopyOption}
    // two on-disk copies of the same fixture with deliberately distinct
    // leaf mtimes — the parent dirs are indistinguishable by
    // (path, dir-mtime, dir-length), exactly the in-place-overwrite
    // case the old 32-bit tuple key missed
    val src = new java.io.File("/root/testdata/sf0.001/embeddings.parquet")
    def copyFixture(stampOffset: Long): java.io.File = {
      val root = Files.createTempDirectory("graft_fixture").toFile
      val dst = new java.io.File(root, "embeddings.parquet")
      Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
      assert(dst.setLastModified(1700000000000L + stampOffset))
      dst
    }
    val fixA = copyFixture(0L)
    val fixB = copyFixture(60000L)
    assert(Similarity.fixtureKey(fixA.getAbsolutePath) !=
      Similarity.fixtureKey(fixB.getAbsolutePath))
    def load(f: java.io.File) = spark.read.parquet(f.getAbsolutePath)
    val dirA = Similarity.ensureIvfIndex(fixA.getAbsolutePath, load(fixA))
    val dirB = Similarity.ensureIvfIndex(fixB.getAbsolutePath, load(fixB))
    assert(dirA != dirB)
    assert(new java.io.File(dirA, "_SUCCESS").exists)
    assert(new java.io.File(dirB, "_SUCCESS").exists)
    // a second call for unchanged content reuses the index (no rebuild)
    val successMtime = new java.io.File(dirA, "_SUCCESS").lastModified
    assert(Similarity.ensureIvfIndex(fixA.getAbsolutePath, load(fixA)) == dirA)
    assert(new java.io.File(dirA, "_SUCCESS").lastModified == successMtime)
    // overwriting the leaf IN PLACE (same name/size, new mtime) changes
    // the key; the rebuild deletes the superseded index for this path
    assert(fixA.setLastModified(1700009999000L))
    val dirA2 = Similarity.ensureIvfIndex(fixA.getAbsolutePath, load(fixA))
    assert(dirA2 != dirA)
    assert(!new java.io.File(dirA).exists, "stale index dir not reclaimed")
    assert(new java.io.File(dirB).exists, "other fixture's index must survive")
  }

  test("kNN label vote: queries adopt the majority label of their cluster") {
    import spark.implicits._
    // vec 0/1 are the queries (vec_id < nQueries); two tight clusters
    // along orthogonal axes carry labels 1 and 2
    val df = Seq(
      (0L, Array(1f, 0f), 9),
      (1L, Array(0f, 1f), 9),
      (2L, Array(0.9f, 0.1f), 1), (3L, Array(0.95f, 0.05f), 1), (4L, Array(0.85f, 0.15f), 1),
      (5L, Array(0.1f, 0.9f), 2), (6L, Array(0.05f, 0.95f), 2), (7L, Array(0.15f, 0.85f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(df, nQueries = 2, k = 3).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("predicted_label"), r.getAs[Long]("votes"), r.getAs[Int]("true_label"))).toMap
    assert(got(0L) == ((1, 3L, 9)))
    assert(got(1L) == ((2, 3L, 9)))
  }

  test("label centroids: per-position means of normalised members, counts per label") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(0f, 1f), 1), // centroid (.5, .5)
      (2L, Array(3f, 4f), 2)                          // normalised (.6, .8)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(df).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getSeq[Double](r.fieldIndex("centroid")).toList))).toMap
    assert(got(1)._1 == 2L && got(1)._2 == List(0.5, 0.5))
    assert(got(2)._1 == 1L && got(2)._2 == List(0.6, 0.8))
    // the exported sums face agrees: centroid = sum_x / n_vecs
    val sums = Similarity.labelCentroidSums(df).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pos")) -> r.getAs[Double]("sum_x")).toMap
    assert(sums((1, 0)) == 1.0 && sums((1, 1)) == 1.0)
    assert(sums((2, 0)) == 0.6 && sums((2, 1)) == 0.8)
  }

  test("near-dup pairs are symmetric-free (a<b) and above threshold") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.embeddingNearDup(emb, 0.4).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("sim") >= 0.4)
    }
  }

  test("LSH-bucketed near-dup: perfect precision vs the exact all-pairs form") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = pairs(Similarity.embeddingNearDup(emb, 0.4))
    val lsh = pairs(Similarity.embeddingNearDupLsh(emb, 0.4))
    // exact verify after bucketing ⇒ every returned pair is real;
    // multi-probe recall over 8 hyperplanes on sim>=0.4 pairs is
    // partial by design (the scale trade) — assert it's non-trivial
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty && lsh.nonEmpty)
  }

  test("recall@10: one row per (method, query), recall in [0,1], sq8 near-exact") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Similarity.recallAtK(emb).collect()
    val methods = rows.map(_.getAs[String]("method")).toSet
    assert(methods == Set("ivf_fixed", "ivf_trained", "lsh", "pq", "sq8"))
    // every method reports every query, even on total misses
    methods.foreach { m =>
      assert(rows.count(_.getAs[String]("method") == m) == 20, s"method $m")
    }
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("hits") == math.round(rec * 10))
    }
    // per-method mean floors pinned just beneath the measured values
    // (ivf_fixed 0.44, lsh 0.45, pq 0.46 with re-rank, sq8 0.98 on
    // this fixture) — a deliberate probe/quantiser nerf fails the suite
    def mean(m: String): Double =
      rows.filter(_.getAs[String]("method") == m)
        .map(_.getAs[Double]("recall")).sum / 20
    Seq("ivf_fixed" -> 0.40, "ivf_trained" -> 0.50, "lsh" -> 0.42,
      "pq" -> 0.42, "sq8" -> 0.95)
      .foreach { case (m, floor) =>
        info(f"$m mean recall = ${mean(m)}%.3f")
        assert(mean(m) >= floor, s"$m mean recall ${mean(m)} < $floor")
      }
  }

  test("spherical k-means: total assignment, Lloyd improvement, determinism") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val assigned = Similarity.kmeansAssign(emb, k = 8, iters = 2).collect()
    // every vector assigned exactly once, to a real cluster
    assert(assigned.length == n)
    assert(assigned.map(_.getAs[Long]("vec_id")).distinct.length == n)
    assert(assigned.forall { r =>
      val c = r.getAs[Int]("cluster"); c >= 0 && c < 8 })
    assert(assigned.forall { r =>
      val s = r.getAs[Double]("sim"); s >= -1.0 - 1e-6 && s <= 1.0 + 1e-6 })
    // Lloyd iterations improve (or hold) the spherical objective: the
    // mean assigned similarity after 2 updates beats the seed
    // assignment (rounding at 1e-6/1e-9 cannot mask a real regression)
    def meanSim(iters: Int): Double = {
      val rows = Similarity.kmeansAssign(emb, k = 8, iters = iters).collect()
      rows.map(_.getAs[Double]("sim")).sum / rows.length
    }
    val m0 = meanSim(0); val m2 = meanSim(2)
    info(f"mean sim: seed $m0%.4f -> 2 iterations $m2%.4f")
    assert(m2 >= m0 - 1e-6, s"Lloyd iterations regressed the objective: $m0 -> $m2")
    // deterministic: an identical re-run reproduces every assignment
    val again = Similarity.kmeansAssign(emb, k = 8, iters = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("sim"))).toSet
    assert(again == assigned.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"), r.getAs[Double]("sim"))).toSet)
  }

  test("trained-centroid IVF: k rows per query, useful recall@10 vs brute force") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = Similarity.ivfTrainedTopK(emb).collect()
    val exact = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val byQuery = trained.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 20 && byQuery.values.forall(_.length <= 10))
    val hits = trained.count(r =>
      exact((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / exact.size
    info(f"trained-IVF recall@10 = $recall%.3f")
    // nProbe=2 of 8 trained cells: same order as the fixed-seed IVF's
    // floor — a training regression that scrambles centroids fails this
    assert(recall >= 0.35, s"recall $recall")
  }

  test("spherical k-means: empty clusters keep their previous centroid, never crash") {
    import spark.implicits._
    // three identical vectors: everything assigns to cluster 0 from
    // iteration 1 on; clusters 1 and 2 go empty and must survive
    val one = Array.fill(4)(0.5f)
    val emb = Seq((0L, one, 0), (1L, one, 0), (2L, one, 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansAssign(emb, k = 3, iters = 2).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Int]("cluster") == 0))
    assert(out.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-6))
  }
}
