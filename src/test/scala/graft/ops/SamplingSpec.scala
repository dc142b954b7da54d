package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("hash sample is deterministic, key-stable, and near the nominal rate") {
    val s1 = Sampling.hashSample(docs, col("doc_id"), 0.25).collect().map(_.getAs[Long]("doc_id")).toSet
    val s2 = Sampling.hashSample(docs, col("doc_id"), 0.25).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(s1 == s2) // same keys every run
    val n = docs.count().toDouble
    assert(s1.size > n * 0.15 && s1.size < n * 0.35)
    // monotone: a higher-rate sample contains the lower-rate one (the
    // property that makes rate changes incremental, not a reshuffle)
    val s3 = Sampling.hashSample(docs, col("doc_id"), 0.5).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(s1.subsetOf(s3))
  }

  test("stratified sample applies per-stratum rates; unlisted strata drop") {
    val out = Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0), defaultRate = 0.0).collect()
    assert(out.nonEmpty && out.forall(_.getAs[String]("lang") == "en"))
    val allEn = docs.filter(col("lang") === "en").count()
    assert(out.length == allEn) // rate 1.0 keeps every row of the stratum
  }

  test("repeat-factor mixing: whole copies exact, fractional copies hash-gated, dense copy indexes") {
    val out = Sampling.repeatFactorSample(docs, col("doc_id"),
      Map("src0" -> 2.0, "src1" -> 1.5, "src2" -> 0.4)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_copies"), r.getAs[Long]("copy_idx")))
    val bySrc = out.groupBy(_._2)
    // integer weight: EVERY src0 doc appears exactly twice
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySrc("src0").groupBy(_._1).forall(_._2.length == 2))
    assert(bySrc("src0").length == 2 * src0Total)
    // fractional weight 1.5: each doc 1 or 2 copies, mean near 1.5
    val perDoc1 = bySrc("src1").groupBy(_._1).map(_._2.length)
    assert(perDoc1.forall(n => n == 1 || n == 2))
    // sub-1 weight 0.4: 0 or 1 copies, docs with 0 copies absent
    val src2Total = docs.filter(col("source") === "src2").count()
    val perDoc2 = bySrc("src2").groupBy(_._1).map(_._2.length)
    assert(perDoc2.forall(_ == 1) && perDoc2.size < src2Total)
    // unlisted sources: default weight 1.0 = exactly one copy each
    assert(bySrc("src3").groupBy(_._1).forall(_._2.length == 1))
    // copy_idx is dense 0..n-1 per doc; n_copies consistent
    out.groupBy(t => (t._1, t._2)).foreach { case (_, copies) =>
      assert(copies.map(_._4).sorted.toSeq == (0L until copies.length.toLong))
      assert(copies.forall(_._3 == copies.length.toLong))
    }
    // deterministic across runs
    val again = Sampling.repeatFactorSample(docs, col("doc_id"),
      Map("src0" -> 2.0, "src1" -> 1.5, "src2" -> 0.4)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_copies"), r.getAs[Long]("copy_idx")))
    assert(again.toSet == out.toSet)
  }

  test("weighted mix: most up-weighted source keeps all; big sources down-sampled toward n^alpha") {
    val out = Sampling.weightedMixSample(docs, col("doc_id"), alpha = 0.5)
    val rates = out.select("source", "keep_rate").distinct()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("keep_rate")).toMap
    // rate ∝ n_tokens^(α−1): the SMALLEST source normalises to 1.0 and
    // every bigger source keeps strictly less
    import org.apache.spark.sql.functions.{size, split, sum}
    val tokens = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val smallest = tokens.minBy(_._2)._1
    assert(rates(smallest) == 1.0)
    assert(tokens.keySet.forall(s => rates(s) <= 1.0 && rates(s) > 0.0))
    // ordering: more tokens → lower keep rate
    val bySize = tokens.toSeq.sortBy(_._2).map(_._1)
    val rateSeq = bySize.map(rates)
    assert(rateSeq.zip(rateSeq.tail).forall { case (a, b) => a >= b })
    // the kept subset is the deterministic hash filter at that rate
    val keptSmallest = out.filter(col("source") === smallest).count()
    assert(keptSmallest == docs.filter(col("source") === smallest).count())
  }

  test("split partitions every row exactly once with stable assignment") {
    val out = Sampling.split(docs, col("doc_id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet.subsetOf(Set("train", "val", "test")))
    assert(out.values.sum == docs.count())
    assert(out("train") > out.getOrElse("val", 0L))
  }

  test("cluster split: near-dup pairs NEVER straddle a split boundary") {
    import spark.implicits._
    // synthetic pair graph over the shared docs fixture: chains that a
    // per-doc hash split would almost surely cut somewhere
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L), (30L, 40L)).toDF("doc_a", "doc_b")
    val out = Sampling.clusterSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_key"), r.getAs[String]("split"))).toMap
    // every doc present exactly once
    assert(out.size == docs.count())
    // the leakage property: both ends of every pair share a split
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(out(a)._2 == out(b)._2, s"pair ($a,$b) straddles splits")
      assert(out(a)._1 == out(b)._1, s"pair ($a,$b) group keys differ")
    }
    // transitivity: 20-21-22-23 all one group
    assert(Seq(20L, 21L, 22L, 23L).map(out(_)._1).distinct.size == 1)
    // singletons keep the plain per-doc assignment (q_p3 compatible)
    val plain = Sampling.split(docs, col("doc_id")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clustered = Set(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 23L, 30L, 40L)
    out.foreach { case (id, (gk, sp)) =>
      if (!clustered(id)) { assert(gk == id); assert(sp == plain(id)) }
    }
  }

  test("per-source cap: at most n per source, nested and append-stable") {
    val out = Sampling.perSourceCap(docs, n = 5).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("pick")))
    // cap respected, pick is 1..n within each source
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= 5, src)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), src)
    }
    // nested property: the n=3 sample is exactly the pick<=3 subset
    val n3 = Sampling.perSourceCap(docs, n = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(n3 == out.filter(_._3 <= 3).map(t => (t._1, t._2)).toSet)
    // append stability: capping a corpus that lost half its docs keeps
    // the surviving picks in the same relative order
    val half = Sampling.perSourceCap(docs.filter(col("doc_id") % 2 === 0), n = 5)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("pick")))
    half.groupBy(_._1).foreach { case (src, rows) =>
      val fullOrder = out.filter(t => t._1 == src && t._2 % 2 == 0).sortBy(_._3).map(_._2)
      val halfOrder = rows.sortBy(_._3).map(_._2)
      // the full sample's even-id picks appear as a prefix-order subset
      assert(fullOrder.zip(halfOrder).forall { case (a, b) => a == b } ||
        halfOrder.startsWith(fullOrder), s"$src: $fullOrder vs $halfOrder")
    }
  }

  test("shuffle shards: a reproducible permutation — every doc exactly once, contiguous positions") {
    val out = Sampling.shuffleShards(docs, nShards = 8, seed = 7L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    val total = docs.count()
    assert(out.length == total && out.map(_._1).distinct.length == total)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are 1..k within each shard, no gaps or ties
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $shard")
    }
    // the permutation actually scatters: consecutive doc_ids land apart
    val shardOf = out.map(t => t._1 -> t._2).toMap
    assert((0L until 20L).map(shardOf).distinct.length > 3)
    // deterministic: a re-run and a differently-partitioned input agree
    val again = Sampling.shuffleShards(docs.repartition(7), nShards = 8, seed = 7L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // a different seed is a different permutation
    val other = Sampling.shuffleShards(docs, nShards = 8, seed = 8L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    assert(out.exists(t => other(t._1) != t._2))
  }

  test("token shards: contiguous per-source packing, monotone, capacity-bounded") {
    val out = Sampling.tokenShards(docs, capacity = 200L).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Int]("shard")))
    assert(out.length == docs.count())
    out.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      // shard ids are monotone non-decreasing in doc order and start at 0
      assert(ordered.head._4 == 0, src)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a._4 <= b._4 })
      // a shard is only left behind once it holds >= capacity tokens:
      // the cumulative count before the first doc of shard s is >= s*cap
      var cum = 0L
      ordered.foreach { case (_, _, n, shard) =>
        assert(cum / 200L == shard)
        cum += n
      }
    }
    // stability: appending later docs never flips old assignments —
    // re-pack a doc_id prefix and compare
    val prefix = Sampling.tokenShards(docs.filter(col("doc_id") < 50), capacity = 200L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    out.filter(_._2 < 50).foreach { case (_, id, _, shard) =>
      assert(prefix(id) == shard, s"doc $id")
    }
  }

  test("pack sequences: exact window tiling, full doc coverage, straddlers span") {
    val window = 64L
    val rows = Sampling.packSequences(docs, window).collect().map(r => (
      r.getAs[String]("source"), r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
      r.getAs[Long]("seq_off")))
    // every document's spans cover [0, n_tokens) exactly once, in
    // consecutive sequences, with matching seq offsets
    rows.groupBy(r => (r._1, r._3)).foreach { case ((src, id), spans) =>
      val s = spans.sortBy(_._2)
      assert(s.head._5 == 0L, s"doc $id first span starts at ${s.head._5}")
      assert(s.last._6 == s.head._4, s"doc $id last span ends at ${s.last._6}")
      s.zip(s.tail).foreach { case (a, b) =>
        assert(b._2 == a._2 + 1, s"doc $id skips a sequence")
        assert(b._5 == a._6, s"doc $id spans not contiguous")
        assert(b._7 == 0L, s"doc $id later span must start its sequence")
      }
      // only the first span of a doc can sit mid-sequence
      assert(s.head._7 < window)
    }
    // every sequence except each source's last is EXACTLY window tokens,
    // assembled from spans whose offsets tile [0, window)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((src, seq), spans) =>
      val lastSeq = rows.filter(_._1 == src).map(_._2).max
      val total = spans.map(s => s._6 - s._5).sum
      if (seq < lastSeq)
        assert(total == window, s"$src seq $seq holds $total tokens")
      else assert(total <= window)
      val sorted = spans.sortBy(_._7)
      assert(sorted.head._7 == 0L)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._7 == a._7 + (a._6 - a._5), s"$src seq $seq offsets don't tile")
      }
    }
    // total packed tokens equal total corpus tokens (nothing lost/padded)
    val corpusTokens = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(r => r._6 - r._5).sum == corpusTokens)
  }

  test("pack sequences properties hold on random corpora (seeded generators)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genDocs: Gen[List[(Int, Int, Int)]] = Gen.listOfN(60, for {
      id <- Gen.choose(0, 1 << 16)
      src <- Gen.choose(0, 3)
      words <- Gen.choose(1, 130) // some docs span multiple 32-token windows
    } yield (id, src, words))
    (1 to 8).foreach { seed =>
      val raw = genDocs(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(sys.error("gen failed"))
        .distinctBy(_._1) // doc_id is the packing order key
      val df = raw.map { case (id, src, words) =>
        (id.toLong, s"s$src", Seq.fill(words)("w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val window = 32L
      val rows = Sampling.packSequences(df, window).collect().map(r => (
        r.getAs[String]("source"), r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("seq_off")))
      // token conservation
      assert(rows.map(r => r._6 - r._5).sum == raw.map(_._3.toLong).sum, s"seed=$seed")
      // per-doc coverage is a contiguous tiling of [0, n)
      rows.groupBy(r => (r._1, r._3)).foreach { case ((_, id), spans) =>
        val s = spans.sortBy(_._2)
        assert(s.head._5 == 0L && s.last._6 == s.head._4, s"seed=$seed doc=$id")
        s.zip(s.tail).foreach { case (a, b) =>
          assert(b._2 == a._2 + 1 && b._5 == a._6 && b._7 == 0L, s"seed=$seed doc=$id") }
      }
      // every non-final sequence per source is exactly `window` tokens
      rows.groupBy(_._1).foreach { case (src, srcRows) =>
        val last = srcRows.map(_._2).max
        srcRows.groupBy(_._2).foreach { case (seq, spans) =>
          val total = spans.map(s => s._6 - s._5).sum
          if (seq < last) assert(total == window, s"seed=$seed $src seq=$seq total=$total")
          else assert(total <= window, s"seed=$seed $src")
        }
      }
    }
  }

  test("streaming pack sequences equals the batch face on in-order arrival") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val fixture = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
      .sortBy(_._1)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val query = Sampling.packSequencesStreaming(
      stream.toDF().toDF("doc_id", "source", "text"), window = 64L)
      .writeStream.format("memory").queryName("pack_out").outputMode("append").start()
    try {
      // randomized trigger boundaries (seeded): the per-source cursor
      // must carry across EVERY split point (docs straddling any
      // boundary still span their sequences)
      val rng = new scala.util.Random(7)
      val cuts = (Seq(0, fixture.length) ++
        Seq.fill(3)(rng.nextInt(fixture.length))).distinct.sorted
      cuts.zip(cuts.tail).foreach { case (a, b) =>
        stream.addData(fixture.slice(a, b).toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()
    def key(r: org.apache.spark.sql.Row) = (
      r.getAs[String]("source"), r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
      r.getAs[Long]("seq_off"))
    val streamed = spark.table("pack_out").collect().map(key).toSet
    val batch = Sampling.packSequences(docs, window = 64L).collect().map(key).toSet
    assert(streamed == batch)
  }

  test("streaming packing invariants survive random trigger splits AND shuffled arrival") {
    // Out-of-order arrival yields a DIFFERENT (but still valid)
    // packing than the batch face — the documented contract is that
    // the tiling invariants hold for WHATEVER order the stream
    // delivered: every emitted sequence except a source's last covers
    // exactly [0, window) with no gap or overlap, every document's
    // spans tile [0, n_tokens), and the per-source cursor only moves
    // forward. Seeded random corpora, global shuffles, random cuts.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val window = 32L
    val genDocs: Gen[List[(Int, Int, Int)]] = Gen.listOfN(40, for {
      id <- Gen.choose(0, 1 << 16)
      src <- Gen.choose(0, 1)
      words <- Gen.choose(1, 90) // straddlers across several windows
    } yield (id, src, words))
    (1 to 3).foreach { seed =>
      val raw = genDocs(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(sys.error("gen failed")).distinctBy(_._1)
      val fixture = raw.map { case (id, src, words) =>
        (id.toLong, s"s$src", Seq.fill(words)("w").mkString(" "))
      }
      val rng = new scala.util.Random(seed * 131)
      val shuffled = rng.shuffle(fixture) // ARRIVAL order ≠ doc_id order
      val cuts = (Seq(0, shuffled.length) ++
        Seq.fill(3)(rng.nextInt(shuffled.length))).distinct.sorted
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val name = s"pack_ooo_$seed"
      val query = Sampling.packSequencesStreaming(
        stream.toDF().toDF("doc_id", "source", "text"), window)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        cuts.zip(cuts.tail).foreach { case (a, b) =>
          stream.addData(shuffled.slice(a, b))
          query.processAllAvailable()
        }
      } finally query.stop()
      val rows = spark.table(name).collect().map(r => (
        r.getAs[String]("source"), r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("seq_off")))
      // global token conservation across whatever packing emerged
      assert(rows.map(r => r._6 - r._5).sum == raw.map(_._3.toLong).sum, s"seed=$seed")
      // per-doc spans tile [0, n) over consecutive sequences
      rows.groupBy(r => (r._1, r._3)).foreach { case ((_, id), spans) =>
        val s = spans.sortBy(_._2)
        assert(s.head._5 == 0L && s.last._6 == s.head._4, s"seed=$seed doc=$id")
        s.zip(s.tail).foreach { case (a, b) =>
          assert(b._2 == a._2 + 1 && b._5 == a._6 && b._7 == 0L,
            s"seed=$seed doc=$id") }
      }
      rows.groupBy(_._1).foreach { case (src, srcRows) =>
        val srcTokens = srcRows.groupBy(_._3).values.map(_.head._4).sum
        val lastSeq = srcRows.map(_._2).max
        // cursor monotone: the highest sequence is where the total
        // token mass says it must be — no skipped or repeated windows
        assert(lastSeq == (srcTokens - 1) / window, s"seed=$seed $src")
        srcRows.groupBy(_._2).foreach { case (seq, spans) =>
          // spans tile the sequence: start at offset 0, contiguous,
          // exactly `window` tokens for every non-final sequence
          val s = spans.sortBy(_._7)
          assert(s.head._7 == 0L, s"seed=$seed $src seq=$seq")
          s.zip(s.tail).foreach { case (a, b) =>
            assert(b._7 == a._7 + (a._6 - a._5), s"seed=$seed $src seq=$seq") }
          val total = s.map(x => x._6 - x._5).sum
          if (seq < lastSeq) assert(total == window, s"seed=$seed $src seq=$seq")
          else assert(total <= window && total == srcTokens - seq * window,
            s"seed=$seed $src last seq")
        }
      }
    }
  }
}
