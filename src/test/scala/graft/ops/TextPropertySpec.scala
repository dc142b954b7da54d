package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests over the text/pipeline operators on random corpora:
 * mathematical invariants that hold for ANY input (entropy bounds,
 * weight normalisation, gate monotonicity), drawn from seeded
 * ScalaCheck generators (deterministic across runs). */
class TextPropertySpec extends SparkSpec {

  private val genDocs: Gen[List[(Int, String, String)]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(0, 1 << 20)
      nWords <- Gen.choose(1, 40)
      words <- Gen.listOfN(nWords,
        Gen.oneOf("the", "a", "der", "und", "fox", "dog", "w1", "w2", "w3", "zzz"))
      src <- Gen.oneOf("s0", "s1", "s2")
    } yield (id, words.mkString(" "), src))

  private def cases(n: Int): Seq[List[(Int, String, String)]] =
    (1 to n).map(i => genDocs(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(sys.error("gen failed")))

  test("entropy ∈ [0, ln(n_types)]; type/token ratio ∈ (0, 1]; uniform iff max entropy") {
    import spark.implicits._
    cases(6).foreach { rows =>
      val docs = rows.distinctBy(_._1).map(r => (r._1.toLong, r._2)).toDF("doc_id", "text")
      TextAnalysis.tokenEntropy(docs).collect().foreach { r =>
        val h = r.getAs[Double]("entropy")
        val types = r.getAs[Long]("n_types")
        val tokens = r.getAs[Long]("n_tokens")
        val ttr = r.getAs[Double]("type_token_ratio")
        assert(h >= 0.0 && h <= math.log(types.toDouble) + 1e-6, s"H=$h types=$types")
        assert(ttr > 0.0 && ttr <= 1.0)
        if (types == tokens) assert(math.abs(h - math.log(types.toDouble)) < 1e-5)
      }
    }
  }

  test("source mix weights always sum to 1 and order-match token mass") {
    import spark.implicits._
    cases(6).foreach { rows =>
      val docs = rows.distinctBy(_._1).map(r => (r._1.toLong, r._2, r._3))
        .toDF("doc_id", "text", "source")
      val got = TextAnalysis.sourceMixWeights(docs).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"), r.getAs[Double]("mix_weight")))
      assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4, got.mkString(","))
      // α < 1 preserves the ORDER of sources by mass, only flattens it
      val byMass = got.sortBy(_._2).map(_._3)
      assert(byMass.zip(byMass.tail).forall { case (a, b) => a <= b + 1e-9 }, got.mkString(","))
    }
  }

  test("ingest gate is monotone: a stricter threshold never admits new documents") {
    import spark.implicits._
    cases(4).foreach { rows =>
      val docs = rows.distinctBy(_._1).map(r => (r._1.toLong, r._2)).toDF("doc_id", "text")
      def ids(minQ: Double) = Ingest.runBatch(docs, minQuality = minQ,
        langs = TextAnalysis.langMarkers.map(_._1))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val loose = ids(0.0)
      val strict = ids(0.5)
      assert(strict.subsetOf(loose), s"strict=$strict loose=$loose")
    }
  }

  test("grouped top terms: ranks are dense per group and counts non-increasing") {
    import spark.implicits._
    cases(4).foreach { rows =>
      val docs = rows.distinctBy(_._1).map(r => (r._1.toLong, r._2, r._3))
        .toDF("doc_id", "text", "lang")
      val got = TextAnalysis.topTermsPerGroup(docs, "lang", 5).collect()
        .groupBy(_.getAs[String]("lang"))
      got.values.foreach { grp =>
        val byRank = grp.sortBy(_.getAs[Int]("rank"))
        assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to grp.length))
        val counts = byRank.map(_.getAs[Long]("c"))
        assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
      }
    }
  }
}
