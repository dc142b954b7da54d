package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Event
import graft.ops.Correlate
import graft.rules.RuleSpec

/** Property tests (the reference has none — SURVEY §5 adds them):
 * interpreter/SQL-face equivalence on random event streams, and the
 * chain-trim bound. Cases are drawn from seeded ScalaCheck generators
 * (deterministic across runs). */
class RulePropertySpec extends SparkSpec {

  private val genEvents: Gen[List[(Int, String, Int, Int)]] =
    Gen.listOfN(40, for {
      id <- Gen.choose(0, 1 << 20)
      typ <- Gen.oneOf("signup", "purchase", "noise")
      key <- Gen.choose(1, 3)
      minutes <- Gen.choose(0, 300)
    } yield (id, typ, key, minutes))

  private def cases(n: Int): Seq[List[(Int, String, Int, Int)]] =
    (1 to n).map(i => genEvents(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(sys.error("gen failed")))

  private def toEvent(r: (Int, String, Int, Int)): Event = {
    val (id, typ, key, minutes) = r
    Event(typ, Some(id.toString),
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + minutes * 60000L),
      None, Map("key" -> key.toString))
  }

  private val rule = RuleSpec.sequenceWithTimeout(
    "seq", Seq(Set("signup"), Set("purchase")), Duration.ofMinutes(60),
    _.payload("key"), onComplete = _ => Nil, onTimeout = _ => Nil)

  test("interpreter timeout fires == SQL anti-join on random streams") {
    import spark.implicits._
    cases(8).foreach { rows =>
      // unique ids; unique (key, time) — same-instant events within a
      // key are arrival-order-dependent in the reference, which the
      // order-free SQL face deliberately does not model
      val dedup = rows.distinctBy(_._1).distinctBy(r => (r._3, r._4))
      val events = spark.createDataset(dedup.map(toEvent))
      val df = dedup.map { case (id, typ, key, minutes) =>
        (id.toLong,
          new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + minutes * 60000L),
          key.toLong, typ, 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

      val interp = RuleEngine.runBatch(events, Seq(rule))
        .filter(_.kind == "timeout").collect()
        .map(f => (f.key.toLong, f.firstTs)).sorted.toSeq
      val sql = Correlate.sequenceTimeout(df, "signup", "purchase", "1 HOUR")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("first_ts")))
        .sorted.toSeq
      assert(interp == sql, s"case with ${dedup.size} events diverged")
    }
  }

  test("continuous chains never exceed chainLimit") {
    import spark.implicits._
    val cont = RuleSpec.matchContinuously("cont", Set("signup", "purchase", "noise"),
      keep = 7, _.payload("key"), onEvent = _ => Nil)
    cases(4).foreach { rows =>
      val events = spark.createDataset(rows.distinctBy(_._1).map(toEvent))
      val fired = RuleEngine.runBatch(events, Seq(cont)).collect()
      assert(fired.forall(_.chainLen <= 7))
    }
  }

  private val WeekMs = 7L * 24 * 3600 * 1000
  private val weekBase = Timestamp.valueOf("2024-01-01 00:00:00").getTime // a Monday

  private def retentionCase(seed: Long): List[(String, Timestamp)] = {
    val gen = Gen.listOfN(30, for {
      key <- Gen.choose(1, 5)
      week <- Gen.choose(0, 20)
    } yield (key.toString, new Timestamp(weekBase + week * WeekMs)))
    gen(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))
  }

  private def runRetentionTriggers(name: String,
      triggers: Seq[Seq[(String, Timestamp)]]): Seq[Correlate.RetentionCredit] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp)]
    val q = Correlate.retentionStreaming(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try triggers.foreach { t => stream.addData(t); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[Correlate.RetentionCredit].collect().toSeq
  }

  test("retention streaming: anchor-first trigger orders reproduce batch cohorts exactly") {
    import spark.implicits._
    // when each key's earliest week arrives no later than its other
    // weeks (global ascending split ⇒ per-key ascending), no re-anchor
    // ever happens and the appended credits aggregate to EXACTLY the
    // batch retentionCohorts table — the documented input contract
    // under which streaming and batch agree bit-for-bit
    (1 to 4).foreach { seed =>
      val rows = retentionCase(seed.toLong)
      val triggers = rows.sortBy(_._2.getTime)
        .grouped(math.max(1, rows.size / 3)).toSeq
      val credits = runRetentionTriggers(s"ret_anchor_$seed", triggers)
      val streamed = credits
        .groupBy(c => (c.cohort_week, c.week_offset))
        .view.mapValues(_.size.toLong).toMap
      val batch = Correlate.retentionCohorts(rows.toDF("user_id", "ts"))
        .collect()
        .map(r => (r.getAs[Timestamp]("cohort_week"), r.getAs[Int]("week_offset")) ->
          r.getAs[Long]("n_keys")).toMap
      assert(streamed == batch, s"seed $seed: $streamed vs $batch")
    }
  }

  test("retention streaming: ANY order/split credits each true active week exactly once") {
    // arbitrary cross-trigger disorder may re-anchor a key's cohort,
    // but the mask shift must keep every credit consistent with the
    // anchor it was emitted under: per key, the absolute weeks
    // (cohort_week + 7·offset) across ALL emitted credits are exactly
    // the key's true distinct active weeks, each credited once — no
    // double-credit after a re-anchor, no lost week
    (1 to 4).foreach { seed =>
      val rows = retentionCase(100L + seed)
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(rows)
      val triggers = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      val credits = runRetentionTriggers(s"ret_shuffle_$seed", triggers)
      val trueWeeks = rows.groupBy(_._1)
        .view.mapValues(_.map(_._2.getTime).distinct.sorted.toSeq).toMap
      val credited = credits.groupBy(_.key)
        .view.mapValues(_.map(c => c.cohort_week.getTime + c.week_offset * WeekMs)
          .sorted.toSeq).toMap
      assert(credited == trueWeeks,
        s"seed $seed: credited $credited vs true $trueWeeks")
      // and the FINAL anchor is the key's true earliest week: credits
      // emitted at or after the last re-anchor carry it verbatim
      credits.groupBy(_.key).foreach { case (k, cs) =>
        assert(cs.map(_.cohort_week.getTime).min == trueWeeks(k).head,
          s"seed $seed key $k: final anchor drifted")
      }
    }
  }
}
