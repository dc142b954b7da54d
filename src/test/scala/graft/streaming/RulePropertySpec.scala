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
}
