package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Behavioural cases mirroring the reference's rule tests
 * (reference: tests/RuleTest.php, tests/Rules/MatchContinuouslyTillTimeout.php):
 * sequence completes, timeout fires exactly once per unmatched head,
 * gap sessions split, suppress keeps only the first duplicate. */
class CorrelateSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, t, u, e, v) => (id, ts(t), u, e, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  // order placed/paid shape: signup=head, purchase=continuation
  private val base = events(
    (1L, "2024-01-01 10:00:00", 1L, "signup", 1.0),
    (2L, "2024-01-01 10:30:00", 1L, "purchase", 2.0), // within 1h of #1
    (3L, "2024-01-01 12:00:00", 1L, "signup", 3.0),   // no purchase in 1h → alarm
    (4L, "2024-01-01 14:00:00", 1L, "purchase", 4.0), // too late for #3
    (5L, "2024-01-01 10:00:00", 2L, "signup", 5.0),   // other key, never paid → alarm
    (6L, "2024-01-01 10:10:00", 3L, "purchase", 6.0)  // purchase with no signup: ignored
  )

  test("J2 sequence+timeout alarms exactly the unmatched heads") {
    val got = Correlate.sequenceTimeout(base, "signup", "purchase", "1 HOUR")
      .select("first_event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 5L))
  }

  test("J2 timeout boundary is half-open: continuation at ts+T does not save the head") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "purchase", 0.0)) // exactly +1h → timed out
    val got = Correlate.sequenceTimeout(df, "signup", "purchase", "1 HOUR").count()
    assert(got == 1L)
  }

  test("J1 sequence pairing picks the FIRST continuation") {
    val got = Correlate.sequencePair(base, "signup", "purchase")
      .where("first_event_id = 1").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Timestamp]("then_ts") == ts("2024-01-01 10:30:00"))
  }

  test("J5 gap sessions split on silence > gap") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0), // same session (10 min gap)
      (3L, "2024-01-01 11:30:00", 1L, "view", 0.0), // 80 min silence → new session
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0)) // other key: own session
    val got = Correlate.gapSessions(df, gapSec = 1800L)
    assert(got.count() == 3L)
    val u1 = got.where("user_id = 1").orderBy("session_id")
      .select("n_events").collect().map(_.getLong(0)).toSeq
    assert(u1 == Seq(2L, 1L))
  }

  test("F6 suppress keeps only the first duplicate per (key,type,minute)") {
    val df = events(
      (1L, "2024-01-01 10:00:01", 1L, "click", 0.0),
      (2L, "2024-01-01 10:00:30", 1L, "click", 0.0), // same minute dup → suppressed
      (3L, "2024-01-01 10:01:00", 1L, "click", 0.0)) // next minute → kept
    val got = Correlate.suppressDuplicates(df)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("J6 chained escalation thresholds reminder counts") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 12:00:00", 1L, "signup", 0.0),
      (3L, "2024-01-01 14:00:00", 1L, "signup", 0.0), // user 1: 3 alarms
      (4L, "2024-01-01 10:00:00", 2L, "signup", 0.0)) // user 2: 1 alarm
    val got = Correlate.chainedEscalation(df, "signup", "purchase", "1 HOUR", 3L)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("J9 memory enrichment joins the latest observation per key") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-01 11:00:00", 1L, "purchase", 20.0), // latest memory for user 1
      (3L, "2024-01-01 12:00:00", 1L, "error", 0.0),
      (4L, "2024-01-01 12:00:00", 2L, "error", 0.0)) // no memory → null
    val got = Correlate.enrichFromMemory(df, "purchase", "error")
    val byUser = got.collect()
      .map(r => r.getAs[Long]("user_id") -> Option(r.getAs[java.lang.Double]("memory_value"))).toMap
    assert(byUser(1L).contains(20.0))
    assert(byUser(2L).isEmpty)
  }

  test("funnel counts ordered step reach; out-of-order steps don't count") {
    val df = events(
      // u1 completes the full funnel in order
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:20:00", 1L, "purchase", 0.0),
      // u2 views BEFORE signing up and never views again → stuck at step 0
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:00:00", 2L, "signup", 0.0),
      (6L, "2024-01-01 11:00:00", 2L, "purchase", 0.0),
      // u3 signs up and views, never purchases → step 1
      (7L, "2024-01-01 10:00:00", 3L, "signup", 0.0),
      (8L, "2024-01-01 10:30:00", 3L, "view", 0.0),
      // u4 purchases only → counted nowhere
      (9L, "2024-01-01 10:00:00", 4L, "purchase", 0.0))
    val got = Correlate.funnel(df, Seq("signup", "view", "purchase"))
      .collect().map(r => (r.getAs[String]("step"),
        r.getAs[Int]("step_idx"), r.getAs[Long]("n_keys"))).toSet
    assert(got == Set(("signup", 0, 3L), ("view", 1, 2L), ("purchase", 2, 1L)))
  }

  test("funnel: a repeated consecutive step requires a second occurrence") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),  // one view only
      (2L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (3L, "2024-01-01 10:05:00", 2L, "view", 0.0))  // two views
    val got = Correlate.funnel(df, Seq("view", "view")).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_keys")).toMap
    assert(got == Map(0 -> 2L, 1 -> 1L))
  }

  test("funnel with step timeouts drops conversions the untimed funnel keeps") {
    val df = events(
      // u1: converts fast — every gap 10 min, inside the 15-min budget
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:20:00", 1L, "purchase", 0.0),
      // u2: converts but the view comes 2 h after signup → timed out
      (4L, "2024-01-01 10:00:00", 2L, "signup", 0.0),
      (5L, "2024-01-01 12:00:00", 2L, "view", 0.0),
      (6L, "2024-01-01 12:05:00", 2L, "purchase", 0.0))
    val untimed = Correlate.funnel(df, Seq("signup", "view", "purchase")).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_keys")).toMap
    assert(untimed == Map(0 -> 2L, 1 -> 2L, 2 -> 2L))
    val timed = Correlate.funnelTimed(df, Seq("signup", "view", "purchase"),
      Seq(900L, 900L)).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_keys")).toMap
    assert(timed == Map(0 -> 2L, 1 -> 1L, 2 -> 1L))
  }

  test("funnel: a timed-out step yields a zero row, not a missing row") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 12:00:00", 1L, "view", 0.0))
    val got = Correlate.funnelTimed(df, Seq("signup", "view"), Seq(900L)).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_keys")).toMap
    assert(got == Map(0 -> 1L, 1 -> 0L))
  }

  test("funnel: a non-consecutive repeated step can't reuse the original event on ties") {
    val df = events(
      // u1: one A and one B at the SAME timestamp — the single A must
      // not satisfy both copies of the A step
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      // u2: a genuine second A strictly later
      (3L, "2024-01-01 10:00:00", 2L, "signup", 0.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:05:00", 2L, "signup", 0.0))
    val got = Correlate.funnel(df, Seq("signup", "view", "signup")).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_keys")).toMap
    assert(got == Map(0 -> 2L, 1 -> 2L, 2 -> 1L))
  }

  test("retention cohorts: offsets count a cohort's keys active k weeks after first-seen") {
    // weeks are Monday-started; 2024-01-01 is a Monday
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),  // u1 cohort W0
      (2L, "2024-01-09 10:00:00", 1L, "view", 0.0),  // u1 active W1
      (3L, "2024-01-16 10:00:00", 1L, "view", 0.0),  // u1 active W2
      (4L, "2024-01-02 10:00:00", 2L, "view", 0.0),  // u2 cohort W0
      (5L, "2024-01-03 11:00:00", 2L, "view", 0.0),  // same week: one row
      (6L, "2024-01-08 10:00:00", 3L, "view", 0.0))  // u3 cohort W1
    val got = Correlate.retentionCohorts(df)
      .collect().map(r => (r.getAs[Timestamp]("cohort_week"),
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_keys"))).toSet
    val w0 = ts("2024-01-01 00:00:00")
    val w1 = ts("2024-01-08 00:00:00")
    assert(got == Set((w0, 0, 2L), (w0, 1, 1L), (w0, 2, 1L), (w1, 0, 1L)))
  }

  test("streaming retention credits aggregate to the batch cohort table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def creditSet(df: DataFrame): Set[(Timestamp, Int, Long)] = df
      .groupBy("cohort_week", "week_offset").agg(count(lit(1)).as("n_keys"))
      .collect().map(r => (r.getAs[Timestamp]("cohort_week"),
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_keys"))).toSet
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1 cohort W0
      (1L, ts("2024-01-09 10:00:00")), // u1 active W1
      (2L, ts("2024-01-10 10:00:00")), // u2 cohort W1
      (1L, ts("2024-01-25 10:00:00")), // u1 active W3
      (2L, ts("2024-01-16 09:00:00")), // u2 offset 1
      (2L, ts("2024-01-17 11:00:00")), // same week: no new credit
      (3L, ts("2024-01-16 12:00:00"))) // u3 cohort W2
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val query = Correlate.retentionStreaming(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ret_out")
      .outputMode("append").start()
    try {
      // three triggers: state carries cohorts/credits across them
      rows.grouped(3).foreach { b => stream.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val eventsDf = rows.toDF("user_id", "ts")
    val batch = Correlate.retentionCohorts(eventsDf)
      .collect().map(r => (r.getAs[Timestamp]("cohort_week"),
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_keys"))).toSet
    assert(creditSet(spark.table("ret_out")) == batch)
    // the same stateful function run in BATCH mode (fresh state, one
    // group call per key) agrees too — on this frame and the fixture
    assert(creditSet(Correlate.retentionStreaming(eventsDf).toDF()) == batch)
    val fixture = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(creditSet(Correlate.retentionStreaming(fixture).toDF()) ==
      Correlate.retentionCohorts(fixture)
        .collect().map(r => (r.getAs[Timestamp]("cohort_week"),
          r.getAs[Int]("week_offset"), r.getAs[Long]("n_keys"))).toSet)
  }

  test("retention re-anchor markers make out-of-order streams consumer-correctable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val weekMs = 7L * 24 * 3600 * 1000
    // u1's FIRST week arrives a trigger late (W1 before W0) — the
    // documented divergence: the (W1, 0) credit emitted in trigger 1
    // is superseded once W0 re-anchors the cohort. u2 is in-order.
    val t1 = Seq((1L, ts("2024-01-08 10:00:00")), (2L, ts("2024-01-01 09:00:00")))
    val t2 = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-08 09:00:00")))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val query = Correlate.retentionStreaming(
      stream.toDF().toDF("user_id", "ts"), markReanchors = true)
      .writeStream.format("memory").queryName("ret_marked")
      .outputMode("append").start()
    try Seq(t1, t2).foreach { b => stream.addData(b); query.processAllAvailable() }
    finally query.stop()
    val out = spark.table("ret_marked").as[Correlate.RetentionCredit].collect().toSeq
    // exactly one marker: u1's re-anchor to W0 (u2 never re-anchors)
    val markers = out.filter(_.week_offset == -1)
    assert(markers.map(m => (m.key, m.cohort_week)) ==
      Seq(("1", ts("2024-01-01 00:00:00"))))
    // consumer recipe from the scaladoc: rebase superseded credits
    // (cohort_week > the key's minimal marker anchor) onto the anchor,
    // preserving the absolute week — reproduces batch cohorts exactly
    val anchors = markers.groupBy(_.key)
      .view.mapValues(_.map(_.cohort_week.getTime).min).toMap
    val rebased = out.filter(_.week_offset >= 0).map { c =>
      anchors.get(c.key) match {
        case Some(a) if c.cohort_week.getTime > a =>
          val shift = (c.cohort_week.getTime - a) / weekMs
          (new Timestamp(a), (shift + c.week_offset).toInt)
        case _ => (c.cohort_week, c.week_offset)
      }
    }
    val cohortCounts = rebased.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val batch = Correlate.retentionCohorts((t1 ++ t2).toDF("user_id", "ts"))
      .collect().map(r => (r.getAs[Timestamp]("cohort_week"),
        r.getAs[Int]("week_offset")) -> r.getAs[Long]("n_keys")).toMap
    assert(cohortCounts == batch, s"$cohortCounts vs $batch")
    // the DEFAULT path emits no markers on the same disordered input —
    // existing consumers see an unchanged output contract
    val plain = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val q2 = Correlate.retentionStreaming(plain.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("ret_unmarked")
      .outputMode("append").start()
    try Seq(t1, t2).foreach { b => plain.addData(b); q2.processAllAvailable() }
    finally q2.stop()
    assert(spark.table("ret_unmarked").as[Correlate.RetentionCredit]
      .collect().forall(_.week_offset >= 0))
  }
}
