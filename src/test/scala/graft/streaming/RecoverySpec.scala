package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** JVM-wide probe for the recovery state machine (local mode: executor
 * = driver JVM); separate from SinksRecoveryProbe so suites running in
 * parallel don't race on the flag. */
object RecoveryProbe {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failing = true
  def reset(failing: Boolean): Unit = { this.failing = failing; calls.set(0) }
  val handler: (String, Map[String, String]) => Unit = (_, _) => {
    calls.incrementAndGet()
    if (failing) throw new RuntimeException("downstream down")
    ()
  }
}

class RecoverySpec extends SparkSpec {

  private def seedDeadLetter(dir: String): Unit = {
    import spark.implicits._
    val actions = Seq(("r1", "k1", "notify", Map("ch" -> "email")))
      .toDF("rule", "key", "name", "vars")
    val n = Sinks.appendDeadLetter(
      Sinks.executeActions(spark, actions, RecoveryProbe.handler), dir)
    assert(n == 1L)
  }

  test("clean start with no dead letters runs no recovery") {
    val dir = Files.createTempDirectory("recclean").toString
    val coord = new Recovery.Coordinator(dir)
    assert(coord.start(spark, RecoveryProbe.handler) == Recovery.Started(None))
  }

  test("recovery: cooldown honoured; third consecutive failure leaves marker and refuses start") {
    // mirrors reference tests/SchedulerRecoveryTests.php startup flow +
    // src/Scheduler.php:766-792: marker halts, cooldown waits, 3
    // consecutive failed recoveries create the marker
    val dir = Files.createTempDirectory("recfail").toString
    RecoveryProbe.reset(failing = true)
    seedDeadLetter(dir)

    var now = 1000L
    val coord = new Recovery.Coordinator(dir, maxRecoveryAttempts = 3,
      cooldownSeconds = 60, clock = () => now, sleeper = s => now += s)

    // attempt 1: replay fails → cooldown stamped, marker NOT left
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10) match {
      case Recovery.RecoveryFailed(1, report, false) =>
        assert(report.eligible == 1 && report.requeued == 1)
      case other => fail(s"unexpected: $other")
    }
    assert(!coord.hasMarker)

    // cooldown honoured: an immediate non-waiting start refuses to run
    // recovery and reports the remaining window
    assert(coord.start(spark, RecoveryProbe.handler, wait = false) ==
      Recovery.CoolingDown(60, 1))

    // attempt 2: waits out the cooldown (injected sleeper advances the
    // clock), replays, fails again
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10) match {
      case Recovery.RecoveryFailed(2, _, false) => ()
      case other => fail(s"unexpected: $other")
    }
    assert(now == 1060L) // slept exactly the remaining window

    // attempt 3: final allowed attempt — fails, marker left behind
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10) match {
      case Recovery.RecoveryFailed(3, _, true) => ()
      case other => fail(s"unexpected: $other")
    }
    assert(coord.hasMarker)

    // start 4 refuses outright — the reference's Guru Mediation halt
    coord.start(spark, RecoveryProbe.handler) match {
      case Recovery.Halted(reason) => assert(reason.contains("marker"))
      case other => fail(s"unexpected: $other")
    }

    // operator intervention: clear the marker, fix the downstream —
    // recovery drains and the engine starts
    coord.clearMarker()
    RecoveryProbe.failing = false
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10) match {
      case Recovery.Started(Some(report)) =>
        assert(report.succeeded == 1 && report.requeued == 0)
      case other => fail(s"unexpected: $other")
    }
    assert(spark.read.parquet(s"$dir/dead_letter").count() == 0)
    // and the NEXT start is clean
    assert(coord.start(spark, RecoveryProbe.handler) == Recovery.Started(None))
  }

  test("guarded streaming start: halted boot yields no query; clean boot routes and executes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("recguard").toString
    RecoveryProbe.reset(failing = true)
    seedDeadLetter(dir)
    var now = 1000L
    val coord = new Recovery.Coordinator(dir, maxRecoveryAttempts = 1,
      cooldownSeconds = 60, clock = () => now, sleeper = s => now += s)

    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RuleEngine.Fired]
    // one failed recovery exhausts the cap (max 1) → marker → refuse
    Sinks.routeAndExecuteGuarded(stream.toDS(), dir, s"$dir/ck1",
      RecoveryProbe.handler, coord, maxAttempts = 10) match {
      case Left(Recovery.RecoveryFailed(1, _, true)) => ()
      case other => fail(s"unexpected: $other")
    }
    Sinks.routeAndExecuteGuarded(stream.toDS(), dir, s"$dir/ck1",
      RecoveryProbe.handler, coord, maxAttempts = 10) match {
      case Left(Recovery.Halted(_)) => () // marker left: no query started
      case other => fail(s"unexpected: $other")
    }

    // operator clears + downstream fixed → query starts, drains the
    // dead letter, then routes live fires and executes their actions
    coord.clearMarker()
    RecoveryProbe.reset(failing = false)
    val query = Sinks.routeAndExecuteGuarded(stream.toDS(), dir, s"$dir/ck2",
      RecoveryProbe.handler, coord, maxAttempts = 10) match {
      case Right(q) => q
      case other => fail(s"unexpected: $other")
    }
    try {
      stream.addData(RuleEngine.Fired("r1", "k1", "complete",
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        Seq(graft.rules.OutputData.action("notify", Map("ch" -> "email")))))
      query.processAllAvailable()
    } finally query.stop()
    assert(spark.read.parquet(s"$dir/actions").count() == 1)
    assert(spark.read.parquet(s"$dir/dead_letter").count() == 0)
  }

  test("recovery: expired cooldown resets the consecutive-attempt count") {
    val dir = Files.createTempDirectory("recreset").toString
    RecoveryProbe.reset(failing = true)
    seedDeadLetter(dir)
    var now = 1000L
    val coord = new Recovery.Coordinator(dir, maxRecoveryAttempts = 3,
      cooldownSeconds = 60, clock = () => now, sleeper = s => now += s)
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10)
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10)
    assert(coord.attemptCount() == 2)
    // a quiet period (> cooldown window) resets the counter — only
    // rapid restart loops accumulate toward the halt
    now += 3600L
    assert(coord.cooldownRemaining() == 0L)
    coord.start(spark, RecoveryProbe.handler, maxActionAttempts = 10) match {
      case Recovery.RecoveryFailed(1, _, false) => ()
      case other => fail(s"unexpected: $other")
    }
  }
}
