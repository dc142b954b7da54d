package graft.streaming

import java.util.Properties

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/**
 * K1/S5 — the startup recovery state machine around
 * [[Sinks.recoverAndRun]]: starting → recovery → running | halted
 * (reference: src/Scheduler.php:130-141, 766-792 — recovery marker
 * file, cooldown timestamp file with a consecutive-attempt counter,
 * MAX_RECOVERY_ATTEMPTS = 3, RECOVERY_COOLDOWN_SECONDS = 60).
 *
 * Lifecycle per start():
 *  1. a recovery *marker* file present → [[Recovery.Halted]]: a prior
 *     recovery attempt did not complete (crash mid-recovery) or the
 *     attempt cap was hit — operator intervention required
 *     (reference "Guru Mediation", Scheduler.php:766-779;
 *     the reference sleeps forever instead of exiting so systemd/
 *     docker don't reboot-loop it — a Spark driver returns Halted and
 *     the caller refuses to start the queries);
 *  2. a *cooldown* file younger than `cooldownSeconds` → wait out the
 *     remainder (or return [[Recovery.CoolingDown]] when `wait=false`);
 *     if its consecutive-attempt counter has already reached
 *     `maxRecoveryAttempts`, create the marker and halt
 *     (Scheduler.php:779-792). A cooldown file older than the window
 *     is deleted — the consecutive count only accumulates across
 *     rapid restart loops, a quiet period resets it
 *     (Scheduler.php:573-590 getRecoveryCooldownRemaining);
 *  3. a non-empty dead-letter table → create the marker, transition to
 *     RECOVERY and drain it once via [[Sinks.recoverAndRun]]
 *     (Scheduler.php:840-884 replay-before-resume). All replays
 *     succeeded → clear marker + cooldown, [[Recovery.Started]].
 *     Any replay failed or any action sits exhausted at its per-action
 *     cap → write the cooldown file with attempts+1 and stop
 *     ([[Recovery.RecoveryFailed]]); when that makes
 *     `maxRecoveryAttempts` consecutive failures the marker is left in
 *     place, so the NEXT start refuses outright.
 *
 * Divergence (documented): the reference leaves the marker behind on
 * every controlled failed recovery, which makes its own startup
 * attempt-counter branch unreachable; here the marker survives only a
 * crash mid-recovery or the final (cap-reaching) failure, so the
 * "failed N times consecutively → halt" path is actually exercised.
 *
 * `clock`/`sleeper` are injectable so tests drive the cooldown without
 * wall-clock sleeps. All files live next to the dead-letter table
 * under `baseDir` and are accessed through `baseDir`'s Hadoop
 * filesystem — on a real cluster that is the shared checkpoint
 * filesystem (hdfs://, s3a://), and exactly one driver runs a
 * pipeline, matching the reference's single-scheduler assumption.
 */
object Recovery {

  sealed trait StartOutcome
  /** Normal start; `recovered` is the drain report when a recovery ran. */
  final case class Started(recovered: Option[Sinks.RecoveryReport]) extends StartOutcome
  /** Refused to start — marker present or attempt cap reached. */
  final case class Halted(reason: String) extends StartOutcome
  /** Cooldown active and `wait=false`: retry after `remainingSec`. */
  final case class CoolingDown(remainingSec: Long, attempts: Int) extends StartOutcome
  /** Recovery ran and failed; `halted` when this was the final allowed
   * consecutive attempt (marker left behind). */
  final case class RecoveryFailed(attempts: Int, report: Sinks.RecoveryReport,
      halted: Boolean) extends StartOutcome

  val MaxRecoveryAttempts = 3
  val CooldownSeconds = 60L

  class Coordinator(
      baseDir: String,
      maxRecoveryAttempts: Int = MaxRecoveryAttempts,
      cooldownSeconds: Long = CooldownSeconds,
      clock: () => Long = () => System.currentTimeMillis() / 1000L,
      sleeper: Long => Unit = s => Thread.sleep(s * 1000L),
      hadoopConf: Configuration = new Configuration()) {

    private val base = new Path(baseDir)
    private val markerPath = new Path(base, ".recovery")
    private val cooldownPath = new Path(base, ".cooldown")
    private def fs = base.getFileSystem(hadoopConf)

    def hasMarker: Boolean = fs.exists(markerPath)

    /** Operator intervention: remove the marker and the attempt count
     * (reference clearRecoveryMarker, Scheduler.php:562-570). */
    def clearMarker(): Unit = {
      fs.delete(markerPath, false); fs.delete(cooldownPath, false); ()
    }

    private def createMarker(): Unit = {
      fs.mkdirs(base)
      fs.create(markerPath, true).close()
    }

    private def readCooldown(): Option[(Long, Int)] =
      if (!fs.exists(cooldownPath)) None
      else {
        val p = new Properties()
        val in = fs.open(cooldownPath)
        try p.load(in) finally in.close()
        try Some((p.getProperty("time", "").toLong, p.getProperty("attempts", "0").toInt))
        catch { case _: NumberFormatException => fs.delete(cooldownPath, false); None }
      }

    /** Seconds left in the cooldown window; an expired file is deleted
     * (resetting the consecutive count — see class doc). */
    def cooldownRemaining(): Long = readCooldown() match {
      case None => 0L
      case Some((time, _)) =>
        val elapsed = clock() - time
        if (elapsed >= cooldownSeconds) { fs.delete(cooldownPath, false); 0L }
        else cooldownSeconds - elapsed
    }

    def attemptCount(): Int = readCooldown().map(_._2).getOrElse(0)

    /** Stamp a failed recovery: attempts+1 at the current clock
     * (reference setRecoveryCooldown, Scheduler.php:609-618). */
    private def stampFailure(): Int = {
      val attempts = attemptCount() + 1
      val p = new Properties()
      p.setProperty("time", clock().toString)
      p.setProperty("attempts", attempts.toString)
      fs.mkdirs(base)
      val out = fs.create(cooldownPath, true)
      try p.store(out, null) finally out.close()
      attempts
    }

    /**
     * Run the startup state machine, then (on success) the engine is
     * clear to start its queries. `wait=true` blocks out an active
     * cooldown via `sleeper` like the reference (Scheduler.php:790-792);
     * `wait=false` returns [[CoolingDown]] instead.
     */
    def start(spark: SparkSession,
        handler: (String, Map[String, String]) => Unit,
        maxActionAttempts: Int = 3,
        wait: Boolean = true): StartOutcome = {
      if (hasMarker)
        return Halted(s"recovery marker present: $markerPath — " +
          "previous recovery did not complete; remove the marker to retry")

      val remaining = cooldownRemaining()
      if (remaining > 0) {
        val attempts = attemptCount()
        if (attempts >= maxRecoveryAttempts) {
          createMarker()
          return Halted(s"recovery failed $attempts times consecutively; " +
            s"marker created: $markerPath")
        }
        if (!wait) return CoolingDown(remaining, attempts)
        sleeper(remaining)
      }

      // explicit schema + Try: a dead_letter dir that exists but holds
      // no parquet footers (torn write, manual cleanup) must read as
      // "no dead letters", not throw AnalysisException out of start()
      val hasDeadLetters = fs.exists(new Path(base, "dead_letter")) &&
        scala.util.Try(
          spark.read.schema(Sinks.deadLetterSchema)
            .parquet(s"$baseDir/dead_letter").limit(1).count() > 0
        ).getOrElse(false)
      if (!hasDeadLetters) return Started(None)

      createMarker() // crash inside the drain leaves it → next start halts
      val report = Sinks.recoverAndRun(spark, baseDir, handler, maxActionAttempts)
      if (report.requeued == 0 && report.exhausted == 0) {
        clearMarker()
        Started(Some(report))
      } else {
        val attempts = stampFailure()
        val halted = attempts >= maxRecoveryAttempts
        // a controlled failed attempt clears the marker (cooldown + the
        // counter now guard the restart loop); the cap-reaching one
        // leaves it so the next start refuses outright
        if (!halted) fs.delete(markerPath, false)
        RecoveryFailed(attempts, report, halted)
      }
    }
  }
}
