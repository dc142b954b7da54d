package graft.streaming

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.Event
import graft.rules.RuleSpec

/**
 * Output routing — the Spark replacement for the reference's
 * emit-classification + coordinators (reference:
 * src/CorrelationEngine.php:372-391 routing to
 * ActionExecutionCoordinator / MemoryEngine / on-demand sources).
 *
 * Fired records carry a list of typed outputs
 * ({event, action, memory, source}); the router splits them into
 * append-only tables: `actions/`, `memory_writes/`, `events/` (derived
 * events for rule chaining), `sources/`. Failed action executions land
 * in `dead_letter/` and are replayed first on the next run — the
 * at-least-once contract of the reference's errored-action queue
 * (reference: src/Scheduler.php:840-884).
 */
object Sinks {

  /** Explode Fired rows into one row per output. */
  def outputsOf(fired: DataFrame): DataFrame =
    fired.select(
      col("rule"), col("key"), col("kind").as("fire_kind"), col("firedAt"),
      explode(col("outputs")).as("out"))
      .select(
        col("rule"), col("key"), col("fire_kind"), col("firedAt"),
        col("out.kind").as("out_kind"), col("out.name").as("name"),
        col("out.vars").as("vars"))

  /** Batch router: split one Fired dataset into the four output tables
   * (append mode). Returns the per-kind row counts. */
  def routeFiredBatch(fired: DataFrame, baseDir: String): Map[String, Long] = {
    val outs = outputsOf(fired).cache()
    try {
      Seq("action" -> "actions", "memory" -> "memory_writes",
        "event" -> "events", "source" -> "sources").map { case (kind, dir) =>
        val part = outs.filter(col("out_kind") === kind)
        val n = part.count()
        if (n > 0) part.write.mode("append").parquet(s"$baseDir/$dir")
        kind -> n
      }.toMap
    } finally { outs.unpersist(); () }
  }

  /** Streaming router: the same split per micro-batch via foreachBatch
   * (reference cadence: emissions handled as they occur; here per
   * trigger). */
  def routeFiredStreaming(fired: Dataset[RuleEngine.Fired], baseDir: String,
      checkpoint: String): StreamingQuery =
    fired.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[RuleEngine.Fired], _: Long) =>
        routeFiredBatch(batch.toDF(), baseDir); ()
      }
      .start()

  /**
   * K3 — Action parameter validation (reference: JSON-Schema check of
   * Action.vars before dispatch; invalid actions get an argumenterror
   * and are NOT retried —
   * src/Scheduler/ActionExecutionCoordinator.php:229-239). Declarative
   * face: required var keys per action name; returns (valid, invalid).
   */
  def validateActionVars(actions: DataFrame,
      required: Map[String, Seq[String]]): (DataFrame, DataFrame) = {
    val ok = required.foldLeft(lit(true)) { case (acc, (cmd, keys)) =>
      when(col("name") === cmd,
        keys.map(k => map_contains_key(col("vars"), k)).foldLeft(lit(true))(_ && _))
        .otherwise(acc)
    }
    (actions.filter(ok), actions.filter(!ok))
  }

  /** One action-var constraint — the {type, required, enum} subset of
   * JSON-Schema the reference validates Action.vars against
   * (src/Scheduler/ActionExecutionCoordinator.php:229-239).
   * `dataType` is a Spark DDL type; a present value must cast to it
   * (try_cast: "abc" AS INT fails, "42" passes). */
  case class VarSpec(name: String, dataType: String = "string",
      required: Boolean = true, enumVals: Seq[String] = Nil)

  /**
   * K3 — full action parameter validation: required presence, type
   * castability and enum membership per var, per action name. Actions
   * with no schema pass. The invalid side is an argumenterror in the
   * reference — rejected BEFORE dispatch and never retried/dead-
   * lettered — so route only `valid` into [[executeActions]]. Pure
   * Column predicates (codegen'd, null-safe under ANSI via try_*).
   */
  def validateActionVarsTyped(actions: DataFrame,
      schemas: Map[String, Seq[VarSpec]]): (DataFrame, DataFrame) = {
    val ok = schemas.foldLeft(lit(true)) { case (acc, (cmd, specs)) =>
      val checks = specs.map { sp =>
        val v = try_element_at(col("vars"), lit(sp.name))
        val present = if (sp.required) v.isNotNull else lit(true)
        val typed = v.isNull ||
          expr(s"try_cast(try_element_at(vars, '${sp.name}') AS ${sp.dataType})").isNotNull
        val enumOk =
          if (sp.enumVals.isEmpty) lit(true)
          else v.isNull || v.isin(sp.enumVals: _*)
        present && typed && enumOk
      }
      when(col("name") === cmd, checks.foldLeft(lit(true))(_ && _)).otherwise(acc)
    }
    (actions.filter(ok), actions.filter(!ok))
  }

  /** One executed action: ok or captured error (the reference correlates
   * action responses by id and queues failures;
   * src/Scheduler/ActionExecutionCoordinator.php:138-175). */
  case class ActionResult(
      rule: String, key: String, name: String, vars: Map[String, String],
      ok: Boolean, error: String)

  /**
   * Execute actions with a user handler; failures become the dead
   * letter table (at-least-once: callers union `deadLetter` back into
   * the next run's input, mirroring the reference's replay-before-
   * resume; reference: src/Scheduler.php:840-884). The handler runs
   * distributed — it must be serialisable and idempotent.
   */
  def executeActions(spark: SparkSession, actions: DataFrame,
      handler: (String, Map[String, String]) => Unit): Dataset[ActionResult] = {
    import spark.implicits._
    actions
      .select(col("rule"), col("key"), col("name"), col("vars"))
      .as[(String, String, String, Map[String, String])]
      .map { case (rule, key, name, vars) =>
        Try(handler(name, vars)) match {
          case Success(_) => ActionResult(rule, key, name, vars, ok = true, "")
          case Failure(e) => ActionResult(rule, key, name, vars, ok = false,
            String.valueOf(e.getMessage))
        }
      }
  }

  /** Append failed action results to the dead-letter table with an
   * initial attempt count of 1 (the reference queues failures in
   * `erroredActionCommands`; src/Scheduler.php:840-884). Returns the
   * number of rows dead-lettered. */
  def appendDeadLetter(results: Dataset[ActionResult], baseDir: String): Long = {
    // localCheckpoint: materialise exactly once — the count and the
    // write must not re-run the side-effecting handler map upstream
    val failed = results.filter(!_.ok).toDF()
      .select(col("rule"), col("key"), col("name"), col("vars"), col("error"))
      .withColumn("attempts", lit(1))
      .localCheckpoint()
    val n = failed.count()
    if (n > 0) failed.write.mode("append").parquet(s"$baseDir/dead_letter")
    n
  }

  /** Outcome of one [[recoverAndRun]] drain pass. `exhausted` > 0 means
   * actions hit the attempt cap — the reference HALTS the engine after
   * repeated recovery failures (recovery marker + cooldown,
   * src/Scheduler.php:130-141,766-792); callers decide the same. */
  case class RecoveryReport(eligible: Long, succeeded: Long, requeued: Long, exhausted: Long)

  /**
   * K1/S5 — automated errored-action replay: drain the dead-letter
   * table ONCE, before sources resume, exactly like the reference's
   * RECOVERY state (errored actions replayed before `startSources`,
   * each attempt counted, capped at `maxAttempts`;
   * reference: src/Scheduler.php:840-884, 130-141). Successes leave
   * the table; failures are re-queued with attempts+1; rows at the cap
   * are never re-executed and stay in the table for inspection.
   */
  def recoverAndRun(spark: SparkSession, baseDir: String,
      handler: (String, Map[String, String]) => Unit,
      maxAttempts: Int = 3): RecoveryReport = {
    import spark.implicits._
    val dir = s"$baseDir/dead_letter"
    if (!new java.io.File(dir).isDirectory) return RecoveryReport(0L, 0L, 0L, 0L)
    // materialise the current queue before overwriting its directory
    val dl = spark.read.parquet(dir)
      .select(col("rule"), col("key"), col("name"), col("vars"),
        col("error"), col("attempts"))
      .localCheckpoint()
    val results = dl.filter(col("attempts") < maxAttempts)
      .as[(String, String, String, Map[String, String], String, Int)]
      .map { case (rule, key, name, vars, _, attempts) =>
        Try(handler(name, vars)) match {
          case Success(_) => (rule, key, name, vars, "", attempts + 1, true)
          case Failure(e) => (rule, key, name, vars,
            String.valueOf(e.getMessage), attempts + 1, false)
        }
      }
      .toDF("rule", "key", "name", "vars", "error", "attempts", "ok")
      .localCheckpoint() // one replay per action: count/write below re-read blocks, not the handler map
    val requeued = results.filter(!col("ok")).drop("ok")
    val exhausted = dl.filter(col("attempts") >= maxAttempts)
    val report = RecoveryReport(
      eligible = results.count(),
      succeeded = results.filter(col("ok")).count(),
      requeued = requeued.count(),
      exhausted = exhausted.count())
    // both sides are checkpointed, so overwriting the directory they
    // were read from is safe; an empty union writes an empty table
    requeued.unionByName(exhausted).write.mode("overwrite").parquet(dir)
    report
  }

  /**
   * Streaming router WITH action execution and recovery: drains the
   * dead-letter queue (attempt-capped) BEFORE the query starts — the
   * reference's replay-before-resume contract — then per micro-batch
   * routes outputs, executes `action` rows through `handler` and
   * dead-letters new failures (at-least-once).
   */
  def routeAndExecuteStreaming(fired: Dataset[RuleEngine.Fired], baseDir: String,
      checkpoint: String, handler: (String, Map[String, String]) => Unit,
      maxAttempts: Int = 3): StreamingQuery = {
    val spark = fired.sparkSession
    recoverAndRun(spark, baseDir, handler, maxAttempts)
    fired.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[RuleEngine.Fired], _: Long) =>
        val df = batch.toDF()
        routeFiredBatch(df, baseDir)
        val actions = outputsOf(df).filter(col("out_kind") === "action")
        appendDeadLetter(executeActions(spark, actions, handler), baseDir)
        ()
      }
      .start()
  }

  /** Derived events (rule chaining, J6): `event`-kind outputs re-enter
   * the engine as new Events stamped with the fire time (reference
   * futureTick re-entry; src/CorrelationEngine.php:372-391). */
  def derivedEvents(spark: SparkSession, fired: DataFrame): Dataset[Event] = {
    import spark.implicits._
    outputsOf(fired)
      .filter(col("out_kind") === "event")
      .select(
        col("name").as("event"),
        lit(null).cast("string").as("id"),
        col("firedAt").as("datetime"),
        lit(null).cast("timestamp").as("receivedTime"),
        // the engine key wins over an identically-named user var (a
        // plain map_concat throws DUPLICATE_MAP_KEY under the default
        // EXCEPTION dedup policy)
        map_concat(
          map_filter(col("vars"), (k, _) => k =!= "key"),
          map(lit("key"), col("key"))).as("payload"))
      .as[Event]
  }

  /**
   * Acyclic rule chaining in batch (SURVEY §7.5.2): evaluate rules,
   * feed `event` emissions back as a new pass, up to `passes` rounds or
   * until no new derived events — the batch analogue of the reference's
   * next-tick re-ingestion. Returns all fires from all passes.
   *
   * `sourceRegistry` wires S4 on-demand sources into the same loop:
   * each pass's `source`-kind outputs launch their registered batch
   * read (Sources.executeOnDemand) and the fetched events join the
   * derived events of the NEXT pass — the reference launches the
   * source process and its events re-enter handle() the same way
   * (src/Scheduler.php:823-838).
   */
  def runBatchChained(events: Dataset[Event], rules: Seq[RuleSpec],
      passes: Int = 3,
      sourceRegistry: Map[String, (SparkSession, Map[String, String]) => Dataset[Event]] = Map.empty): DataFrame = {
    val spark = events.sparkSession
    // each pass's fires are persisted: the isEmpty probe and the final
    // union action would otherwise re-execute every earlier pass's
    // stateful interpreter lineage (O(passes²) recompute). The cached
    // pieces are small (fire records); callers can clearCache() after
    // consuming the result.
    def nextInput(fires: DataFrame): Dataset[Event] = {
      val derived = derivedEvents(spark, fires)
      if (sourceRegistry.isEmpty) derived
      else derived.union(graft.sources.Sources.executeOnDemand(spark, fires, sourceRegistry))
    }
    var fires = RuleEngine.runBatch(events, rules).toDF().persist()
    var derived = nextInput(fires)
    var all = fires
    var pass = 1
    while (pass < passes && !derived.isEmpty) {
      val next = RuleEngine.runBatch(derived, rules).toDF().persist()
      all = all.unionByName(next)
      derived = nextInput(next)
      pass += 1
    }
    all
  }
}
