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
   */
  def runBatchChained(events: Dataset[Event], rules: Seq[RuleSpec],
      passes: Int = 3): DataFrame = {
    val spark = events.sparkSession
    // each pass's fires are persisted: the isEmpty probe and the final
    // union action would otherwise re-execute every earlier pass's
    // stateful interpreter lineage (O(passes²) recompute). The cached
    // pieces are small (fire records); callers can clearCache() after
    // consuming the result.
    var fires = RuleEngine.runBatch(events, rules).toDF().persist()
    var derived = derivedEvents(spark, fires)
    var all = fires
    var pass = 1
    while (pass < passes && !derived.isEmpty) {
      val next = RuleEngine.runBatch(derived, rules).toDF().persist()
      all = all.unionByName(next)
      derived = derivedEvents(spark, next)
      pass += 1
    }
    all
  }
}
