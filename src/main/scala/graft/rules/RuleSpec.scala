package graft.rules

import java.time.Duration

import graft.model.Event

/**
 * The Rule algebra as *data* (SURVEY.md §2.8): the reference's Rule
 * subclass surface — step sequence (`EVENTS`), event-time `TIMEOUT`,
 * correlation context, and the onComplete/onTimeout/onProgress hooks
 * (reference: src/StateMachine/AEventProcessor.php:38-72,522-549) —
 * becomes one case class interpreted by a generic stateful operator
 * ([[graft.streaming.RuleEngine]]). A rule is configuration, not a new
 * operator: adding a rule never changes the physical plan shape.
 */
final case class RuleSpec(
    name: String,
    /** Accepted event types per step, in order; Set("*") matches any
     * (reference: src/StateMachine/IEventMatcher.php:27). */
    steps: Seq[Set[String]],
    /** Event-time gap timeout between consecutive steps
     * (reference: src/StateMachine/AEventProcessor.php:122,367-396). */
    timeout: Option[Duration],
    /** Correlation key — the context equi-predicate joining steps
     * (reference: acceptEvent recording context, e.g. orderid;
     * examples/online_shop/rules/CheckOrderPayment.php:72-77). */
    correlate: Event => String,
    /** Never completes; keeps consuming its single step forever
     * (reference: src/Rule/MatchSingleContinuously.php:21-43). */
    continuous: Boolean = false,
    /** Bounded consumed-chain buffer (reference trimEventChain,
     * src/StateMachine/AEventProcessor.php:321-332). */
    chainLimit: Int = 100,
    /** Suppress timeout emission during historical replay
     * (reference: src/StateMachine/AEventProcessor.php:130-132,377-383). */
    historicalIgnoreTimeout: Boolean = false,
    /** Extra accept predicate over (candidate, consumed chain) —
     * arbitrary user logic (reference acceptEvent/acceptSubsequentEvent,
     * src/StateMachine/AEventProcessor.php:229-252). */
    accept: (Event, Seq[Event]) => Boolean = RuleSpec.acceptAll,
    /** F6 — when a matcher of this rule consumes an event, halt all
     * further rule processing of that event (dedup/quarantine;
     * reference EVENT_SUPPRESS, src/CorrelationEngine.php:230-236).
     * Honoured by the aligned-key runner, where rule declaration order
     * is deterministic (SURVEY §7.5.1). */
    suppressOnMatch: Boolean = false,
    onComplete: Seq[Event] => Seq[OutputData] = RuleSpec.noOutputs,
    onTimeout: Seq[Event] => Seq[OutputData] = RuleSpec.noOutputs,
    onProgress: Seq[Event] => Seq[OutputData] = RuleSpec.noOutputs) {
  require(steps.nonEmpty, s"rule $name needs at least one step")

  def acceptsAt(step: Int, eventType: String): Boolean = {
    val s = steps(math.min(step, steps.size - 1))
    s.contains(Event.MatchAny) || s.contains(eventType)
  }

  /** Any step could consume this type (dispatch-index predicate;
   * reference initialEventLookup/waitingForNextEvent,
   * src/CorrelationEngine.php:74-79). */
  def mightAccept(eventType: String): Boolean =
    steps.exists(s => s.contains(Event.MatchAny) || s.contains(eventType))
}

/** A rule emission: the flattened, Dataset-encodable form of the
 * reference's emit taxonomy {Event, Action, ExecuteSource, MemoryWrite}
 * (reference: src/CorrelationEngine.php:107-112,372-391). */
final case class OutputData(
    kind: String, // "event" | "action" | "source" | "memory"
    name: String, // event type / action cmd / source cmd / "ns:key"
    vars: Map[String, String])

object OutputData {
  def event(eventType: String, vars: Map[String, String] = Map.empty): OutputData =
    OutputData("event", eventType, vars)
  def action(cmd: String, vars: Map[String, String] = Map.empty): OutputData =
    OutputData("action", cmd, vars)
  def memory(namespace: String, key: String, value: String, ttlSec: Long = 0L): OutputData =
    OutputData("memory", s"$namespace:$key", Map("value" -> value, "ttl" -> ttlSec.toString))
  def source(cmd: String, vars: Map[String, String] = Map.empty): OutputData =
    OutputData("source", cmd, vars)
}

object RuleSpec {
  val acceptAll: (Event, Seq[Event]) => Boolean = (_, _) => true
  val noOutputs: Seq[Event] => Seq[OutputData] = _ => Nil

  // ---- Library templates mirroring src/Rule/* ---------------------

  /** One-shot single-group match; fires onComplete per matching event,
   * never times out (reference: src/Rule/MatchSingle.php:21-31). */
  def matchSingle(name: String, types: Set[String],
      onMatch: Seq[Event] => Seq[OutputData]): RuleSpec =
    RuleSpec(name, Seq(types), None, _.event, onComplete = onMatch)

  /** Never-completing single-group consumer with bounded chain
   * (reference: src/Rule/MatchSingleContinuously.php:21-43). */
  def matchContinuously(name: String, types: Set[String], keep: Int,
      correlate: Event => String,
      onEvent: Seq[Event] => Seq[OutputData]): RuleSpec =
    RuleSpec(name, Seq(types), None, correlate,
      continuous = true, chainLimit = keep, onProgress = onEvent)

  /** N-step sequence with per-gap timeout — the flagship shape
   * (reference: examples/online_shop/rules/CheckOrderPayment.php:65-86). */
  def sequenceWithTimeout(name: String, steps: Seq[Set[String]], timeout: Duration,
      correlate: Event => String,
      onComplete: Seq[Event] => Seq[OutputData],
      onTimeout: Seq[Event] => Seq[OutputData]): RuleSpec =
    RuleSpec(name, steps, Some(timeout), correlate,
      onComplete = onComplete, onTimeout = onTimeout)

  /** Debounce / session-gap: continuously consume, alarm after a quiet
   * gap (reference: tests/Rules/MatchContinuouslyTillTimeout.php:71-94). */
  def sessionGap(name: String, types: Set[String], gap: Duration,
      correlate: Event => String,
      onGap: Seq[Event] => Seq[OutputData]): RuleSpec =
    RuleSpec(name, Seq(types), Some(gap), correlate,
      continuous = true, onTimeout = onGap)

  /** T2 — @reboot: fire once on the Start/Restored control event
   * (reference: src/Rule/OnStartup.php:18-21). */
  def onStartup(name: String, out: Seq[Event] => Seq[OutputData]): RuleSpec =
    matchSingle(name, Set(Event.Control.Start, Event.Control.Restored), out)

  /** T2 — @shutdown: fire once on the Stop control event
   * (reference: src/Rule/OnShutdown.php:18-21). */
  def onShutdown(name: String, out: Seq[Event] => Seq[OutputData]): RuleSpec =
    matchSingle(name, Set(Event.Control.Stop), out)

  /** T4 — fire per heartbeat control event
   * (reference: src/Rule/OnHeartbeat.php:20-23). */
  def onHeartbeat(name: String, out: Seq[Event] => Seq[OutputData]): RuleSpec =
    matchSingle(name, Set(Event.Control.Heartbeat), out)
}
