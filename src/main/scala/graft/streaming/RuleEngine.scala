package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.Event
import graft.rules.{OutputData, RuleSpec}

/**
 * The generic rule interpreter — the Spark-native replacement for the
 * reference's CorrelationEngine::handle() hot loop
 * (reference: src/CorrelationEngine.php:171-328). Rules are data
 * ([[RuleSpec]]); this engine is the single stateful operator that
 * interprets all of them.
 *
 * Semantics preserved from the reference:
 *  - event-time everything: matching and timeouts use `event.datetime`,
 *    never arrival time (reference: AEventProcessor.php:357-361);
 *  - batch replay fires due timeouts *before* handling each event, in
 *    event-time order (the virtual clock;
 *    reference: src/CorrelationEngine.php:191-202);
 *  - the timeout window is half-open: an event at exactly the deadline
 *    times the matcher out rather than advancing it;
 *  - multiple concurrent matchers per (rule, key): a new head event
 *    spawns a second matcher rather than being dropped (reference
 *    spawns one matcher per accepted initial event,
 *    src/CorrelationEngine.php:244-280), with the duplicate-start guard:
 *    an event consumed by a live matcher of a rule does not also spawn
 *    a new matcher of that rule (skipMatchers,
 *    src/CorrelationEngine.php:215,252-255);
 *  - bounded state: chains are trimmed to `chainLimit` and matcher
 *    counts capped (reference trimEventChain + memory valves);
 *  - same-instant events within a key are ordered by event id (the
 *    reference is arrival-order-dependent here; the SQL faces are
 *    deliberately order-free, so equivalence holds only for streams
 *    without same-key timestamp ties — true of the fixtures).
 *
 * Scale design: the batch face never collects a group into memory —
 * it repartitions by (rule, key), sorts within partitions by event
 * time, and streams over consecutive runs (mapPartitions). State per
 * key is O(live matchers × chainLimit). The streaming face is the same
 * step function inside `flatMapGroupsWithState` with event-time
 * timeouts driven by the watermark.
 */
object RuleEngine {

  /** One live matcher instance (reference Matcher state,
   * src/StateMachine/AEventProcessor.php:435-457). `seq` is the
   * matcher's REGISTRATION number within its key group — the aligned
   * faces allocate it monotonically across ALL rules so equal-deadline
   * timeouts can fire in registration order, the reference's stable
   * uasort semantics (src/CorrelationEngine.php:515-523: the sort is
   * stable over one queue of every rule's matchers, so same-deadline
   * matchers keep the order they were armed in, not declaration
   * order). Single-rule faces leave it 0: within one rule the matcher
   * vector is already in creation order and the stable per-rule sort
   * preserves it. A progressing matcher KEEPS its seq (the reference
   * mutates the same Matcher object in place — its queue position
   * doesn't change on progress). */
  case class MatcherState(
      step: Int,
      chain: Seq[Event],
      timeoutAtUs: Option[Long],
      seq: Long = 0L)

  /** All live matchers for one (rule, key) group. */
  case class KeyState(matchers: Seq[MatcherState])

  /** A fire record: one onComplete/onTimeout/onProgress dispatch
   * (reference fire(), src/StateMachine/AEventProcessor.php:522-537). */
  case class Fired(
      rule: String,
      key: String,
      kind: String, // complete | timeout | progress
      firedAt: Timestamp,
      chainLen: Int,
      firstTs: Timestamp,
      lastTs: Timestamp,
      outputs: Seq[OutputData])

  /** Internal routing row (public: Catalyst codegen needs access).
   * `eventTime` duplicates event.effectiveTime at the top level so the
   * streaming face can watermark it after routing. */
  case class Keyed(rule: String, key: String, eventTime: Timestamp, event: Event)

  /** Max concurrent matchers per key — the explicit bound replacing the
   * reference's GC/memory-pressure valves. */
  val MaxMatchersPerKey = 1000

  /** Rule sets must be unambiguous: routing emits one keyed row per
   * matching rule NAME, so duplicate names would double-feed one group
   * and interpret it under whichever spec toMap kept. */
  private def requireUniqueNames(rules: Seq[RuleSpec]): Unit =
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).distinct.mkString(", ")}")

  /** Microsecond precision throughout: the fixtures carry µs timestamps
   * and Timestamp.getTime would truncate to ms. */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  // ---------------------------------------------------------------
  // Core step function (shared by batch + streaming faces)
  // ---------------------------------------------------------------

  /** Feed one event-time-ordered event into the matcher set; returns
   * updated matchers + fires. Pure function — no engine state.
   * `emitTimeouts=false` destroys due matchers silently (the
   * reference's HISTORICAL_IGNORE_TIMEOUT replay mode,
   * src/StateMachine/AEventProcessor.php:130-132,377-383). */
  private def stepOne(
      rule: RuleSpec,
      key: String,
      matchers: Vector[MatcherState],
      e: Event,
      emitTimeouts: Boolean = true): (Vector[MatcherState], Vector[Fired]) = {
    val (m1, f1) = fireDue(rule, key, matchers, micros(e.effectiveTime), emitTimeouts)
    val (m2, f2, _) = offer(rule, key, m1, e)
    (m2, f1 ++ f2)
  }

  /** Virtual clock: fire timeouts due strictly before/at `nowUs`
   * (reference advances the clock to event time − 1ms then fires; an
   * event AT the deadline still cannot be consumed → <=). */
  private def fireDue(
      rule: RuleSpec,
      key: String,
      matchers: Vector[MatcherState],
      nowUs: Long,
      emitTimeouts: Boolean): (Vector[MatcherState], Vector[Fired]) = {
    val (due, alive) = matchers.partition(_.timeoutAtUs.exists(_ <= nowUs))
    val fires =
      if (emitTimeouts) due.sortBy(_.timeoutAtUs.get).map { m =>
        fired(rule, key, "timeout", microsToTs(m.timeoutAtUs.get), m.chain, rule.onTimeout(m.chain))
      } else Vector.empty[Fired]
    (alive, fires)
  }

  /** Clock advance across ALL rules of an aligned face: due timeouts
   * fire in GLOBAL deadline order, ties in rule-declaration order.
   * The reference keeps ONE deadline-sorted queue over every running
   * matcher regardless of class (uasort by timeout,
   * src/CorrelationEngine.php:515-523; the stable sort leaves equal
   * deadlines in registration order, which for matchers armed by the
   * same event is declaration order). Firing rule-by-rule instead
   * would emit rule A's later deadline before rule B's earlier one
   * whenever both aged past the clock between two events — a
   * cross-rule emission-order deviation q_e6 pins. Due matchers of
   * rules where `emitFor` is false are destroyed silently (the
   * historical-ignore replay mode), same as [[fireDue]]. Mutates
   * `matchers` in place. */
  private def fireDueAcross(ruleArr: IndexedSeq[RuleSpec], key: String,
      matchers: Array[Vector[MatcherState]], nowUs: Long,
      emitFor: RuleSpec => Boolean): Vector[Fired] = {
    val dues = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, MatcherState)]
    var i = 0
    while (i < matchers.length) {
      val (due, alive) = matchers(i).partition(_.timeoutAtUs.exists(_ <= nowUs))
      matchers(i) = alive
      if (emitFor(ruleArr(i)))
        due.foreach(m => dues += ((m.timeoutAtUs.get, i, m)))
      i += 1
    }
    // equal deadlines fire in REGISTRATION order (the allocator seq),
    // the reference's stable single-queue uasort: a matcher armed
    // earlier fires first even if its rule is declared later. Rule
    // index is the final fallback for seq-less (restored v0) state;
    // the sort is stable so same-rule matchers keep creation order.
    dues.sortBy(t => (t._1, t._3.seq, t._2)).iterator.map { case (_, ri, m) =>
      fired(ruleArr(ri), key, "timeout", microsToTs(m.timeoutAtUs.get), m.chain,
        ruleArr(ri).onTimeout(m.chain))
    }.toVector
  }

  /** Offer the event to each live matcher in creation order; spawn with
   * the duplicate-start guard. Returns (alive, fires, handled).
   * `alloc` hands a fresh registration seq to each NEWLY spawned
   * matcher (see [[MatcherState.seq]]); progressing matchers keep
   * theirs. Single-rule faces use the 0-allocator default. */
  private def offer(
      rule: RuleSpec,
      key: String,
      alive0: Vector[MatcherState],
      e: Event,
      alloc: () => Long = () => 0L): (Vector[MatcherState], Vector[Fired], Boolean) = {
    val eUs = micros(e.effectiveTime)
    var fires = Vector.empty[Fired]
    var alive = Vector.empty[MatcherState]
    var handled = false
    alive0.foreach { m =>
      if (rule.acceptsAt(m.step, e.event) && rule.accept(e, m.chain)) {
        handled = true
        val chain = (m.chain :+ e).takeRight(rule.chainLimit)
        val complete = !rule.continuous && m.step + 1 == rule.steps.size
        if (complete) {
          fires :+= fired(rule, key, "complete", e.effectiveTime, chain, rule.onComplete(chain))
        } else {
          val nextStep = math.min(m.step + 1, rule.steps.size - 1)
          fires :+= fired(rule, key, "progress", e.effectiveTime, chain, rule.onProgress(chain))
          alive :+= MatcherState(nextStep, chain,
            rule.timeout.map(t => eUs + t.toNanos / 1000L), m.seq)
        }
      } else alive :+= m
    }

    // duplicate-start guard: spawn a new matcher only if no live
    // matcher of this rule consumed the event
    if (!handled && rule.acceptsAt(0, e.event) && rule.accept(e, Nil)
        && alive.size < MaxMatchersPerKey) {
      handled = true
      val chain = Vector(e)
      val complete = !rule.continuous && rule.steps.size == 1
      if (complete) {
        fires :+= fired(rule, key, "complete", e.effectiveTime, chain, rule.onComplete(chain))
      } else {
        fires :+= fired(rule, key, "progress", e.effectiveTime, chain, rule.onProgress(chain))
        alive :+= MatcherState(math.min(1, rule.steps.size - 1), chain,
          rule.timeout.map(t => eUs + t.toNanos / 1000L), alloc())
      }
    }
    (alive, fires, handled)
  }

  private def fired(rule: RuleSpec, key: String, kind: String, at: Timestamp,
      chain: Seq[Event], outputs: Seq[OutputData]): Fired =
    Fired(rule.name, key, kind, at, chain.size,
      chain.headOption.map(_.effectiveTime).getOrElse(at),
      chain.lastOption.map(_.effectiveTime).getOrElse(at),
      outputs)

  /** Interpret an ordered run of events for one (rule, key). */
  private def interpretRun(
      rule: RuleSpec,
      key: String,
      events: Iterator[Event],
      initial: Vector[MatcherState]): (Vector[MatcherState], Vector[Fired]) =
    events.foldLeft((initial, Vector.empty[Fired])) {
      case ((ms, fs), e) =>
        val (ms2, fs2) = stepOne(rule, key, ms, e)
        (ms2, fs ++ fs2)
    }

  // ---------------------------------------------------------------
  // Batch face
  // ---------------------------------------------------------------

  /**
   * Batch (historical replay) face: exact reference semantics over a
   * static Dataset — the equivalent of batch mode with the virtual
   * clock (reference: src/Clocks/BatchClock.php + CorrelationEngine
   * 191-202). One shuffle keyed by (rule, key); events are sorted
   * within partitions and streamed over consecutive key runs — no
   * per-group materialisation, so a hot key never OOMs the executor.
   *
   * End-of-data flush: once a key's run ends no further event can save
   * a pending matcher, so every armed deadline is decidable and fires
   * (this matches the SQL faces, which alarm heads whose window
   * extends past the data; the streaming face instead keeps such state
   * for the next trigger). Rules with `historicalIgnoreTimeout` drop
   * their timeout emissions in this replay mode.
   */
  def runBatch(events: Dataset[Event], rules: Seq[RuleSpec],
      numPartitions: Int = 0): Dataset[Fired] = {
    requireUniqueNames(rules)
    val spark = events.sparkSession
    import spark.implicits._
    val ruleMap = rules.map(r => r.name -> r).toMap
    val keyed = events.flatMap { e =>
      rules.iterator.filter(_.mightAccept(e.event))
        .map(r => Keyed(r.name, r.correlate(e), e.effectiveTime, e))
    }
    // numPartitions: callers with KNOWN-tiny inputs (cron tick grids,
    // control streams) pass a small explicit count — the default
    // session shuffle width pays ~32 task setups + in-partition sorts
    // for a few hundred rows. Output is partition-count-invariant
    // (hash by key, per-key sorted runs), so this is purely a cost hint.
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    keyed
      .repartition(parts, $"rule", $"key")
      // eventTime = effectiveTime (receivedTime override applied) — the
      // engine's clock, NOT raw datetime
      .sortWithinPartitions($"rule", $"key", $"eventTime", $"event.id")
      .mapPartitions { it =>
        new Iterator[Iterator[Fired]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[Fired] = {
            val head = buf.head
            val rule = ruleMap(head.rule)
            val emit = !rule.historicalIgnoreTimeout
            var out = Vector.empty[Fired]
            var matchers = Vector.empty[MatcherState]
            while (buf.hasNext && buf.head.rule == head.rule && buf.head.key == head.key) {
              val (m2, fs) = stepOne(rule, head.key, matchers, buf.next().event, emit)
              matchers = m2
              out ++= fs
            }
            // end-of-data flush: no later event can save these matchers
            if (emit) matchers
              .filter(_.timeoutAtUs.isDefined)
              .sortBy(_.timeoutAtUs.get)
              .foreach { m =>
                out :+= fired(rule, head.key, "timeout",
                  microsToTs(m.timeoutAtUs.get), m.chain, rule.onTimeout(m.chain))
              }
            out.iterator
          }
        }.flatten
      }
  }

  /**
   * Aligned-key batch face with deterministic cross-rule suppress
   * ordering (F6; SURVEY §7.5.1 hard part): all rules share one
   * correlation key, are evaluated in declaration order per event, and
   * a `suppressOnMatch` rule that consumes the event halts the
   * remaining rules — the reference's single-threaded loop semantics
   * (reference: src/CorrelationEngine.php:230-236 suppress breaks the
   * matcher loop and skips new-matcher instantiation). Timeouts of ALL
   * rules still fire on clock advance regardless of suppression
   * (reference fires triggerTimeouts before handling each event), in
   * GLOBAL deadline order across rules ([[fireDueAcross]]).
   * Same scale shape as [[runBatch]]: one shuffle on the key, sorted
   * runs, no per-group materialisation.
   */
  def runBatchAligned(events: Dataset[Event], rules: Seq[RuleSpec],
      key: Event => String): Dataset[Fired] = {
    requireUniqueNames(rules)
    val spark = events.sparkSession
    import spark.implicits._
    val ruleArr = rules.toIndexedSeq
    val keyed = events.map(e => Keyed("", key(e), e.effectiveTime, e))
    keyed
      .repartition($"key")
      .sortWithinPartitions($"key", $"eventTime", $"event.id")
      .mapPartitions { it =>
        new Iterator[Iterator[Fired]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[Fired] = {
            val k = buf.head.key
            val matchers = Array.fill(ruleArr.size)(Vector.empty[MatcherState])
            // one registration counter across ALL rules of the key:
            // equal-deadline timeouts fire in arming order (see
            // MatcherState.seq)
            var nextSeq = 0L
            val alloc = () => { val s = nextSeq; nextSeq += 1; s }
            var out = Vector.empty[Fired]
            while (buf.hasNext && buf.head.key == k) {
              val e = buf.next().event
              val eUs = micros(e.effectiveTime)
              // clock advance: due timeouts across ALL rules fire
              // first, in global deadline order (see fireDueAcross)
              out ++= fireDueAcross(ruleArr, k, matchers, eUs,
                r => !r.historicalIgnoreTimeout)
              // declaration-order evaluation with suppress short-circuit
              var suppressed = false
              var i = 0
              while (i < ruleArr.size && !suppressed) {
                val r = ruleArr(i)
                if (r.mightAccept(e.event)) {
                  val (m, f, handled) = offer(r, k, matchers(i), e, alloc)
                  matchers(i) = m
                  out ++= f
                  if (handled && r.suppressOnMatch) suppressed = true
                }
                i += 1
              }
            }
            // end-of-data flush (same contract as runBatch), still in
            // global deadline order across rules
            out ++= fireDueAcross(ruleArr, k, matchers, Long.MaxValue,
              r => !r.historicalIgnoreTimeout)
            out.iterator
          }
        }.flatten
      }
  }

  /** Per-key state for the aligned faces: one matcher vector per rule,
   * indexed by declaration order. `ruleSetId` fingerprints the rule
   * list that wrote the state: positional indexing means a checkpoint
   * restarted with a CHANGED rule list would silently hand one rule
   * another rule's matchers — worse than the missing-rule crash the
   * keyed face tolerates. On mismatch the whole key's state is
   * discarded (the reference drops un-restorable matchers the same
   * way; src/CorrelationEngine.php:680-766). */
  case class AlignedState(perRule: Seq[Seq[MatcherState]], ruleSetId: String)

  /** Declaration-order fingerprint for [[AlignedState]]. */
  def ruleSetId(rules: Seq[RuleSpec]): String = rules.map(_.name).mkString("\u0000")

  // ---------------------------------------------------------------
  // Streaming face
  // ---------------------------------------------------------------

  /**
   * Streaming face: the same step function inside
   * `flatMapGroupsWithState` with `EventTimeTimeout`. The watermark is
   * applied here (on the routed rows' top-level eventTime — mapping
   * strips watermark tags, so callers can't pre-apply it). Within a
   * micro-batch, a group's events are sorted by event time (micro-batch
   * volumes per key are small); across batches the state store carries
   * matchers and the watermark drives timeout firing — the
   * microbatch-granularity analogue of the reference's armed loop timer
   * (reference: src/CorrelationEngine.php:530-563).
   */
  def runStreaming(events: Dataset[Event], rules: Seq[RuleSpec],
      watermarkDelay: String = "0 seconds"): Dataset[Fired] = {
    requireUniqueNames(rules)
    val spark = events.sparkSession
    import spark.implicits._
    val ruleMap = rules.map(r => r.name -> r).toMap
    // Events matching no rule still must advance the event-time clock
    // (they carry the watermark, like the reference's virtual clock
    // advancing on every event) — route them as no-op ticks to one
    // dummy group that never holds state.
    val keyed = events.flatMap { e =>
      val routed = rules.filter(_.mightAccept(e.event))
        .map(r => Keyed(r.name, r.correlate(e), e.effectiveTime, e))
      if (routed.nonEmpty) routed else Seq(Keyed("", "", e.effectiveTime, e))
    }
    keyed
      .withWatermark("eventTime", watermarkDelay)
      // dummy clock ticks have done their job once the watermark node
      // has seen them — dropping them here avoids shuffling the bulk of
      // a mostly-non-matching stream into one hot ("","") group
      .filter(_.rule.nonEmpty)
      .groupByKey(k => (k.rule, k.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, String), it: Iterator[Keyed], state: GroupState[KeyState]) => {
          // key._1 empty: the no-op clock-tick group. ruleMap miss:
          // checkpointed state for a rule ABSENT from the current rule
          // set (a restart with a changed rule list) — drop its
          // matchers and continue, the reference's restore tolerance
          // (missing rule classes alias to UndefinedRule and are
          // discarded; reference: src/CorrelationEngine.php:680-766).
          if (key._1.isEmpty || !ruleMap.contains(key._1)) {
            it.foreach(_ => ()); state.remove(); Iterator.empty
          }
          else {
          val rule = ruleMap(key._1)
          val matchers0 = state.getOption.map(_.matchers.toVector).getOrElse(Vector.empty)

          val (matchers, fires) =
            if (state.hasTimedOut) {
              // watermark passed the earliest deadline: fire all due
              val wm = state.getCurrentWatermarkMs() * 1000L // ms → µs
              val (due, alive) = matchers0.partition(_.timeoutAtUs.exists(_ <= wm))
              val fs = due.sortBy(_.timeoutAtUs.get).map { m =>
                fired(rule, key._2, "timeout", microsToTs(m.timeoutAtUs.get),
                  m.chain, rule.onTimeout(m.chain))
              }
              (alive, fs)
            } else {
              val sorted = it.map(_.event).toVector.sortBy(e => (micros(e.effectiveTime), e.id))
              interpretRun(rule, key._2, sorted.iterator, matchers0)
            }

          if (matchers.isEmpty) state.remove()
          else {
            state.update(KeyState(matchers))
            matchers.flatMap(_.timeoutAtUs).minOption
              // µs → ms, ceiling: the timer must not fire before the
              // deadline or the due-check would no-op and re-arm
              .foreach(us => state.setTimeoutTimestamp(math.floorDiv(us + 999L, 1000L)))
          }
          fires.iterator
          }
        })
  }

  /**
   * Spark-4-native streaming face on `transformWithState`: the same
   * step machine, but state lives in a typed `ValueState` column family
   * and timeouts use the API's true per-key TIMER service
   * (`registerTimer`/`handleExpiredTimer`) — a 1:1 mapping of the
   * reference's armed loop timer (reference:
   * src/CorrelationEngine.php:530-563, single earliest-deadline timer,
   * re-armed after each fire). Functionally equivalent to
   * [[runStreaming]] (asserted in tests); preferred on Spark 4
   * clusters: RocksDB column-family state, native timer multiplexing
   * and state TTL come built in. Requires the RocksDB state store
   * provider (`spark.sql.streaming.stateStore.providerClass`).
   */
  class RuleProcessor(rules: Seq[RuleSpec])
      extends StatefulProcessor[(String, String), Keyed, Fired] {
    private lazy val ruleMap = rules.map(r => r.name -> r).toMap
    @transient private var matchers: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      matchers = getHandle.getValueState[KeyState](
        "matchers", Encoders.product[KeyState], TTLConfig.NONE)

    /** Persist survivors and re-arm the single earliest-deadline timer
     * (delete-then-register keeps exactly one live timer per key). */
    private def commit(alive: Vector[MatcherState]): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (alive.isEmpty) matchers.clear()
      else {
        matchers.update(KeyState(alive))
        alive.flatMap(_.timeoutAtUs).minOption
          // µs → ms, ceiling: must not fire before the deadline
          .foreach(us => getHandle.registerTimer(math.floorDiv(us + 999L, 1000L)))
      }
    }

    override def handleInputRows(key: (String, String), rows: Iterator[Keyed],
        tv: TimerValues): Iterator[Fired] = ruleMap.get(key._1) match {
      case None => // restore tolerance — see runStreaming
        rows.foreach(_ => ()); commit(Vector.empty); Iterator.empty
      case Some(rule) =>
        val initial = if (matchers.exists()) matchers.get().matchers.toVector else Vector.empty
        val sorted = rows.map(_.event).toVector.sortBy(e => (micros(e.effectiveTime), e.id))
        val (alive, fires) = interpretRun(rule, key._2, sorted.iterator, initial)
        commit(alive)
        fires.iterator
    }

    override def handleExpiredTimer(key: (String, String), tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Fired] = ruleMap.get(key._1) match {
      case None => // restore tolerance — see runStreaming
        commit(Vector.empty); Iterator.empty
      case Some(rule) =>
        val initial = if (matchers.exists()) matchers.get().matchers.toVector else Vector.empty
        val wmUs = tv.getCurrentWatermarkInMs() * 1000L
        val (alive, fires) = fireDue(rule, key._2, initial, wmUs, emitTimeouts = true)
        commit(alive)
        fires.iterator
    }
  }

  /** [[runStreaming]] on the Spark 4 `transformWithState` operator —
   * see [[RuleProcessor]]. Same routing/watermark discipline. */
  def runStreamingTws(events: Dataset[Event], rules: Seq[RuleSpec],
      watermarkDelay: String = "0 seconds"): Dataset[Fired] = {
    requireUniqueNames(rules)
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.flatMap { e =>
      val routed = rules.filter(_.mightAccept(e.event))
        .map(r => Keyed(r.name, r.correlate(e), e.effectiveTime, e))
      if (routed.nonEmpty) routed else Seq(Keyed("", "", e.effectiveTime, e))
    }
    keyed
      .withWatermark("eventTime", watermarkDelay)
      .filter(_.rule.nonEmpty) // clock ticks counted by the watermark node
      .groupByKey(k => (k.rule, k.key))
      .transformWithState(new RuleProcessor(rules), TimeMode.EventTime, OutputMode.Append)
  }

  /**
   * Streaming aligned face: suppress-ordered rule evaluation
   * (see [[runBatchAligned]]) on `flatMapGroupsWithState` — one group
   * per correlation key, per-rule matcher vectors in state, watermark
   * timers on the earliest deadline across all rules.
   */
  def runStreamingAligned(events: Dataset[Event], rules: Seq[RuleSpec],
      key: Event => String, watermarkDelay: String = "0 seconds"): Dataset[Fired] = {
    requireUniqueNames(rules)
    val spark = events.sparkSession
    import spark.implicits._
    val ruleArr = rules.toIndexedSeq
    val rsId = ruleSetId(rules)
    events
      .map(e => Keyed("", key(e), e.effectiveTime, e))
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: String, it: Iterator[Keyed], state: GroupState[AlignedState]) => {
          val matchers: Array[Vector[MatcherState]] =
            state.getOption
              // rule-list change across a restart: positional state no
              // longer lines up — discard it (see AlignedState docs)
              .filter(_.ruleSetId == rsId)
              .map(_.perRule.map(_.toVector).toArray)
              .getOrElse(Array.fill(ruleArr.size)(Vector.empty[MatcherState]))
          // resume the registration counter past every live matcher's
          // seq so cross-batch arming order stays monotone
          var nextSeq = matchers.iterator.flatMap(_.iterator.map(_.seq + 1))
            .foldLeft(0L)(math.max)
          val alloc = () => { val s = nextSeq; nextSeq += 1; s }
          var out = Vector.empty[Fired]

          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs() * 1000L
            out ++= fireDueAcross(ruleArr, k, matchers, wm, _ => true)
          } else {
            val sorted = it.map(_.event).toVector.sortBy(e => (micros(e.effectiveTime), e.id))
            sorted.foreach { e =>
              val eUs = micros(e.effectiveTime)
              out ++= fireDueAcross(ruleArr, k, matchers, eUs, _ => true)
              var suppressed = false
              var i = 0
              while (i < ruleArr.size && !suppressed) {
                val r = ruleArr(i)
                if (r.mightAccept(e.event)) {
                  val (alive, fs, handled) = offer(r, k, matchers(i), e, alloc)
                  matchers(i) = alive
                  out ++= fs
                  if (handled && r.suppressOnMatch) suppressed = true
                }
                i += 1
              }
            }
          }

          if (matchers.forall(_.isEmpty)) state.remove()
          else {
            state.update(AlignedState(matchers.toSeq, rsId))
            matchers.iterator.flatMap(_.flatMap(_.timeoutAtUs)).minOption
              .foreach(us => state.setTimeoutTimestamp(math.floorDiv(us + 999L, 1000L)))
          }
          out.iterator
        })
  }
}
