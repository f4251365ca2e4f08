package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.E Structured Streaming operators — the streaming twins of the batch
  * queries q11 (windowed agg), q10 (sessionization), q20 (dedup). Same
  * transformations compose over `readStream` sources; watermarks bound
  * state so they run indefinitely at cluster scale.
  */
object EventStreams extends Serializable {

  case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessState(sessionId: Long, lastTsMs: Long, n: Int)
  case class SessUpdate(user_id: Long, session_id: Long, n_events: Int)

  /** E1: tumbling 1-hour window aggregation with a 2-hour watermark.
    * Late events beyond the watermark are dropped; state is bounded by
    * (watermark / window) × key cardinality.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** E2: gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`) — a session closes after `gapSec` of
    * inactivity; each batch emits the updated session row. Batch twin:
    * Relational.q10.
    *
    * EventTimeTimeout (2× the gap past the last event, gated by the
    * watermark) bounds state: an idle user's final session is emitted once
    * more and the state-store entry removed — without a timeout every
    * user_id ever seen would pin state forever. Event-time (not
    * processing-time) timeouts advance only with data, so the query
    * doesn't busy-trigger empty batches.
    */
  def sessionize(events: Dataset[Ev], gapSec: Long): Dataset[SessUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.n > 0) Iterator.single(SessUpdate(uid, st.sessionId, st.n))
            else Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st     = state.getOption.getOrElse(SessState(0L, Long.MinValue, 0))
            val out    = ListBuffer.empty[SessUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.lastTsMs == Long.MinValue || t - st.lastTsMs > gapSec * 1000L) {
                if (st.n > 0) out += SessUpdate(uid, st.sessionId, st.n)
                st = SessState(st.sessionId + 1, t, 1)
              } else {
                st = st.copy(lastTsMs = t, n = st.n + 1)
              }
            }
            state.update(st)
            // Clamp above the current watermark: a user whose last event lags
            // the batch max event time by > ~3× the gap would otherwise ask
            // for a timeout below the watermark, which Spark rejects
            // (IllegalArgumentException) and fails the query — likely with
            // skewed/late users at scale.
            if (st.lastTsMs != Long.MinValue)
              state.setTimeoutTimestamp(
                math.max(st.lastTsMs + gapSec * 2000L, state.getCurrentWatermarkMs() + 1))
            out += SessUpdate(uid, st.sessionId, st.n)
            out.iterator
          }
      }
  }

  case class FillState(
      openHourMs: Long,
      n: Long,
      bestTsUs: Long,
      bestEid: Long,
      bestVal: Double)
  case class FillOut(user_id: Long, hour: String, n_events: Long, value_ff: Double, is_gap: Boolean)

  private val HourMs = 3600000L
  private def hourStr(ms: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  private val durCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** State-eviction delay = 2× the op's ACTUAL watermark delay, parsed
    * with Spark's own interval parser — never a hardcoded default: an
    * eviction delay shorter than the watermark collapses to the
    * watermark+1 clamp, and an evicted key that returns restarts as
    * FRESH state (for E51 that silently un-caps a returning user — the
    * exact under-clipping the DP bound exists to prevent). Month-grain
    * durations are rejected (variable length); parse results are cached
    * so per-group calls inside the state functions stay allocation-free.
    */
  private[streaming] def evictDelayMs(watermarkDur: String): Long =
    durCache.computeIfAbsent(
      watermarkDur,
      { s =>
        val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
        require(iv.months == 0, s"month-grain watermark duration is ambiguous: $s")
        2L * (iv.days * 86400000L + iv.microseconds / 1000L)
      }
    )

  /** E21: stateful streaming gap-fill — the q94 twin. Per user, state
    * carries the OPEN hour (count + the (ts, event_id)-max value, q94's
    * exact tie rule); when an event lands in a later hour the open hour's
    * row emits, synthetic gap rows emit for every empty hour between
    * (forward-filling the carried value), and the new hour opens. The
    * final open hour emits on event-time timeout, so an idle user's state
    * is removed, not pinned — state is ONE small row per active user no
    * matter the stream volume.
    *
    * In-order contract: events older than the open hour (late beyond the
    * micro-batch sort) are dropped — the watermark bounds how late data
    * can be, and the batch operator (q94) is the replay-correct authority.
    * Within a micro-batch, events sort by (ts µs, event_id) before
    * folding, so intra-batch order cannot affect output (E2's rule). The
    * watermark is GLOBAL: if it passes a user's timeout before their next
    * event, that span closes and the next event opens a NEW span — the
    * stream is a union of per-span q94s, equal to batch q94 whenever no
    * user lags the stream by more than the watermark (spec-pinned on an
    * in-contract feed).
    */
  def gapFillStream(events: Dataset[Ev], watermarkDur: String = "2 hours"): Dataset[FillOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[FillState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(FillOut(uid, hourStr(st.openHourMs), st.n, st.bestVal, is_gap = false))
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            val out    = ListBuffer.empty[FillOut]
            var st     = state.getOption.orNull
            sorted.foreach { e =>
              val h = e.ts.getTime - java.lang.Math.floorMod(e.ts.getTime, HourMs)
              if (st == null) {
                st = FillState(h, 1L, tsUs(e.ts), e.event_id, e.value)
              } else if (h == st.openHourMs) {
                val eUs = tsUs(e.ts)
                val better =
                  eUs > st.bestTsUs || (eUs == st.bestTsUs && e.event_id > st.bestEid)
                st = FillState(
                  st.openHourMs, st.n + 1,
                  if (better) eUs else st.bestTsUs,
                  if (better) e.event_id else st.bestEid,
                  if (better) e.value else st.bestVal)
              } else if (h > st.openHourMs) {
                out += FillOut(uid, hourStr(st.openHourMs), st.n, st.bestVal, is_gap = false)
                var g = st.openHourMs + HourMs
                while (g < h) {
                  out += FillOut(uid, hourStr(g), 0L, st.bestVal, is_gap = true)
                  g += HourMs
                }
                st = FillState(h, 1L, tsUs(e.ts), e.event_id, e.value)
              } // h < openHourMs: late beyond the open hour — dropped (see contract)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.openHourMs + 2 * HourMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** E3: streaming exact dedup on event_id within the watermark window.
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) so the
    * watermark actually evicts dedup state — with a bare event_id key the
    * state store would grow unboundedly on a long-running stream.
    */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark("event_id")

  /** E7: stream-stream interval join — the streaming twin of the q37 as-of
    * family: each click joins the same user's purchases at most
    * `windowMinutes` earlier (inclusive). Both sides carry watermarks and
    * the join condition carries an explicit event-time interval, which is
    * what lets Spark bound BOTH state stores: a buffered purchase can be
    * evicted once the click-side watermark passes `p_ts + window`, a
    * buffered click once the purchase-side watermark passes `c_ts`. A
    * stream-stream join without the interval (or the watermarks) would pin
    * every row forever — the unbounded-state failure mode at scale.
    */
  def clickPurchaseJoin(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "30 minutes")
    clicks.join(
      purchases,
      expr(s"c_user = p_user AND p_ts BETWEEN c_ts - INTERVAL $windowMinutes MINUTES AND c_ts"))
  }

  /** E13: windowed streaming top-k — the streaming twin of q61's
    * bounded-heap plan argument. Per event-time window, only the k
    * largest (value, event_id) pairs survive, via the same
    * `collect_top_k` aggregate: the state store holds ≤ k rows per open
    * window instead of the window's whole contents (a rank-per-window
    * formulation would buffer every event until the window closes — the
    * unbounded-state failure mode). Heap key (value, −event_id) makes
    * the kept set equal rank ≤ k under (value DESC, event_id ASC);
    * windows emit once, on watermark close (append mode).
    */
  /** E15: windowed value-histogram sketch — q69's fixed-width approximate
    * percentile histogram under an event-time window. The value extent
    * rides as LITERALS (collected from a corpus snapshot at construction,
    * exactly the E11/E12/E14 model-gate shape), so binning is a stateless
    * map-side expression; the only stateful operator is the windowed
    * (window, bin) count, whose state is ≤ `bins` rows per open window no
    * matter the stream volume. Windows emit their ≤ `bins` histogram rows
    * on watermark close (append mode); quantile extraction over a closed
    * window is [[histogramQuantile]] — the identical interpolation q69
    * runs in-plan.
    */
  def windowHistogram(
      events: DataFrame,
      mn: Double,
      mx: Double,
      bins: Int = 64
  ): DataFrame = {
    val w = (mx - mn) / bins
    val bin =
      if (w == 0.0) lit(0)
      else least(lit(bins - 1), floor((col("value") - mn) / w).cast("int"))
    events
      .withWatermark("ts", "2 hours")
      .withColumn("bin", bin)
      .groupBy(window(col("ts"), "1 hour"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("window_start"), col("bin"), col("c"))
  }

  /** q69's uniform in-bin interpolation at continuous rank `p·n`, applied
    * to one closed window's histogram rows — the driver-side companion of
    * [[windowHistogram]] for sinks that want quantiles, kept as a pure
    * function so the streaming query itself needs only ONE stateful op.
    */
  def histogramQuantile(hist: Seq[(Int, Long)], p: Double, mn: Double, mx: Double, bins: Int): Option[Double] = {
    val n = hist.map(_._2).sum
    if (n == 0L) return None
    val w = (mx - mn) / bins
    val r = p * n.toDouble
    var cum = 0L
    hist.sortBy(_._1).foreach { case (b, c) =>
      val before = cum
      cum += c
      if (before.toDouble < r && r <= cum.toDouble)
        return Some(mn + w * (b.toDouble + (r - before.toDouble) / c.toDouble))
    }
    Some(mx)
  }

  def windowTopK(events: DataFrame, k: Int = 5): DataFrame = {
    import graft.functions.Expressions.collect_topk
    val item = struct(
      col("value").as("v"),
      (-col("event_id")).as("nk"),
      col("event_id").as("event_id"))
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(collect_topk(item, k).as("top"))
      .select(col("window.start").as("window_start"), posexplode(reverse(array_sort(col("top")))))
      .select(
        col("window_start"),
        col("col.event_id").as("event_id"),
        col("col.v").as("value"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  case class TransState(lastTsUs: Long, lastEid: Long, lastType: String)
  case class Transition(user_id: Long, cur: String, nxt: String)

  /** E23: streaming transition emission — the q103 twin. Per-user state is
    * ONE row (the last event's type + its (ts µs, event_id) order key);
    * each arriving event emits the (previous → current) hop and replaces
    * the state, so the downstream `groupBy(cur, nxt).count` IS q103's
    * transition matrix, maintained incrementally instead of re-scanning
    * history. Event-time timeout (2× the watermark past the last event,
    * clamped above the watermark — E2's rule) evicts idle users, so state
    * is bounded by ACTIVE users, not users ever seen.
    *
    * In-order contract (E21's): within a micro-batch events fold in
    * (ts µs, event_id) order, so intra-batch arrival order can't affect
    * the hops; an event older than the stored state's order key is late
    * beyond the sort and drops (the watermark bounds how much can be) —
    * batch q103 stays the replay-correct authority.
    */
  def transitionStream(events: Dataset[Ev], watermarkDur: String = "2 hours"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[Transition]
            sorted.foreach { e =>
              val (us, eid) = (tsUs(e.ts), e.event_id)
              val late = st.exists(s => s.lastTsUs > us || (s.lastTsUs == us && s.lastEid >= eid))
              if (!late) {
                st.foreach(s => out += Transition(uid, s.lastType, e.event_type))
                st = Some(TransState(us, eid, e.event_type))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsUs / 1000 + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** E26: streaming OHLC resample — the q107 twin, fully DECLARATIVE: a
    * watermarked tumbling 1-hour window aggregate whose open/close ride
    * `min`/`max` over the unique (ts, event_id, value) struct (the
    * q94/q107 rule — stays hash-aggregable, deterministic because the
    * key prefix is unique) and whose volume sums exact DECIMAL(18,2)
    * (arrival-order-free by associativity). No custom state: Spark's
    * windowed-aggregation store holds ONE row per (type, open window)
    * and emits on watermark close (append mode) — the same expressions
    * as batch q107, so closed windows match it column for column
    * (spec-pinned ==).
    */
  def ohlcStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("vol"))
      .select(
        col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("o.value").as("open"),
        col("high"),
        col("low"),
        col("c.value").as("close"),
        col("n_events"),
        col("vol").cast("double").as("volume"))

  case class EwmaState(openHourMs: Long, volCents: Long, lastTsMs: Long, prev: Seq[Double])
  case class EwmaOut(event_type: String, hour: String, volume: Double, ewma: Double, dev: Double)

  /** E25: streaming EWMA trend — the q113 twin. Per event type, state is
    * the OPEN hour's exact cents accumulator plus the last
    * [[graft.operators.TimeJoins.EwmaK]]−1 CLOSED bucket volumes (q113
    * lags over OBSERVED buckets, so gap hours create no entries and the
    * buffer is exactly the lag window); an event in a later hour closes
    * the open bucket — emitting q113's row (volume, 6-dp EWMA, deviation)
    * with the identical ascending-k weighted fold — and pushes it onto
    * the buffer. Event-time timeout closes an idle type's final bucket
    * and evicts the state.
    *
    * Exactness: per-event values round to cents FIRST (the batch
    * `CAST(value AS DECIMAL(18,2))` rule) so the bucket volume is an
    * exact integer sum in any arrival order; the EWMA fold adds terms in
    * the same k = 0…7 order as the batch expression, so closed-bucket
    * rows equal batch q113 bit-for-bit (spec-pinned). Late events below
    * the open hour drop (E23's rule) — batch q113 is the replay-correct
    * authority.
    */
  def ewmaStream(events: Dataset[Ev], watermarkDur: String = "2 hours"): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val K = graft.operators.TimeJoins.EwmaK
    def cents(v: Double): Long =
      new java.math.BigDecimal(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2)
        .longValueExact()
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def closeRow(tpe: String, hourMs: Long, volCents: Long, prev: Seq[Double]): (EwmaOut, Double) = {
      val x   = volCents / 100.0
      var num = 0.0
      var den = 0.0
      var k   = 0
      while (k < K) {
        // identical term shape + ascending-k fold order as batch q113:
        // absent lags contribute 0.0 to BOTH sums (renormalization)
        val xk = if (k == 0) Some(x) else prev.lift(k - 1)
        val wk = math.pow(0.5, k)
        num += (if (xk.isDefined) xk.get * wk else 0.0)
        den += (if (xk.isDefined) wk else 0.0)
        k += 1
      }
      val e = num / den
      (EwmaOut(tpe, hourStr(hourMs), x, round6(e), round6(x - e)), x)
    }
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tpe: String, batch: Iterator[Ev], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(closeRow(tpe, st.openHourMs, st.volCents, st.prev)._1)
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[EwmaOut]
            sorted.foreach { e =>
              val hMs = Math.floorDiv(e.ts.getTime, HourMs) * HourMs
              st match {
                case None =>
                  st = Some(EwmaState(hMs, cents(e.value), e.ts.getTime, Nil))
                case Some(s) if hMs == s.openHourMs =>
                  st = Some(s.copy(
                    volCents = s.volCents + cents(e.value),
                    lastTsMs = math.max(s.lastTsMs, e.ts.getTime)))
                case Some(s) if hMs > s.openHourMs =>
                  val (row, x) = closeRow(tpe, s.openHourMs, s.volCents, s.prev)
                  out += row
                  st = Some(EwmaState(hMs, cents(e.value), e.ts.getTime,
                    (x +: s.prev).take(K - 1)))
                case _ => () // below the open hour: late beyond the sort, drop
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  case class AnomOut(
      event_type: String,
      hour: String,
      volume: Double,
      ewma: Double,
      dev: Double,
      known_type: Boolean,
      is_anomaly: Boolean)

  /** E27: streaming volume-anomaly gate — the q120 twin in the
    * calibrate-on-snapshot / apply-on-stream contract (E18's): the batch
    * screen's per-type (median deviation, MAD) bars ride as a literal map
    * (≤ |types| entries — the model-gate rule), and every bucket E25
    * closes is flagged through the SAME pure threshold function the
    * batch screen uses ([[graft.operators.TimeJoins.anomalyFlag]],
    * spec-pinned ==). A robust threshold is inherently a property of the
    * deviation DISTRIBUTION — a stream cannot know its own median ahead
    * of time, so the gate applies the snapshot's bars, exactly like
    * E18's percentile gate. Types absent from the snapshot emit
    * `known_type = false` and never flag (an unseen type needs
    * calibration, not a guessy page).
    */
  def anomalyGateStream(
      events: Dataset[Ev],
      bars: Map[String, (Double, Double)],
      watermarkDur: String = "2 hours"): Dataset[AnomOut] = {
    import events.sparkSession.implicits._
    ewmaStream(events, watermarkDur).map { r =>
      bars.get(r.event_type) match {
        case Some((medDev, mad)) =>
          AnomOut(r.event_type, r.hour, r.volume, r.ewma, r.dev,
            known_type = true,
            is_anomaly = graft.operators.TimeJoins.anomalyFlag(r.dev, medDev, mad))
        case None =>
          AnomOut(r.event_type, r.hour, r.volume, r.ewma, r.dev,
            known_type = false, is_anomaly = false)
      }
    }
  }

  /** E28: streaming A/B experiment telemetry — the q126 twin's data
    * layer. Every event is assigned its arm by the SAME in-row
    * `xxhash64(user_id) mod 2` expression batch q126 uses (assignment is
    * a pure hash, so stream and batch agree on every user by
    * construction), and each closed (type, hour) window emits both arms'
    * event counts and exact DECIMAL value sums. Per-hour rows are
    * exactly-once (append on watermark close) and their per-type totals
    * reconcile bit-exactly with the batch analysis: Σ n_c/n_t equal
    * q126's n_c/n_t, and Σ sv_c / Σ n_c reproduces q126's mean_c through
    * the identical cast-divide-round shape (spec-pinned). The hourly
    * grain is what a live experiment dashboard plots; the CI stays a
    * batch q126 job — a distribution property, not a running total
    * (E18/E27's calibrate-on-snapshot boundary).
    */
  def abMonitorStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDur)
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, col("value").cast("decimal(18,2)"))).as("sv_c"),
        sum(when(col("arm") === 1, col("value").cast("decimal(18,2)"))).as("sv_t"))
      .select(
        col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_c"),
        col("n_t"),
        col("sv_c"),
        col("sv_t"))

  /** E29: streaming winsorized telemetry — the q141 twin under the E18/
    * E27 calibrate-on-snapshot contract: the batch report's per-type
    * (p01, p99) caps ride as a ≤|types|-entry literal map (an order
    * statistic is a distribution property a stream cannot know ahead),
    * and every event's value clamps through the SAME decimal-domain rule
    * before the windowed sums. Closed (type, hour) windows emit counts
    * plus RAW and WINSORIZED exact DECIMAL value sums exactly once, so a
    * downstream dashboard can plot both means and their gap — the live
    * view of q141's "does capping move the metric?" column. Types absent
    * from the snapshot pass unclamped with `known_type = false` (an
    * uncalibrated type needs a batch pass, not a guessy cap).
    */
  def winsorizeStream(
      events: DataFrame,
      caps: Map[String, (Double, Double)],
      watermarkDur: String = "2 hours"): DataFrame = {
    val known = caps.keys.foldLeft(lit(false)) { (acc, k) =>
      when(col("event_type") === k, lit(true)).otherwise(acc)
    }
    val clamped = caps.foldLeft(col("value")) { case (acc, (k, (lo, hi))) =>
      when(col("event_type") === k,
        when(col("value") < lo, lit(lo)).when(col("value") > hi, lit(hi)).otherwise(col("value")))
        .otherwise(acc)
    }
    events
      .withWatermark("ts", watermarkDur)
      .withColumn("known_type", known)
      .withColumn("vw", clamped)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("known_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv_raw"),
        sum(col("vw").cast("decimal(18,2)")).as("sv_wins"))
      .select(
        col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("known_type"),
        col("n_events"),
        col("sv_raw"),
        col("sv_wins"))
  }

  /** χ² critical value at the 5% level for 8 degrees of freedom — the
    * flag threshold for a 9-bucket digit test.
    */
  val BenfordChiCrit = 15.507

  /** E30: streaming Benford tripwire — the q144 twin, and the one audit
    * gate that needs NO snapshot calibration (unlike E18/E27/E29):
    * Benford's expectation is a universal constant, so every closed
    * 1-hour window can be judged on its own digit histogram. Each window
    * emits its positive-cents event count, the per-window χ² against the
    * SAME embedded 17-digit literals batch q144 uses, and a flag when
    * the window has enough mass (`min_n`) and χ² exceeds the 5% critical
    * value for 8 df — the live fabricated-/tampered-stream alarm. Digit
    * extraction is the shared integer CASE, so Σ window digit counts
    * reconcile exactly with batch q144 (spec-pinned).
    */
  def benfordStream(
      events: DataFrame,
      minN: Long = 100L,
      watermarkDur: String = "2 hours"): DataFrame = {
    import graft.operators.TimeJoins.{BenfordDigitCase, BenfordP}
    val digitSums = (1 to 9).map(d =>
      sum(when(col("digit") === d, 1L).otherwise(0L)).as(s"n$d"))
    val chi = BenfordP
      .map { case (d, p) =>
        val e = col("n").cast("double") * expr(s"CAST($p AS DOUBLE)")
        (col(s"n$d").cast("double") - e) * (col(s"n$d").cast("double") - e) / e
      }
      .reduce(_ + _)
    events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), (col("value").cast("decimal(18,2)") * lit(100)).cast("long").as("c"))
      .filter(col("c") > 0)
      .select(col("ts"), expr(BenfordDigitCase).as("digit"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), digitSums: _*)
      .withColumn("chi", round(chi, 6))
      .select(
        Seq(
          date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
          col("n")) ++
          (1 to 9).map(d => col(s"n$d")) ++
          Seq(
            col("chi"),
            (col("n") >= minN && col("chi") > BenfordChiCrit).as("is_suspect")): _*)
  }

  /** E32: streaming range-partition drift gate — q149's live companion in
    * the calibrate-on-snapshot contract (E18/E27/E29/E31): the planner's
    * published equi-depth boundaries ride as a ≤B−1-element literal
    * array, every event lands in its bucket via a pure broadcast
    * comparison chain (no state, no lookup join), and each closed 1-hour
    * window emits all bucket occupancies plus the max bucket share —
    * flagged when one bucket absorbs more than `skewFactor×` its
    * equi-depth target. This is how a 1000-executor campaign notices its
    * RANGE LAYOUT went stale (drifting value distribution ⇒ the sorted
    * write that was balanced at plan time now hot-spots one partition)
    * without re-running the planner on the corpus. Fully DECLARATIVE:
    * watermarked tumbling windows, one hash-aggregable projection —
    * Σ window bucket counts reconcile exactly with a batch census over
    * the same bucket expression (spec-pinned).
    */
  def rangeDriftStream(
      events: DataFrame,
      bounds: Seq[Double],
      skewFactor: Double = 2.0,
      watermarkDur: String = "2 hours"): DataFrame = {
    val b = bounds.sorted
    // bucket = #boundaries strictly below the value (boundary owns its
    // left bucket — q149's `n_below` is an inclusive cumulative count)
    val bucket = b.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(col("value") > lit(cut), 1).otherwise(0)
    }
    val nB = b.length + 1
    val bucketSums = (0 until nB).map(i =>
      sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"n$i"))
    val maxShare = (0 until nB)
      .map(i => col(s"n$i"))
      .reduce((a, c) => greatest(a, c))
      .cast("double") / col("n").cast("double")
    events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), bucket.as("bucket"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), bucketSums: _*)
      .withColumn("max_share", round(maxShare, 6))
      .select(
        Seq(
          date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
          col("n")) ++
          (0 until nB).map(i => col(s"n$i")) ++
          Seq(
            col("max_share"),
            (col("max_share") > lit(skewFactor / nB)).as("is_skewed")): _*)
  }

  case class CusumState(
      openHourMs: Long,
      volCents: Long,
      lastTsMs: Long,
      sPlus: Double,
      sMinus: Double)
  case class CusumOut(
      event_type: String,
      hour: String,
      volume: Double,
      s_plus: Double,
      s_minus: Double,
      known_type: Boolean,
      is_alarm: Boolean)

  /** E31: streaming sequential CUSUM gate — batch q148's complement, not
    * its replay. q148 localizes the strongest PAST shift offline; the
    * tabular `S⁺/S⁻` recurrence that ALERTS on a shift as it happens is a
    * `max(0, ·)` fold with no one-pass distributed form — a batch scan
    * cannot express it, and per-key streaming state is exactly what it
    * is for. Per event type, state = the open hour's exact cents
    * accumulator (E25's bucket rule) + both CUSUM sides over CLOSED
    * buckets; each closed bucket steps through the SAME pure recurrence
    * ([[graft.operators.TimeJoins.cusumStep]], spec-pinned against a
    * reference fold) under snapshot-calibrated `(μ, slack = σ/2,
    * h = 4σ)` bars ([[graft.operators.TimeJoins.cusumBars]] — the
    * E18/E27/E29 calibrate-on-snapshot contract: a mean/σ is a
    * distribution property a stream can't know ahead). Alarm when either
    * side exceeds h; both sides reset to 0 after an alarm (the textbook
    * restart, so repeated alarms mark sustained shifts). Uncalibrated
    * types emit `known_type = false`, never alarm, and carry S ≡ 0.
    * Event-time timeout closes an idle type's final bucket and evicts.
    */
  def cusumGateStream(
      events: Dataset[Ev],
      bars: Map[String, (Double, Double, Double)],
      watermarkDur: String = "2 hours"): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def closeRow(tpe: String, st: CusumState): (CusumOut, Double, Double) = {
      val x = st.volCents / 100.0
      bars.get(tpe) match {
        case Some((mu, slack, h)) =>
          val (sp, sm) = graft.operators.TimeJoins.cusumStep(st.sPlus, st.sMinus, x, mu, slack)
          val alarm    = sp > h || sm > h
          val out = CusumOut(tpe, hourStr(st.openHourMs), x,
            round6(sp), round6(sm), known_type = true, is_alarm = alarm)
          // textbook restart: a fired chart re-arms from zero
          if (alarm) (out, 0.0, 0.0) else (out, sp, sm)
        case None =>
          (CusumOut(tpe, hourStr(st.openHourMs), x, 0.0, 0.0,
            known_type = false, is_alarm = false), 0.0, 0.0)
      }
    }
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tpe: String, batch: Iterator[Ev], state: GroupState[CusumState]) =>
          def cents(v: Double): Long =
            new java.math.BigDecimal(v)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2)
              .longValueExact()
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(closeRow(tpe, st)._1)
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[CusumOut]
            sorted.foreach { e =>
              val hMs = Math.floorDiv(e.ts.getTime, HourMs) * HourMs
              st match {
                case None =>
                  st = Some(CusumState(hMs, cents(e.value), e.ts.getTime, 0.0, 0.0))
                case Some(s) if hMs == s.openHourMs =>
                  st = Some(s.copy(
                    volCents = s.volCents + cents(e.value),
                    lastTsMs = math.max(s.lastTsMs, e.ts.getTime)))
                case Some(s) if hMs > s.openHourMs =>
                  val (row, sp, sm) = closeRow(tpe, s)
                  out += row
                  st = Some(CusumState(hMs, cents(e.value), e.ts.getTime, sp, sm))
                case _ => () // below the open hour: late beyond the sort, drop
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** E34: streaming ingest manifest — q155's live twin, and the one
    * integrity gate whose algebra makes the stream/batch reconciliation
    * EXACT by construction: xor is associative, commutative, and
    * self-inverse, so the xor of every closed window's `xor_fp` IS the
    * batch manifest's events fingerprint (spec-pinned) — an ingest
    * pipeline publishes per-hour manifest rows as it runs, and the
    * end-of-day batch manifest must fold to the same value or data was
    * dropped/duplicated in flight, localized to the hour. Fully
    * declarative: the SAME canonical rendering + xxhash64 as batch q155,
    * one watermarked tumbling-window aggregate (count/xor/min/max all
    * have map-side partials), closed windows append exactly once.
    */
  def manifestStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame = {
    val canon = concat_ws(
      "\u001f",
      col("event_id"),
      unix_micros(col("ts")),
      col("user_id"),
      col("event_type"),
      (col("value").cast("decimal(18,2)") * lit(100)).cast("long"),
      col("props"))
    events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), xxhash64(canon).as("h"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_fp"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_rows"),
        col("xor_fp"),
        col("min_h"),
        col("max_h"))
  }

  case class PathState(
      lastUs: Long,
      lastTsMs: Long,
      sessionId: Long,
      steps: Seq[String])
  case class PathOut(user_id: Long, session_id: Long, path: String)

  /** E35: streaming session-path emission — the q110 twin's data layer.
    * Per user, state = the OPEN session's envelope (gap frontier + the
    * first [[graft.operators.TimeJoins.PathLen]] event types in
    * (µs, event_id) order — the buffer is capped at PathLen entries no
    * matter how long the session runs); a session emits its path row
    * EXACTLY ONCE, when the 30-minute gap closes it (or event-time
    * timeout closes the last one). Grouping the emitted rows by path IS
    * q110's per-path count (spec-pinned against a batch replay) — the
    * top-20 cut stays a batch/downstream concern because "top" is a
    * whole-distribution property (the E18/E27 boundary), but the
    * per-session path feed is exactly what a live navigation dashboard
    * consumes. Session ids are q10's 1-based per-user sequence.
    */
  def sessionPathStream(
      events: Dataset[Ev],
      watermarkDur: String = "2 hours"): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    val GapUs = 1800000000L
    val K     = graft.operators.TimeJoins.PathLen
    def pathOf(uid: Long, s: PathState): PathOut =
      PathOut(uid, s.sessionId, s.steps.mkString(">"))
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[PathState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(pathOf(uid, st))
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[PathOut]
            sorted.foreach { e =>
              val us = tsUs(e.ts)
              st match {
                case None =>
                  st = Some(PathState(us, e.ts.getTime, 1L, Seq(e.event_type)))
                case Some(s) if us - s.lastUs > GapUs =>
                  out += pathOf(uid, s)
                  st = Some(PathState(us, math.max(s.lastTsMs, e.ts.getTime),
                    s.sessionId + 1, Seq(e.event_type)))
                case Some(s) if us >= s.lastUs =>
                  st = Some(s.copy(
                    lastUs = us,
                    lastTsMs = math.max(s.lastTsMs, e.ts.getTime),
                    steps = if (s.steps.length < K) s.steps :+ e.event_type else s.steps))
                case _ => () // below the session frontier: late beyond the sort, drop
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  case class ConvState(
      lastUs: Long,
      lastTsMs: Long,
      sessionId: Long,
      viewUs: Long,
      purchUs: Long,
      pendUs: Long)
  case class ConvOut(
      user_id: Long,
      session_id: Long,
      has_view: Boolean,
      converted: Boolean,
      latency_secs: Long)

  /** E36: streaming conversion-envelope emission — the q133 twin's
    * per-session grain. Per user, state = the OPEN session's conversion
    * envelope (gap frontier, first-view µs, first qualifying-purchase µs
    * — three longs however long the session runs); each session emits
    * its (has_view, converted, latency) row EXACTLY ONCE when the
    * 30-minute gap (or event-time timeout) closes it. Counting the feed
    * IS q133's counters and its latency population (spec-pinned against
    * the batch on the same events); the median/p90 order statistics stay
    * downstream because a quantile is a whole-distribution property (the
    * E18/E27 boundary) — the per-session row is what a live checkout
    * dashboard windows over. Session ids are q10's 1-based per-user
    * sequence; latency is the same integer `(pu − vu) div 1 s`.
    *
    * Replay-exactness subtlety: q133's rule is `pu = min purchase µs ≥
    * first-view µs` over the WHOLE session, so a purchase carrying the
    * first view's exact timestamp but a smaller event_id is processed
    * BEFORE the view yet still qualifies. The envelope keeps the minimum
    * pre-view purchase µs (`pendUs`); at close it qualifies iff it
    * equals the first-view µs (sorted order bounds it ≤), making the
    * stream bit-equal to the batch even on that tie.
    */
  def conversionStream(
      events: Dataset[Ev],
      watermarkDur: String = "2 hours"): Dataset[ConvOut] = {
    import events.sparkSession.implicits._
    val GapUs = 1800000000L
    def outOf(uid: Long, s: ConvState): ConvOut = {
      val vu = s.viewUs
      val pu =
        if (vu < 0) -1L
        else if (s.pendUs == vu) vu
        else s.purchUs
      ConvOut(uid, s.sessionId, vu >= 0, pu >= 0, if (pu >= 0) (pu - vu) / 1000000L else -1L)
    }
    def absorb(s: ConvState, us: Long, tsMs: Long, typ: String): ConvState = {
      val s1 = s.copy(lastUs = us, lastTsMs = math.max(s.lastTsMs, tsMs))
      typ match {
        case "view" if s1.viewUs < 0 => s1.copy(viewUs = us)
        case "purchase" =>
          if (s1.viewUs >= 0) { if (s1.purchUs < 0) s1.copy(purchUs = us) else s1 }
          else if (s1.pendUs < 0) s1.copy(pendUs = us)
          else s1
        case _ => s1
      }
    }
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(outOf(uid, st))
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[ConvOut]
            sorted.foreach { e =>
              val us = tsUs(e.ts)
              st match {
                case None =>
                  st = Some(absorb(
                    ConvState(us, e.ts.getTime, 1L, -1L, -1L, -1L), us, e.ts.getTime, e.event_type))
                case Some(s) if us - s.lastUs > GapUs =>
                  out += outOf(uid, s)
                  st = Some(absorb(
                    ConvState(us, math.max(s.lastTsMs, e.ts.getTime), s.sessionId + 1, -1L, -1L, -1L),
                    us, e.ts.getTime, e.event_type))
                case Some(s) if us >= s.lastUs =>
                  st = Some(absorb(s, us, e.ts.getTime, e.event_type))
                case _ => () // below the session frontier: late beyond the sort, drop
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  case class AttrState(lastUs: Long, lastTsMs: Long, firstCh: String, lastCh: String)
  case class AttrOut(
      user_id: Long,
      event_id: Long,
      first_ch: String,
      last_ch: String,
      value: Double)

  /** E33: streaming revenue attribution — the q151 twin. Per user, state
    * is just the OPEN session's attribution envelope (last event time for
    * the 30-minute gap rule + the running first/last non-purchase
    * channel — three fields, however long the session); every purchase
    * emits its credit row (first-touch, last-touch, value) EXACTLY ONCE,
    * at the moment it happens — the live revenue-attribution feed a
    * dashboard sums, where batch q151 is the end-of-day replay-correct
    * authority. The channel-carry rules are q151's verbatim: a
    * session-opening purchase credits 'direct', purchases never update
    * channels, the gap resets the envelope. Per-event values round to
    * cents first (the E25 rule) so stream credits sum bit-equal to the
    * batch DECIMAL(18,2) totals (spec-pinned across multi-batch feeds).
    * Events below the session's last seen time drop (E23's rule);
    * event-time timeout evicts idle users.
    */
  def attributionStream(
      events: Dataset[Ev],
      watermarkDur: String = "2 hours"): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    val GapUs = 1800000000L
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[AttrState]) =>
          def cents(v: Double): Long =
            new java.math.BigDecimal(v)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2)
              .longValueExact()
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st     = state.getOption
            val out    = ListBuffer.empty[AttrOut]
            sorted.foreach { e =>
              val us = tsUs(e.ts)
              if (st.forall(s => us - s.lastUs > GapUs))
                st = Some(AttrState(us, e.ts.getTime, "", ""))
              if (st.exists(s => us >= s.lastUs)) {
                val s = st.get
                if (e.event_type == "purchase") {
                  out += AttrOut(
                    uid, e.event_id,
                    if (s.firstCh.isEmpty) "direct" else s.firstCh,
                    if (s.lastCh.isEmpty) "direct" else s.lastCh,
                    cents(e.value) / 100.0)
                  st = Some(s.copy(lastUs = us, lastTsMs = math.max(s.lastTsMs, e.ts.getTime)))
                } else {
                  st = Some(s.copy(
                    lastUs = us,
                    lastTsMs = math.max(s.lastTsMs, e.ts.getTime),
                    firstCh = if (s.firstCh.isEmpty) e.event_type else s.firstCh,
                    lastCh = e.event_type))
                }
              } // else: below the session frontier — late beyond the sort, drop
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  case class ActiveState(lastTsMs: Long, activeDays: Seq[Long], servedReach: Seq[Long])
  case class ActiveOut(user_id: Long, day: String, kind: String)

  private val DayMs = 86400000L
  private def dayStr(epochDay: Long): String =
    java.time.LocalDate.ofEpochDay(epochDay).toString

  /** E24: streaming rolling-actives emission — the q112 twin. Per user,
    * state is the bounded set of recently seen active days plus the
    * report days already served; a NEW active day A emits one `active`
    * row (day A — the DAU grain) and one `reach` row for every report day
    * in A..A+6 not yet served (the WAU scatter, q112's exact rule:
    * (user, R) is served iff some active day lies in R−6..R). Each
    * (user, day, kind) pair emits EXACTLY once, so the downstream
    * per-day `count` of `active` rows IS q112's n_active and of `reach`
    * rows IS n_active_7d — the DAU/WAU board maintained incrementally,
    * never re-deduplicating history.
    *
    * State is bounded two ways: both sets prune below the watermark day
    * each batch (a day the watermark passed can neither dedupe an
    * in-contract arrival nor be served by one — future days only serve
    * report days ≥ themselves), so ≤ ~2×(watermark days + horizon)
    * entries per user; and event-time timeout evicts fully idle users
    * (state ∝ ACTIVE users). Events below the watermark drop (E23's
    * rule) — batch q112 stays the replay-correct authority.
    */
  def rollingActivesStream(
      events: Dataset[Ev],
      watermarkDur: String = "2 days"): Dataset[ActiveOut] = {
    import events.sparkSession.implicits._
    val horizon = graft.operators.TimeJoins.ActiveWindowDays
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[ActiveState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wmMs  = state.getCurrentWatermarkMs()
            val wmDay = Math.floorDiv(wmMs, DayMs)
            var active = state.getOption.map(_.activeDays.filter(_ >= wmDay).toSet)
              .getOrElse(Set.empty[Long])
            var served = state.getOption.map(_.servedReach.filter(_ >= wmDay).toSet)
              .getOrElse(Set.empty[Long])
            var lastTs = state.getOption.map(_.lastTsMs).getOrElse(Long.MinValue)
            val out    = ListBuffer.empty[ActiveOut]
            val tsList = batch.map(_.ts.getTime).filter(_ >= wmMs).toSeq
            if (tsList.nonEmpty) lastTs = math.max(lastTs, tsList.max)
            tsList.map(Math.floorDiv(_, DayMs)).distinct.sorted.foreach { d =>
              if (!active(d)) {
                active += d
                out += ActiveOut(uid, dayStr(d), "active")
                (d until d + horizon).foreach { r =>
                  if (!served(r)) {
                    served += r
                    out += ActiveOut(uid, dayStr(r), "reach")
                  }
                }
              }
            }
            if (active.nonEmpty || served.nonEmpty) {
              state.update(ActiveState(lastTs, active.toSeq.sorted, served.toSeq.sorted))
              // evict an idle user 2× the (2-day default) watermark past
              // their last event, clamped above the watermark (E2's rule)
              state.setTimeoutTimestamp(math.max(lastTs + 4 * DayMs, wmMs + 1))
            }
            out.iterator
          }
      }
  }

  /** E38: streaming mergeable-moments emission — the q174 twin, and the
    * second op (after E34's xor manifest) whose stream/batch
    * reconciliation is EXACT by algebra: power sums are additive, so the
    * element-wise sum of every closed window's (n, S₁..S₄) envelope IS
    * the batch profile's merged vector (spec-pinned) — a profiling
    * pipeline publishes per-hour moment envelopes as it ingests, and any
    * downstream consumer merges whatever window span it needs (hour →
    * day → corpus) without re-touching raw data, then derives
    * mean/sd/skew/kurtosis exactly as q174 does. Fully declarative: the
    * SAME cent quantization and DECIMAL(38,0) power products as batch,
    * one watermarked tumbling-window aggregate (count/sums all map-side
    * partial), closed windows append exactly once. The cent quantization
    * rides [[graft.operators.StatsOps.centMomentValue]] — the shared
    * guarded expression that RAISES on |value| ≥ \$100k instead of
    * letting a non-ANSI decimal overflow null the envelope silently —
    * and the emitted sums ride
    * [[graft.operators.StatsOps.guardedPowerSum]], which raises if a
    * window's Σvᵏ itself overflows DECIMAL(38,0) (a NULL sum over n > 0
    * rows), matching the oracle's HUGEINT failure surface at the
    * aggregate too.
    */
  def momentsStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame = {
    val v = graft.operators.StatsOps.centMomentValue
    events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("event_type"), v.as("v"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"),
        sum(col("v") * col("v") * col("v")).as("s3"),
        sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n"),
        graft.operators.StatsOps.guardedPowerSum("s1", "n"),
        graft.operators.StatsOps.guardedPowerSum("s2", "n"),
        graft.operators.StatsOps.guardedPowerSum("s3", "n"),
        graft.operators.StatsOps.guardedPowerSum("s4", "n"))
  }

  /** E45: streaming incremental cube — the live writer leg of q154's
    * MERGE-INTO contract: an UPDATE-mode watermarked hourly aggregate
    * whose every batch emits the TOUCHED (hour, type) cells with their
    * new ABSOLUTE totals (count + exact DECIMAL volume), paired with
    * [[graft.sinks.Sinks.upsertJdbc]] in `foreachBatch` — late data
    * updates exactly the cells it touches, the rest of the cube is never
    * read, and a full recompute never happens (q154's report is the diff
    * such a job would show; this op IS the job). Emitting absolute
    * totals, not deltas, is what makes the sink idempotent: checkpoint
    * recovery can replay a batch and the upsert rewrites the same
    * values — exactly-once in effect without batch-id fencing. State:
    * O(open hour-windows × types) under the watermark; cells past the
    * watermark stop updating (their late rows drop — E40 meters that),
    * which is the same contract the batch cube's delta-merge documents.
    */
  def cubeStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("volume"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        col("n_events"),
        col("volume"))

  /** E39: streaming sample-ratio-mismatch monitor — the q178 twin: per
    * closed hour window, distinct exposed users per arm (q126's
    * `xxhash64(user_id) mod 2` assignment), the two-cell χ² statistic,
    * and the alarm flag against the shared 3.841459 critical value — the
    * live experiment-health pager that catches a broken assignment WHILE
    * the experiment runs instead of at read-out. Two chained stateful
    * operators, both declarative: `dropDuplicatesWithinWatermark` on
    * (user, hour) bounds dedup state to the watermark horizon (a user's
    * duplicate exposures within an hour all arrive within the hour by
    * construction), then the windowed arm aggregate; closed windows
    * append exactly once. Per-window counts are the hour-local exposure
    * grain — batch q178's corpus-wide per-type gate stays the read-out
    * authority; this is its leading indicator.
    */
  def srmStream(events: DataFrame, watermarkDur: String = "2 hours"): DataFrame = {
    val d = col("n_control") - col("n_treatment")
    val stat =
      (d * d).cast("double") / (col("n_control") + col("n_treatment")).cast("double")
    events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .dropDuplicatesWithinWatermark("user_id", "hr")
      .select(col("ts"), pmod(xxhash64(col("user_id")), lit(2L)).as("arm"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treatment"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_control"),
        col("n_treatment"),
        round(stat, 6).as("chisq"),
        (stat > lit(graft.operators.StatsOps.SrmCritical)).as("srm_alarm"))
  }

  /** E61: streaming MDE/power monitor — q238's live leg, on E59's
    * chained-stateful-window pipeline: per closed window × event-type
    * metric, the minimum detectable effect the WINDOW's own traffic could
    * power at two-sided α = 0.05 / 80 % — the live answer to "is this
    * experiment's traffic still worth the runtime?" (a feed mix shift
    * that silently doubles metric variance doubles the MDE; the batch
    * q238 planner won't see it until read-out, this pages while the
    * window is still quarantinable).
    *
    * Scale shape: stage 1 collapses each window to the (user, metric)
    * grain — lossless integer cents (q226's pivot), map-side combinable —
    * stage 2 re-windows the per-user table via `window_time` into per-arm
    * counts / cent sums / DECIMAL(38,0) squares; the planner arithmetic is
    * q238's exact shapes on those integer sums (same z literals), so
    * batch-grouping the same records by the same windows reproduces every
    * column exactly (spec-pinned).
    */
  def mdeStream(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val zsum = graft.operators.StatsOps.ZAlphaTwoSided + graft.operators.StatsOps.ZPower80
    val perUser = events
      .withWatermark("ts", watermarkDur)
      .select(
        col("ts"), col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(window(col("ts"), windowDur), col("user_id"), col("event_type"))
      .agg(sum(col("c")).as("y"))
      .select(col("window"), col("event_type"), col("y"),
        pmod(xxhash64(col("user_id")), lit(2L)).as("arm"))
    perUser
      .groupBy(window(window_time(col("window")), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("syc"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n").as("n_users"), col("nt").as("n_treat"),
        col("nc").as("n_control"),
        expr(
          """CASE WHEN nt > 0 AND nc > 0 AND n > 1 THEN
               (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) END""").as("s2"),
        col("syc"))
      .select(
        col("hour"), col("event_type"), col("n_users"), col("n_treat"), col("n_control"),
        when(col("s2").isNotNull && col("s2") >= 0.0,
          round(sqrt(col("s2")) / lit(100.0), 6)).as("sd_value"),
        // greatest(s2, 0): q238's cancellation guard — an epsilon-negative
        // variance must not page NaN mde while sd_value is NULL
        when(col("s2").isNotNull,
          round(lit(zsum)
            * sqrt(greatest(col("s2"), lit(0.0)) * (lit(1.0) / col("n_treat").cast("double")
              + lit(1.0) / col("n_control").cast("double"))) / lit(100.0), 6)).as("mde_abs"),
        when(col("s2").isNotNull && col("syc") > 0L,
          round(lit(zsum)
            * sqrt(greatest(col("s2"), lit(0.0)) * (lit(1.0) / col("n_treat").cast("double")
              + lit(1.0) / col("n_control").cast("double")))
            / (col("syc").cast("double") / col("n_control").cast("double")), 6)).as("mde_rel"))
  }

  /** E59: streaming covariate-balance (SMD) tripwire — q231's live leg,
    * completing the experiment-health pair beside E39 (SRM watches the
    * assignment coin by COUNT; this watches it by COMPOSITION): per
    * closed window × event-type metric, the standardized mean difference
    * of per-user window activity between the two hash arms, with the
    * conventional `|SMD| > 0.1` trip. A rollout whose heavy users drift
    * into one arm mid-flight biases every uplift readout downstream
    * (and silently breaks q226's CUPED θ) — caught here while the
    * window is still quarantinable, not at the post-hoc q231 audit.
    *
    * Scale shape (E55's chained-stateful-window pipeline): stage 1
    * collapses each window to the (user, metric) grain — lossless
    * integer cents (q226's pivot), map-side combinable — stage 2
    * re-windows the per-user table via `window_time` into per-arm
    * moment sums (squares in DECIMAL(38,0)); the SMD arithmetic is
    * q231's exact shapes on those integer sums, so batch-grouping the
    * same records reproduces every column exactly (spec-pinned).
    */
  val StreamSmdTrip = 0.1

  def smdStream(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDur: String = "2 hours"): DataFrame = {
    val perUser = events
      .withWatermark("ts", watermarkDur)
      .select(col("ts"), col("event_type"), col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(window(col("ts"), windowDur), col("event_type"), col("user_id"))
      .agg(sum(col("c")).as("x"))
      .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2L)))
    perUser
      .groupBy(window(window_time(col("window")), windowDur), col("event_type"))
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxt"),
        sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxc"),
        sum(when(col("arm") === 1, expr("CAST(x AS DECIMAL(38,0)) * x"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxxt"),
        sum(when(col("arm") === 0, expr("CAST(x AS DECIMAL(38,0)) * x"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxxc"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("nt"), col("nc"),
        col("sxt"), col("sxc"), col("sxxt"), col("sxxc"))
      .selectExpr(
        "hour", "event_type", "nt AS n_treat", "nc AS n_control",
        "CASE WHEN nt >= 2 THEN (CAST(nt AS DOUBLE) * CAST(sxxt AS DOUBLE)" +
          " - CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE))" +
          " / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) END AS vt",
        "CASE WHEN nc >= 2 THEN (CAST(nc AS DOUBLE) * CAST(sxxc AS DOUBLE)" +
          " - CAST(sxc AS DOUBLE) * CAST(sxc AS DOUBLE))" +
          " / (CAST(nc AS DOUBLE) * CAST(nc - 1 AS DOUBLE)) END AS vc",
        "CASE WHEN nt > 0 THEN CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) END AS mt",
        "CASE WHEN nc > 0 THEN CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE) END AS mc")
      .selectExpr(
        "hour", "event_type", "n_treat", "n_control",
        "CASE WHEN vt IS NOT NULL AND vc IS NOT NULL AND sqrt((vt + vc) / 2.0) > 0" +
          " THEN round((mt - mc) / sqrt((vt + vc) / 2.0), 6) END AS smd",
        s"CASE WHEN vt IS NOT NULL AND vc IS NOT NULL AND sqrt((vt + vc) / 2.0) > 0" +
          s" THEN abs((mt - mc) / sqrt((vt + vc) / 2.0)) > $StreamSmdTrip END AS tripped")
  }

  /** E40: watermark-drop accountant — the missing OBSERVABILITY leg of
    * the late-data contract every stateful op here relies on ("events
    * below the watermark drop; batch replay is the authority"): a silent
    * drop policy is only safe if somebody WATCHES the drop counter, and
    * Structured Streaming already meters it per stateful operator
    * (`numRowsDroppedByWatermark` in each progress report). This helper
    * folds a query's recent progress into the per-op totals an ingest
    * pager alarms on — rows dropped, rows processed, and state size —
    * deduplicated by (batch, operator) since `recentProgress` can expose
    * a batch more than once. Pure driver-side accounting over metrics
    * the engine publishes anyway; zero effect on the running plan.
    */
  def lateDataAudit(
      query: org.apache.spark.sql.streaming.StreamingQuery): Seq[(String, Long, Long, Long)] = {
    query.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.zipWithIndex.map { case (so, i) =>
        ((p.batchId, i), (s"${so.operatorName}#$i", so.numRowsDroppedByWatermark,
          so.numRowsUpdated, so.numRowsTotal))
      })
      // one sample per (batch, op): the LAST progress entry in
      // recentProgress order — if the engine re-exposes a batch with
      // updated metric values, the latest report wins deterministically
      // (a hash-map .head would retain an arbitrary sample)
      .groupBy(_._1).toSeq.map(_._2.last._2)
      .groupBy(_._1)
      .map { case (op, rows) =>
        (op, rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).max)
      }
      .toSeq
      .sortBy(_._1)
  }

  /** E42: streaming referential-integrity gate — the live leg of
    * q105/q184's orphan audits: incoming events join (stream-static
    * left_anti, the E10 shape) against the KNOWN-KEY snapshot (here: the
    * distinct user ids of a reference extract — in production, the
    * dimension table's key column), and each closed hour window emits the
    * orphan count beside the total — the "unknown FK rate" ingest pager
    * that catches an upstream id-scheme change or a dimension-load lag
    * within an hour instead of at the nightly q184 run. Fully
    * declarative: one broadcastable static key set, one anti join, one
    * watermarked windowed aggregate (both counts map-side partial),
    * closed windows append exactly once; the snapshot refreshes by query
    * restart (the E11/E12 broadcast-model contract). Snapshot lifecycle:
    * the persisted key set of the PREVIOUS orphanStream call in the same
    * session is unpersisted on the next call — the refresh-by-restart
    * contract means exactly one snapshot is live per session, so
    * restarts cannot accumulate cached copies (the CacheScope-style
    * tracking batch operators get from drain). A session running two
    * CONCURRENT orphan streams must manage snapshots itself (pass
    * already-persisted inputs).
    */
  private val orphanSnapshots =
    new scala.collection.mutable.WeakHashMap[org.apache.spark.sql.SparkSession, DataFrame]()

  def orphanStream(
      events: DataFrame,
      knownUsers: DataFrame,
      watermarkDur: String = "2 hours"): DataFrame = {
    val keys = knownUsers
      .select(col("user_id"))
      .distinct()
      .withColumn("known", lit(true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    orphanSnapshots.synchronized {
      orphanSnapshots.put(keys.sparkSession, keys).foreach(_.unpersist(blocking = false))
    }
    events
      .withWatermark("ts", watermarkDur)
      .join(keys, Seq("user_id"), "left") // stream-static: flags, drops nothing
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("n_events"),
        col("n_orphans"))
  }

  case class GapState(lastUs: Long, lastEventId: Long)
  case class GapOut(user_id: Long, event_type: String, gap_s: Long)

  /** E41: streaming inter-event gap emission — the q186 twin's data
    * layer: per user, state = the (µs, event_id) cadence frontier (two
    * longs); every in-contract event past the frontier emits ONE gap row
    * (seconds, the batch `DIV 1000000` rule) tagged with the arriving
    * event's type. Because q186's screen is built ENTIRELY from integer
    * gap moments (n, Σg, Σg² — order-free exact sums), folding this feed
    * equals the batch gap table EXACTLY (spec-pinned on a full sf0.001
    * replay) — the live cadence feed a bot pager aggregates with E38's
    * moment algebra instead of re-scanning history. Below-frontier
    * events drop (E23's rule); state is two longs per user with NO
    * timeout (E37's contract: evicting an idle user would lose the
    * frontier and silently skip their comeback gap — the |users|×2-long
    * bound IS the working set batch q186 shuffles anyway).
    */
  def gapStream(
      events: Dataset[Ev],
      watermarkDur: String = "2 hours"): Dataset[GapOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[GapState]) =>
          val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
          var st     = state.getOption
          val out    = ListBuffer.empty[GapOut]
          sorted.foreach { e =>
            val us = tsUs(e.ts)
            st match {
              case None =>
                st = Some(GapState(us, e.event_id))
              case Some(s) if us < s.lastUs || (us == s.lastUs && e.event_id < s.lastEventId) =>
                () // below the cadence frontier: late beyond the sort, drop
              case Some(s) =>
                out += GapOut(uid, e.event_type, Math.floorDiv(us - s.lastUs, 1000000L))
                st = Some(GapState(us, e.event_id))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  case class Scd2State(
      version: Long,
      stateType: String,
      validFromUs: Long,
      nEvents: Long,
      lastUs: Long,
      lastEventId: Long)
  case class Scd2Out(
      user_id: Long,
      version: Long,
      state: String,
      valid_from_us: Long,
      valid_to_us: Long,
      n_events: Long,
      is_current: Boolean)

  /** E37: streaming SCD2 closed-interval emission — the q169 twin's data
    * layer. Per user, state = the OPEN run's envelope (state, version,
    * valid_from, event count, (µs, event_id) frontier); an event with a
    * DIFFERENT event_type closes the run and emits its versioned validity
    * interval EXACTLY ONCE — the closed rows are precisely batch q169's
    * `is_current = false` rows (spec-pinned), i.e. the change-data feed a
    * warehouse MERGE applies incrementally instead of recompacting
    * history. The open run is deliberately NOT emitted: "current" is a
    * point-in-time property of the whole table (the E18/E27 calibrate-on-
    * snapshot boundary) and lives in the state store until a real change
    * closes it.
    *
    * State is ONE fixed-size row per user and has NO timeout: evicting an
    * idle user would forget their version counter and open interval, and
    * a later event would restart numbering — the q169 semantics require
    * the envelope to survive idle gaps. That bound (|users| small rows,
    * the same user grain batch q169 shuffles) is the contract; events
    * below the open run's (µs, event_id) frontier drop (E23's rule —
    * batch replay stays the authority on out-of-contract feeds).
    */
  def scd2Stream(
      events: Dataset[Ev],
      watermarkDur: String = "2 hours"): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[Scd2State]) =>
          val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
          var st     = state.getOption
          val out    = ListBuffer.empty[Scd2Out]
          sorted.foreach { e =>
            val us = tsUs(e.ts)
            st match {
              case None =>
                st = Some(Scd2State(1L, e.event_type, us, 1L, us, e.event_id))
              case Some(s) if us < s.lastUs || (us == s.lastUs && e.event_id < s.lastEventId) =>
                () // below the run frontier: late beyond the sort, drop
              case Some(s) if e.event_type == s.stateType =>
                st = Some(s.copy(nEvents = s.nEvents + 1, lastUs = us, lastEventId = e.event_id))
              case Some(s) =>
                out += Scd2Out(uid, s.version, s.stateType, s.validFromUs, us, s.nEvents,
                  is_current = false)
                st = Some(Scd2State(s.version + 1, e.event_type, us, 1L, us, e.event_id))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** E48: streaming DP-release gate (twin: q193, noise kernel shared
    * verbatim via [[graft.operators.CurationOps.lapNoise]] /
    * `hashUniform`) — each closed event-time window publishes its
    * per-type count WITH Laplace(1/ε) noise already applied, so a live
    * dashboard fed from this stream never sees a raw small count. The
    * draw's uniform comes from `xxhash64(event_type, window_start)`: the
    * (type, window) cell identity, NOT the data — so a restart/replay
    * re-publishes the identical noisy value (exactly-once releases even
    * under recovery, spec-pinned equal to the batch recompute), and two
    * windows never share noise. ε rides per release; sensitivity 1 per
    * count cell (disjoint windows × types). State: the windowed count
    * only (watermark-bounded); the noise is a stateless projection at
    * emission — the E43 shape with q193's release algebra on top.
    */
  def dpReleaseStream(events: DataFrame, eps: Double = 1.0): DataFrame = {
    import graft.operators.CurationOps
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c_true"))
      .withColumn("u",
        CurationOps.hashUniform("xxhash64(event_type, cast(window.start as long))"))
      .withColumn("noise", CurationOps.lapNoise("u", eps))
      // release projection carries ONLY the noisy count — the raw c_true
      // never leaves this operator (q193's batch audit table is where the
      // true counts live, behind whatever access control guards raw data)
      .select(
        col("window.start").as("w_start"),
        col("event_type"),
        round(col("c_true") + col("noise"), 6).as("noisy_c"))
  }

  // --- E51: streaming user-level contribution cap (q209's twin) --------------

  case class CapState(n: Long, lastTsUs: Long, lastEid: Long)
  case class CappedEv(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double, kept: Boolean)

  /** E51: streaming user-level DP contribution cap — q209's live leg: each
    * arriving event is tagged `kept` iff it is among its user's first
    * `cap` events in (ts µs, event_id) order, so a DP ingest can clip
    * contributions AS THEY ARRIVE instead of in a nightly pass (the
    * bounding q193/E48's user-level ε accounting requires). Per-user
    * state is ONE row — running count + the last order key; event-time
    * timeout (2× the watermark past the last event, clamped above the
    * watermark — E2's rule) evicts idle users, so state is bounded by
    * ACTIVE users.
    *
    * In-order contract (E21/E23's): within a micro-batch events fold in
    * (ts µs, event_id) order; an event older than the stored order key is
    * late beyond the sort and drops (the watermark bounds how much can
    * be). On an in-order replay the kept set is EXACTLY batch q209's
    * rank ≤ cap set (spec-pinned) — batch stays the replay authority.
    */
  def contributionCapStream(
      events: Dataset[Ev],
      cap: Int = graft.operators.TrainingOps.DpUserCap,
      watermarkDur: String = "2 hours"): Dataset[CappedEv] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDur)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[CapState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var st = state.getOption.getOrElse(CapState(0L, Long.MinValue, Long.MinValue))
            val out = ListBuffer.empty[CappedEv]
            sorted.foreach { e =>
              val (us, eid) = (tsUs(e.ts), e.event_id)
              val late = st.lastTsUs > us || (st.lastTsUs == us && st.lastEid >= eid)
              if (!late) {
                out += CappedEv(uid, e.event_id, e.ts, e.event_type, e.value, st.n < cap)
                st = CapState(st.n + 1, us, eid)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastTsUs / 1000 + evictDelayMs(watermarkDur), state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
