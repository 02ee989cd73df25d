package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, ZoneOffset}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A page-view record: the log-envelope fields the stateful traffic operators
  * key on (ref RT/app/dwd/log/DwdTrafficBaseLogSplit.java:162-216). A record
  * with empty `lastPageId` marks a session start.
  */
final case class PageView(
    mid: String,
    pageId: String,
    lastPageId: Option[String],
    isNew: Int,
    ts: Timestamp)

/** A keyed, versioned record for keep-latest dedup (ST3); `rowOpTs` is the
  * version stamp (ref row_op_ts, RT/util/TimestampLtz3CompareUtil.java:9-17).
  */
final case class Versioned(key: String, rowOpTs: Timestamp, payload: String, ts: Timestamp)

/** An order event and its ST4-flagged output. */
final case class OrderEvt(userId: String, amount: Double, ts: Timestamp)
final case class OrderFlagged(userId: String, amount: Double, orderUu: Int, ts: Timestamp)

/** ST5 output: per-record home/detail first-visit-of-day flags. */
final case class HomeDetailFlags(mid: String, homeUv: Int, detailUv: Int, ts: Timestamp)

/** A generic keyed user action (ST7 cart-add, ST6 login input). */
final case class UserAction(userId: String, ts: Timestamp)

/** ST6 output: first-login-of-day + 8-day-returning flags. */
final case class LoginFlags(uid: String, uu: Int, back: Int, ts: Timestamp)

/** A timestamped keyed event and its debounce-flagged output (q88's
  * streaming twin).
  */
final case class Stamped(userId: Long, eventId: Long, ts: Timestamp)
final case class StampedKept(userId: Long, eventId: Long, ts: Timestamp, kept: Int)

/** Per-event lateness mark (q113's streaming twin): `late` = 1 iff the
  * event arrived more than the audited slack behind its key's running
  * event-time high-watermark — i.e. a bounded-OOO watermark of that slack
  * would have dropped it.
  */
final case class LateMark(userId: Long, eventId: Long, ts: Timestamp, late: Int)

/** A CDC dimension-version event (q89's streaming-twin input) and the SCD2
  * interval row the twin emits. Changelog semantics: the open current row is
  * emitted with isCurrent=1, and a later version re-emits it closed
  * (isCurrent=0, validToUs set) — a keep-latest consumer per (key, version)
  * reconstructs the exact batch history (the K2 upsert-kafka contract).
  */
final case class DimVersion(key: Long, eventId: Long, status: String, ts: Timestamp)
final case class Scd2Row(key: Long, eventId: Long, version: Int, status: String,
    validFromUs: Long, validToUs: Option[Long], isCurrent: Int)

/** SCD2 state: the open (current) version of one key. */
final case class Scd2Open(eventId: Long, version: Int, fromUs: Long, status: String)

/** A funnel input event and the per-(user, day) stage flags the streaming
  * funnel emits after processing it (q92's streaming twin). `seqUs`/`seqId`
  * are the event's position in the per-key total order — a keep-latest
  * consumer per (userId, day) on them reconstructs the final funnel state.
  */
final case class FunnelEvent(userId: Long, eventId: Long, etype: String, ts: Timestamp)
final case class FunnelFlags(userId: Long, day: String,
    hasView: Int, hasClick: Int, hasPurchase: Int, seqUs: Long, seqId: Long)

/** Funnel state: first qualifying timestamp of each stage for one key. */
final case class FunnelSt(vTs: Option[Long], cTs: Option[Long], pTs: Option[Long])

/** Streaming renditions of the reference's keyed-state operators (SURVEY.md
  * §2.6 ST1-ST7, §2.7 C1, §2.8 W1-W8): Flink `ValueState` + timers become
  * `flatMapGroupsWithState` with small case-class state. The batch oracles for
  * these live in graft.queries.Stateful and the test suite asserts streaming ≡
  * batch on shared fixtures.
  *
  * Scale notes (100 TB / 1000 executors): every op here shuffles ONCE on its
  * key (`groupByKey`) and then runs embarrassingly parallel per key group with
  * O(1) state per key — the same shape Flink's keyed state gives the
  * reference. State lives in the state store (RocksDB at scale), bounded by
  * per-key size, not input size; event-time timeouts bound retained keys.
  */
object StatefulOps {

  private def day(t: Timestamp): String =
    Instant.ofEpochMilli(t.getTime).atZone(ZoneOffset.UTC).toLocalDate.toString

  private def yesterday(t: Timestamp): String =
    Instant.ofEpochMilli(t.getTime).atZone(ZoneOffset.UTC).toLocalDate.minusDays(1).toString

  // ------------------------------------------------------------------ W8 TTL
  // Idle-state retention for the date-comparison operators: state is
  // droppable once the watermark passes `ttlDays` beyond the END of the
  // key's last-active day (the analog of Flink's setIdleStateRetention).
  // The watermark delay EQUALS the TTL horizon (ttlDays days), which makes
  // the invariance argument hold for out-of-order streams too: by the time
  // a key's state (last-active day D) is dropped, the watermark admits only
  // events dated >= D + ttlDays — a strictly later date, for which the
  // first-of-day family emits identically with or without the old state.
  // Every event the watermark admits still finds its state alive, so
  // enabling the TTL changes no emitted record for any stream whose
  // lateness stays within the horizon. The residual trade-off (stated, not
  // hidden): events later than ttlDays are dropped by the watermark, while
  // keep-forever (ttlDays=None, no watermark) would process them — the same
  // bounded-lateness contract Flink's idle-state retention implies. For ST1
  // (first-visit repair) and ST6 (8-day-back) the state is semantically
  // load-bearing forever, so their default stays None (keep-forever) and a
  // TTL is an explicit opt-in trade-off (devices/users idle beyond it read
  // as new).

  private def endOfDayMs(d: String): Long =
    java.time.LocalDate.parse(d).plusDays(1)
      .atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli

  private def timeoutConf(ttlDays: Option[Int]): GroupStateTimeout =
    if (ttlDays.isDefined) GroupStateTimeout.EventTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** EventTimeTimeout needs a watermark upstream; the delay is the TTL
    * horizon itself, so cross-batch out-of-order events within the horizon
    * are never late-dropped (see the W8 invariance note above).
    */
  private def withTtlWatermark[T](ds: Dataset[T], ttlDays: Option[Int]): Dataset[T] =
    ttlDays.fold(ds)(t => ds.withWatermark("ts", s"$t days"))

  private def armIdleTtl[S](
      state: GroupState[S], lastActive: Option[Timestamp], ttlDays: Option[Int]): Unit =
    for (t <- ttlDays; ts <- lastActive)
      state.setTimeoutTimestamp(endOfDayMs(day(ts)) + (t - 1).toLong * 86400000L)

  /** ST1 — new/returning-visitor repair (ref
    * RT/app/dwd/log/DwdTrafficBaseLogSplit.java:102-145). Key = mid, state =
    * first-visit date. An `isNew=1` record on a later date than first visit is
    * rewritten to 0; an `isNew=0` record with no state backfills "yesterday"
    * so the device is never misclassified as new.
    */
  def newVisitorRepair(
      ds: Dataset[PageView], ttlDays: Option[Int] = None): Dataset[PageView] = {
    import ds.sparkSession.implicits._
    withTtlWatermark(ds, ttlDays).groupByKey(_.mid)
      .flatMapGroupsWithState[String, PageView](
        OutputMode.Append, timeoutConf(ttlDays)) {
        (_: String, events: Iterator[PageView], state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var firstDate = state.getOption
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            val out = sorted.map { e =>
              val d = day(e.ts)
              (e.isNew, firstDate) match {
                case (1, Some(fd)) if fd != d => e.copy(isNew = 0)
                case (1, None)                => firstDate = Some(d); e
                case (1, _)                   => e
                case (_, None)                => firstDate = Some(yesterday(e.ts)); e
                case _                        => e
              }
            }
            firstDate.foreach(state.update)
            armIdleTtl(state, sorted.lastOption.map(_.ts), ttlDays)
            out.iterator
          }
      }
  }

  /** Generic "first event of the key's day passes" dedup: state = last seen
    * date per key, a record passes iff its date differs from the state.
    */
  def firstOfDay[T: Encoder](ds: Dataset[T], ttlDays: Option[Int] = None)(
      key: T => String, ts: T => Timestamp): Dataset[T] = {
    import ds.sparkSession.implicits._
    withTtlWatermark(ds, ttlDays).groupByKey(key)
      .flatMapGroupsWithState[String, T](
        OutputMode.Append, timeoutConf(ttlDays)) {
        (_: String, events: Iterator[T], state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption
            val out = Seq.newBuilder[T]
            val sorted = events.toSeq.sortBy(e => ts(e).getTime)
            for (e <- sorted) {
              val d = day(ts(e))
              if (!last.contains(d)) { out += e; last = Some(d) }
            }
            last.foreach(state.update)
            armIdleTtl(state, sorted.lastOption.map(ts), ttlDays)
            out.result().iterator
          }
      }
  }

  /** ST2 — daily unique-visitor dedup (ref
    * RT/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:51-88): only
    * session-start records (empty lastPageId), first per mid per day.
    */
  def dailyUv(ds: Dataset[PageView], ttlDays: Option[Int] = None): Dataset[PageView] = {
    import ds.sparkSession.implicits._
    firstOfDay(ds.filter((p: PageView) => p.lastPageId.isEmpty), ttlDays)(_.mid, _.ts)
  }

  /** ST7 — cart-add unique user per day (ref
    * RT/app/dws/DwsTradeCartAddUuWindow.java:76-98).
    */
  def cartAddUu(ds: Dataset[UserAction], ttlDays: Option[Int] = None): Dataset[UserAction] = {
    import ds.sparkSession.implicits._
    firstOfDay(ds, ttlDays)(_.userId, _.ts)
  }

  /** ST4 — daily first-order-per-user flag (ref
    * RT/app/dws/DwsTradeSkuOrderWindow.java:188-214): always emits, orderUu=1
    * on the user's first order of the day.
    */
  def firstOrderOfDay(
      ds: Dataset[OrderEvt], ttlDays: Option[Int] = None): Dataset[OrderFlagged] = {
    import ds.sparkSession.implicits._
    withTtlWatermark(ds, ttlDays).groupByKey(_.userId)
      .flatMapGroupsWithState[String, OrderFlagged](
        OutputMode.Append, timeoutConf(ttlDays)) {
        (_: String, events: Iterator[OrderEvt], state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            val out = sorted.map { e =>
              val d = day(e.ts)
              val flag = if (last.contains(d)) 0 else 1
              if (flag == 1) last = Some(d)
              OrderFlagged(e.userId, e.amount, flag, e.ts)
            }
            last.foreach(state.update)
            armIdleTtl(state, sorted.lastOption.map(_.ts), ttlDays)
            out.iterator
          }
      }
  }

  /** Two last-seen dates (home page / detail page) for ST5. */
  final case class HomeDetailState(home: Option[String], detail: Option[String])

  /** ST5 — home/detail first-visit-of-day flags (ref
    * RT/app/dws/DwsTrafficHomeDetailPageViewWindow.java:88-141): emits a
    * record only when at least one flag fires.
    */
  def homeDetailUv(
      ds: Dataset[PageView], ttlDays: Option[Int] = None): Dataset[HomeDetailFlags] = {
    import ds.sparkSession.implicits._
    withTtlWatermark(
      ds.filter((p: PageView) => p.pageId == "home" || p.pageId == "good_detail"),
      ttlDays)
      .groupByKey(_.mid)
      .flatMapGroupsWithState[HomeDetailState, HomeDetailFlags](
        OutputMode.Append, timeoutConf(ttlDays)) {
        (mid: String, events: Iterator[PageView], state: GroupState[HomeDetailState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(HomeDetailState(None, None))
            val out = Seq.newBuilder[HomeDetailFlags]
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            for (e <- sorted) {
              val d = day(e.ts)
              var (homeUv, detailUv) = (0, 0)
              if (e.pageId == "home" && !st.home.contains(d)) {
                homeUv = 1; st = st.copy(home = Some(d))
              }
              if (e.pageId == "good_detail" && !st.detail.contains(d)) {
                detailUv = 1; st = st.copy(detail = Some(d))
              }
              if (homeUv == 1 || detailUv == 1)
                out += HomeDetailFlags(mid, homeUv, detailUv, e.ts)
            }
            state.update(st)
            armIdleTtl(state, sorted.lastOption.map(_.ts), ttlDays)
            out.result().iterator
          }
      }
  }

  /** ST6 — login unique-user + 8-day-returning flags (ref
    * RT/app/dws/DwsUserUserLoginWindow.java:84-129): emits one record per
    * user per active day; back=1 when the gap from the previous active day is
    * >= 8 days ((ts - lastTs) / 86400000 >= 8 in the reference).
    */
  def loginUuBack(
      ds: Dataset[UserAction], ttlDays: Option[Int] = None): Dataset[LoginFlags] = {
    import ds.sparkSession.implicits._
    withTtlWatermark(ds, ttlDays).groupByKey(_.userId)
      .flatMapGroupsWithState[String, LoginFlags](
        OutputMode.Append, timeoutConf(ttlDays)) {
        (uid: String, events: Iterator[UserAction], state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption
            val out = Seq.newBuilder[LoginFlags]
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            for (e <- sorted) {
              val d = day(e.ts)
              if (!last.contains(d)) {
                val back = last match {
                  case Some(prev) if ChronoUnit.DAYS.between(
                    java.time.LocalDate.parse(prev), java.time.LocalDate.parse(d)) >= 8 => 1
                  case _ => 0
                }
                out += LoginFlags(uid, 1, back, e.ts)
                last = Some(d)
              }
            }
            last.foreach(state.update)
            armIdleTtl(state, sorted.lastOption.map(_.ts), ttlDays)
            out.result().iterator
          }
      }
  }

  /** ST3 — keep-latest-version dedup (ref
    * RT/app/dws/DwsTradeSkuOrderWindow.java:113-155): buffer the max-version
    * record per key, emit it once no newer version arrives within `graceMs`
    * of event time (the reference uses a 5 s processing-time timer; we use an
    * event-time timeout so tests are deterministic). Batch oracle:
    * row_number() over (partition by key order by rowOpTs desc) = 1
    * (graft.queries q07_keep_latest).
    */
  def keepLatest(ds: Dataset[Versioned], graceMs: Long = 5000L): Dataset[Versioned] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState[Versioned, Versioned](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, events: Iterator[Versioned], state: GroupState[Versioned]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val candidates = state.getOption.toSeq ++ events
            val best = candidates.maxBy(v => (v.rowOpTs.getTime, v.ts.getTime))
            state.update(best)
            state.setTimeoutTimestamp(best.ts.getTime + graceMs)
            Iterator.empty
          }
      }
  }

  /** C1 — bounce (user-jump) detection as a state machine replacing Flink CEP
    * (ref RT/app/dwd/log/DwdTrafficUserJumpDetail.java:86-129). Pattern per
    * mid: a session start (empty lastPageId) followed within `horizonMs` by
    * another session start → the first is a bounce; followed by nothing
    * within the horizon (event-time timeout) → also a bounce; followed by a
    * normal page view → not a bounce. Emits both match and timeout outputs in
    * one stream (subsumes the reference's U2 side-output union).
    */
  def bounce(ds: Dataset[PageView], horizonMs: Long = 10000L): Dataset[PageView] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.mid)
      .flatMapGroupsWithState[PageView, PageView](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, events: Iterator[PageView], state: GroupState[PageView]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            var pending = state.getOption
            val out = Seq.newBuilder[PageView]
            for (e <- events.toSeq.sortBy(_.ts.getTime)) {
              val isStart = e.lastPageId.isEmpty
              pending match {
                case Some(p) if e.ts.getTime - p.ts.getTime > horizonMs =>
                  out += p // horizon elapsed un-noticed by the timer: bounce
                  pending = if (isStart) Some(e) else None
                case Some(p) if isStart =>
                  out += p // start → start within horizon: first is a bounce
                  pending = Some(e)
                case Some(_) =>
                  pending = None // normal continuation: session has 2+ pages
                case None =>
                  if (isStart) pending = Some(e)
              }
            }
            pending match {
              case Some(p) =>
                state.update(p)
                state.setTimeoutTimestamp(p.ts.getTime + horizonMs)
              case None =>
                if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }

  /** W1-W6 + A1 — watermarked tumbling event-time window aggregate with the
    * reference's stt/edt window stamps (ref
    * RT/app/dws/DwsTradeSkuOrderWindow.java:234-265). `keys` empty gives the
    * keyless windowAll form (W5); partial aggregation is automatic.
    */
  def tumblingAgg(
      df: DataFrame,
      eventCol: String,
      slack: String,
      width: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventCol, slack)
      .groupBy(window(col(eventCol), width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")

  /** Watermarked sliding-window aggregate — q50's streaming twin: each
    * event lands in width/slide overlapping windows, every window emits
    * once when the watermark closes it. Completes the streaming window
    * family (tumbling [[tumblingAgg]], sliding, session [[sessionAgg]]).
    */
  def slidingAgg(
      df: DataFrame,
      eventCol: String,
      slack: String,
      width: String,
      slide: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventCol, slack)
      .groupBy(window(col(eventCol), width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stt", date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt", date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window")

  /** Watermarked session-window aggregate — q51's streaming twin (gap
    * sessionization, the W-family member the reference's fixed windows
    * lack). A session absorbs every event within `gap` of its span and
    * closes — emitting once, append mode — when the watermark passes
    * gap beyond its last event; events inside the slack merge sessions
    * across micro-batches (StatefulOpsSpec exercises the merge). State
    * per key is the open sessions only, watermark-bounded.
    */
  def sessionAgg(
      df: DataFrame,
      eventCol: String,
      slack: String,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventCol, slack)
      .groupBy(session_window(col(eventCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stt",
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("edt",
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss"))
      .drop("session_window")

  /** Watermark drop-rate audit — q113's streaming twin, and the metric the
    * reference's silent 3 s slack never exposes (ref
    * RT/app/dws/DwsTradeSkuOrderWindow.java:216-227: lateness is a
    * hard-coded constant, drops are invisible). Marks each event late=1 iff
    * it arrives more than `slackMs` behind its key's running event-time
    * high-watermark in ARRIVAL order (eventId within a batch, batch order
    * across batches) — exactly the accounting batch q113 replays, so
    * StatefulOpsSpec can assert streamed == batch counts on a shared
    * fixture. State per key is one long (running max event-time µs —
    * microsecond precision to agree bit-for-bit with the batch replay's
    * unix_micros accounting).
    */
  def lateDropFlags(ds: Dataset[Stamped], slackMs: Long): Dataset[LateMark] = {
    import ds.sparkSession.implicits._
    val slackUs = slackMs * 1000L
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[(Long, Long), LateMark](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[Stamped], state: GroupState[(Long, Long)]) =>
          // state = (event-time high watermark µs, last processed eventId).
          // Cross-batch eventId order is ENFORCED, not assumed (the same
          // contract debounce/scd2 fail fast on): a later micro-batch
          // delivering a lower eventId would replay a position the batch
          // q113 accounting processed BEFORE the hwm advanced — the
          // streamed flag would silently diverge from the batch replay.
          var hwm = state.getOption.map(_._1)
          var lastId = state.getOption.map(_._2)
          val sorted = events.toSeq.sortBy(_.eventId)
          sorted.headOption.foreach { e =>
            lastId.filter(_ > e.eventId).foreach { l =>
              throw new IllegalStateException(
                s"lateDropFlags: out-of-order arrival for key $key — eventId " +
                  s"${e.eventId} behind stored last eventId $l; upstream must " +
                  "deliver same-key events in eventId order across micro-batches")
            }
          }
          val out = sorted.map { e =>
            val us = micros(e.ts)
            val late = if (hwm.exists(h => us < h - slackUs)) 1 else 0
            hwm = Some(hwm.fold(us)(math.max(_, us)))
            lastId = Some(e.eventId)
            LateMark(e.userId, e.eventId, e.ts, late)
          }
          for (h <- hwm; l <- lastId) state.update((h, l))
          out.iterator
      }
  }

  /** [[tumblingAgg]] plus the drop-rate metric its watermark implies: the
    * same windowed aggregate, and a second (per-event) stream marking what
    * a bounded-OOO watermark of the SAME slack would drop. Two sinks on one
    * source — the metric leg costs one extra shuffle on the key and O(1)
    * state per key, and turns the engine's silent lateness policy into an
    * observable drop rate.
    */
  def tumblingAggWithLateMetric(
      ds: Dataset[Stamped],
      slackMs: Long,
      width: String,
      aggs: Seq[Column]): (DataFrame, Dataset[LateMark]) =
    (tumblingAgg(ds.toDF(), "ts", s"$slackMs milliseconds", width, Nil, aggs),
      lateDropFlags(ds, slackMs))

  /** Streaming ingest-time exact dedup — the streaming complement of the
    * q34 batch dedup: content fingerprints deduplicated ACROSS micro-batches
    * via `dropDuplicatesWithinWatermark`, so per-key state is dropped once
    * the watermark passes the horizon. At 100 TB ingest this is the shape
    * that keeps dedup state bounded by the horizon's arrival volume instead
    * of growing with corpus size (full-history dedup belongs to the batch
    * layer, q34/q57).
    */
  def streamingExactDedup(
      df: DataFrame, fpCol: String, eventCol: String, horizon: String): DataFrame =
    df.withWatermark(eventCol, horizon)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Debounce/throttle: flag each event kept=1 iff it arrives at least
    * `minGapMs` after the PREVIOUS raw event of the same key (first event
    * kept) — q88's streaming twin; StatefulOpsSpec asserts streaming ≡
    * batch on the shared events fixture. State is one long (last raw
    * event-time millis) per key; within a micro-batch events process in
    * (ts, eventId) order, the same total order the batch lag() uses.
    * Cross-batch in-order arrival is ENFORCED, not assumed: a later
    * micro-batch delivering an event older than the stored last timestamp
    * fails the query instead of silently mis-flagging (StatefulOpsSpec).
    */
  def debounce(ds: Dataset[Stamped], minGapMs: Long): Dataset[StampedKept] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[Long, StampedKept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[Stamped], state: GroupState[Long]) =>
          var last = state.getOption
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
          sorted.headOption.foreach { e =>
            last.filter(_ > e.ts.getTime).foreach { l =>
              throw new IllegalStateException(
                s"debounce: out-of-order arrival for key $key — event at " +
                  s"${e.ts.getTime} ms behind stored state $l ms; upstream " +
                  "must deliver same-key events in order across micro-batches " +
                  "(same-key-same-partition, ordered offsets)")
            }
          }
          val out = sorted.map { e =>
            val kept = if (last.forall(l => e.ts.getTime - l >= minGapMs)) 1 else 0
            last = Some(e.ts.getTime)
            StampedKept(e.userId, e.eventId, e.ts, kept)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  private def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** SCD2 dimension history as a stream — q89's streaming twin. Each
    * arriving version CLOSES the open interval (re-emitting it with
    * validToUs and isCurrent=0) and emits itself open (isCurrent=1); state
    * is exactly one [[Scd2Open]] per key. A keep-latest consumer per
    * (key, version) — preferring the closed emission — reconstructs the
    * batch q89 history bit-for-bit; StatefulOpsSpec asserts this on the
    * shared sf0.001 fixture across multi-batch arrival. Within a
    * micro-batch, events process in (micros, eventId) order — the same
    * total order the batch window uses; cross-batch in-order arrival is
    * the CDC-source contract (same-key-same-partition, ordered offsets) —
    * and the contract is ENFORCED: a micro-batch delivering a version
    * older than the key's open interval fails the query instead of
    * silently writing negative/overlapping validity (StatefulOpsSpec).
    */
  def scd2(ds: Dataset[DimVersion]): Dataset[Scd2Row] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Scd2Open, Scd2Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[DimVersion], state: GroupState[Scd2Open]) =>
          var open = state.getOption
          val out = Seq.newBuilder[Scd2Row]
          events.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
            val us = micros(e.ts)
            open.filter(_.fromUs > us).foreach { o =>
              throw new IllegalStateException(
                s"scd2: out-of-order version for key $key — event at $us us " +
                  s"behind open interval from ${o.fromUs} us; upstream must " +
                  "deliver same-key versions in order across micro-batches " +
                  "(CDC contract: same-key-same-partition, ordered offsets)")
            }
            open.foreach { o =>
              out += Scd2Row(key, o.eventId, o.version, o.status,
                o.fromUs, Some(us), 0)
            }
            val v = open.map(_.version + 1).getOrElse(1)
            out += Scd2Row(key, e.eventId, v, e.status, us, None, 1)
            open = Some(Scd2Open(e.eventId, v, us, e.status))
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Ordered view→click→purchase funnel as a stream — q92's streaming
    * twin. State per (userId, day) is the first qualifying timestamp of
    * each stage; a stage qualifies only STRICTLY after the previous
    * stage's first timestamp (the same min-ts chaining the batch query
    * expresses with three aggregate-join rounds). Emits the running flags
    * after every event; keep-latest per key on (seqUs, seqId) reconstructs
    * the final funnel, and StatefulOpsSpec asserts the reconstruction's
    * per-day counts equal batch q92 across multi-batch arrival.
    */
  def funnel(ds: Dataset[FunnelEvent]): Dataset[FunnelFlags] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.userId, day(e.ts)))
      .flatMapGroupsWithState[FunnelSt, FunnelFlags](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), events: Iterator[FunnelEvent],
            state: GroupState[FunnelSt]) =>
          var st = state.getOption.getOrElse(FunnelSt(None, None, None))
          val out = Seq.newBuilder[FunnelFlags]
          events.toSeq.sortBy(e => (micros(e.ts), e.eventId)).foreach { e =>
            val us = micros(e.ts)
            e.etype match {
              case "view" if st.vTs.isEmpty =>
                st = st.copy(vTs = Some(us))
              case "click" if st.cTs.isEmpty && st.vTs.exists(us > _) =>
                st = st.copy(cTs = Some(us))
              case "purchase" if st.pTs.isEmpty && st.cTs.exists(us > _) =>
                st = st.copy(pTs = Some(us))
              case _ => ()
            }
            out += FunnelFlags(key._1, key._2,
              if (st.vTs.isDefined) 1 else 0,
              if (st.cTs.isDefined) 1 else 0,
              if (st.pTs.isDefined) 1 else 0, us, e.eventId)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
