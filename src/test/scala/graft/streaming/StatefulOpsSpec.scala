package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence for every stateful operator, driven through
  * MemoryStream across multiple micro-batches (so cross-batch state is
  * actually exercised, not just the single-batch path).
  */
class StatefulOpsSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private var queryId = 0

  /** Run a streaming op over the given micro-batches and collect the full
    * appended output.
    */
  private def runStream[I: Encoder, O: Encoder](batches: Seq[Seq[I]])(
      op: Dataset[I] => Dataset[O]): Seq[O] = {
    queryId += 1
    val name = s"stateful_out_$queryId"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[I]
    val query = op(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    import spark.implicits._
    spark.table(name).as[O].collect().toSeq
  }

  // A "wake" batch far in the future fires pending event-time timeouts for
  // ALL keys (the watermark is global); the record itself is a non-start
  // page view so it creates no state of its own.
  private def wake(sec: Long) =
    Seq(PageView("zz-wake", "other", Some("home"), 0, ts(sec)))

  test("ST1 newVisitorRepair rewrites stale isNew across batches") {
    import spark.implicits._
    val day1 = 0L; val day2 = 86400L
    val out = runStream(Seq(
      Seq(PageView("a", "home", None, 1, ts(day1))),
      Seq(
        PageView("a", "home", None, 1, ts(day2)),       // later day: 1 -> 0
        PageView("b", "home", None, 0, ts(day2 + 10)))  // 0 with no state: kept
    ))(newVisitorRepairOp)
    val byMid = out.groupBy(_.mid)
    assert(byMid("a").sortBy(_.ts.getTime).map(_.isNew) == Seq(1, 0))
    assert(byMid("b").map(_.isNew) == Seq(0))
  }

  private def newVisitorRepairOp(ds: Dataset[PageView]) = StatefulOps.newVisitorRepair(ds)

  test("ST2 dailyUv passes one session start per mid per day") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(
        PageView("a", "home", None, 1, ts(10)),
        PageView("a", "cart", Some("home"), 1, ts(20)), // not a session start
        PageView("b", "home", None, 1, ts(30))),
      Seq(
        PageView("a", "home", None, 1, ts(40)),          // same day: dropped
        PageView("a", "home", None, 1, ts(86400 + 5)))   // next day: passes
    ))(ds => StatefulOps.dailyUv(ds))
    assert(out.map(p => (p.mid, p.ts.getTime / 1000)).sorted ==
      Seq(("a", 10L), ("a", 86405L), ("b", 30L)))
  }

  test("ST2 streaming equals batch first-of-day oracle on a bigger fixture") {
    import spark.implicits._
    val fixture = for {
      mid <- Seq("m1", "m2", "m3"); d <- 0 to 2; k <- 0 to 3
    } yield PageView(mid, "home", if (k % 2 == 0) None else Some("x"), 1,
      ts(d * 86400L + k * 100L + mid.hashCode.abs % 50))
    val (b1, b2) = fixture.splitAt(fixture.size / 2)
    val streaming = runStream(Seq(b1, b2))(ds => StatefulOps.dailyUv(ds))
      .map(p => (p.mid, p.ts.getTime)).sorted
    // batch oracle: first session-start per (mid, day)
    val batch = fixture.filter(_.lastPageId.isEmpty)
      .groupBy(p => (p.mid, p.ts.getTime / 86400000L))
      .values.map(_.minBy(_.ts.getTime)).map(p => (p.mid, p.ts.getTime)).toSeq.sorted
    assert(streaming == batch)
  }

  test("ST4 firstOrderOfDay flags exactly the first order per user per day") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(OrderEvt("u1", 10.0, ts(5)), OrderEvt("u1", 20.0, ts(50))),
      Seq(OrderEvt("u1", 30.0, ts(86400 + 3)), OrderEvt("u2", 5.0, ts(86400 + 9)))
    ))(ds => StatefulOps.firstOrderOfDay(ds))
    assert(out.sortBy(o => (o.userId, o.ts.getTime)).map(o => (o.userId, o.orderUu)) ==
      Seq(("u1", 1), ("u1", 0), ("u1", 1), ("u2", 1)))
  }

  test("ST5 homeDetailUv emits only when a daily flag fires") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(
        PageView("a", "home", None, 1, ts(10)),
        PageView("a", "good_detail", Some("home"), 1, ts(20)),
        PageView("a", "home", Some("x"), 1, ts(30)),   // repeat: no emit
        PageView("a", "cart", Some("home"), 1, ts(40)) // filtered page
      ),
      Seq(PageView("a", "home", None, 1, ts(86400 + 1))) // next day: fires again
    ))(ds => StatefulOps.homeDetailUv(ds))
    assert(out.sortBy(_.ts.getTime).map(f => (f.homeUv, f.detailUv)) ==
      Seq((1, 0), (0, 1), (1, 0)))
  }

  test("ST6 loginUuBack emits per active day with 8-day returning flag") {
    import spark.implicits._
    val day = 86400L
    val out = runStream(Seq(
      Seq(UserAction("u", ts(0)), UserAction("u", ts(100))), // same day
      Seq(UserAction("u", ts(3 * day))),                     // gap 3 < 8
      Seq(UserAction("u", ts(12 * day)))                     // gap 9 >= 8
    ))(ds => StatefulOps.loginUuBack(ds))
    assert(out.sortBy(_.ts.getTime).map(f => (f.uu, f.back)) ==
      Seq((1, 0), (1, 0), (1, 1)))
  }

  test("ST7 cartAddUu streaming equals batch distinct user-day") {
    import spark.implicits._
    val fixture = for (u <- 1 to 5; k <- 0 to 9)
      yield UserAction(s"u$u", ts((k % 3) * 86400L + k * 7L))
    val grouped = fixture.sortBy(_.ts.getTime).grouped(17).toSeq
    val streaming = runStream(grouped)(ds => StatefulOps.cartAddUu(ds))
      .map(a => (a.userId, a.ts.getTime / 86400000L)).sorted
    val batch = fixture.map(a => (a.userId, a.ts.getTime / 86400000L)).distinct.sorted
    assert(streaming == batch)
  }

  // ------------------------------------------------------------- W8 idle TTL
  // Each case runs the same micro-batches twice — with the idle-state TTL on
  // and off — and asserts identical emitted output even though the TTL run
  // provably dropped state in between (the watermark-advancing batches push
  // past the armed timeouts; timeouts fire at the start of the next batch).

  test("W8 TTL: dailyUv idle-state timeout does not change emitted output") {
    import spark.implicits._
    val day = 86400L
    val batches = Seq(
      Seq(PageView("a", "home", None, 1, ts(day + 10)),
        PageView("b", "home", None, 1, ts(day + 20))),
      // two watermark pushes to ~day 5: day-1 state passes its TTL and drops
      Seq(PageView("w1", "home", None, 1, ts(5 * day))),
      Seq(PageView("w2", "home", None, 1, ts(5 * day + 10))),
      // day 6: "a" re-appears after its state was dropped — new day, emits
      Seq(PageView("a", "home", None, 1, ts(6 * day + 30)),
        PageView("a", "home", None, 1, ts(6 * day + 40)))) // same-day dup
    def run(ttl: Option[Int]) =
      runStream(batches)(ds => StatefulOps.dailyUv(ds, ttl))
        .map(p => (p.mid, p.ts.getTime / 1000)).sorted
    val withTtl = run(Some(1))
    assert(withTtl == run(None))
    assert(withTtl.filter(_._1 == "a").map(_._2) == Seq(day + 10, 6 * day + 30))
  }

  test("W8 TTL: firstOrderOfDay timeout cleanup does not change flags") {
    import spark.implicits._
    val day = 86400L
    val batches = Seq(
      Seq(OrderEvt("u1", 10.0, ts(day + 5)), OrderEvt("u1", 20.0, ts(day + 50))),
      Seq(OrderEvt("zw", 0.0, ts(5 * day))),
      Seq(OrderEvt("zw", 0.0, ts(5 * day + 10))),
      Seq(OrderEvt("u1", 30.0, ts(6 * day + 3)), OrderEvt("u1", 40.0, ts(6 * day + 9))))
    def run(ttl: Option[Int]) =
      runStream(batches)(ds => StatefulOps.firstOrderOfDay(ds, ttl))
        .filterNot(_.userId == "zw")
        .sortBy(o => (o.userId, o.ts.getTime)).map(o => (o.userId, o.orderUu))
    val withTtl = run(Some(1))
    assert(withTtl == run(None))
    assert(withTtl == Seq(("u1", 1), ("u1", 0), ("u1", 1), ("u1", 0)))
  }

  test("W8 TTL: homeDetailUv timeout cleanup does not change emitted flags") {
    import spark.implicits._
    val day = 86400L
    val batches = Seq(
      Seq(PageView("a", "home", None, 1, ts(day + 10)),
        PageView("a", "good_detail", Some("home"), 1, ts(day + 20))),
      Seq(PageView("w1", "home", None, 1, ts(5 * day))),
      Seq(PageView("w2", "home", None, 1, ts(5 * day + 10))),
      Seq(PageView("a", "home", None, 1, ts(6 * day + 1))))
    def run(ttl: Option[Int]) =
      runStream(batches)(ds => StatefulOps.homeDetailUv(ds, ttl))
        .filterNot(_.mid.startsWith("w"))
        .sortBy(_.ts.getTime).map(f => (f.homeUv, f.detailUv))
    val withTtl = run(Some(1))
    assert(withTtl == run(None))
    assert(withTtl == Seq((1, 0), (0, 1), (1, 0)))
  }

  test("W8 TTL: loginUuBack keeps the 8-day-back flag for gaps inside the TTL") {
    import spark.implicits._
    val day = 86400L
    val batches = Seq(
      Seq(UserAction("u", ts(day)), UserAction("u", ts(day + 100))),
      Seq(UserAction("u", ts(4 * day))),
      Seq(UserAction("u", ts(13 * day))), // gap 9 days >= 8: back=1
      Seq(UserAction("zw", ts(20 * day))),
      Seq(UserAction("zw2", ts(21 * day))))
    def run(ttl: Option[Int]) =
      runStream(batches)(ds => StatefulOps.loginUuBack(ds, ttl))
        .filterNot(_.uid.startsWith("zw"))
        .sortBy(_.ts.getTime).map(f => (f.uu, f.back))
    // a 30-day TTL comfortably covers the 8-day-back horizon: identical output
    val withTtl = run(Some(30))
    assert(withTtl == run(None))
    assert(withTtl == Seq((1, 0), (1, 0), (1, 1)))
  }

  test("W8 TTL: out-of-order events across batches are not late-dropped within the horizon") {
    import spark.implicits._
    val day = 86400L
    // batch 2 carries an event BELOW batch 1's max event time (late by ~1
    // day minus 10 s). The TTL watermark delay equals the horizon (1 day),
    // so the event must be admitted and emitted exactly as in the
    // keep-forever run — this is the round-3 ADVICE regression fixture (a
    // 0 s watermark silently dropped it).
    val batches = Seq(
      Seq(PageView("a", "home", None, 1, ts(2 * day))),
      Seq(PageView("late", "home", None, 1, ts(day + 10)),  // OOO, within horizon
        PageView("a", "home", None, 1, ts(2 * day + 60))),  // same-day dup: dropped
      Seq(PageView("a", "home", None, 1, ts(3 * day))))
    def run(ttl: Option[Int]) =
      runStream(batches)(ds => StatefulOps.dailyUv(ds, ttl))
        .map(p => (p.mid, p.ts.getTime / 1000)).sorted
    val withTtl = run(Some(1))
    assert(withTtl == run(None))
    assert(withTtl.contains(("late", day + 10)),
      "out-of-order event within the TTL horizon was late-dropped")
  }

  test("streaming exact dedup drops cross-batch duplicate fingerprints within the horizon") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(UserAction("fpA", ts(10)), UserAction("fpB", ts(11))),
      Seq(UserAction("fpA", ts(12)), UserAction("fpC", ts(13))), // fpA is a dup
      Seq(UserAction("fpB", ts(14)), UserAction("fpD", ts(15))), // fpB is a dup
      Seq(UserAction("fpA", ts(16)))                             // still a dup
    ))((ds: org.apache.spark.sql.Dataset[UserAction]) =>
      StatefulOps.streamingExactDedup(ds.toDF(), "userId", "ts", "10 minutes")
        .as[UserAction])
    assert(out.map(a => (a.userId, a.ts.getTime / 1000)).sorted ==
      Seq(("fpA", 10L), ("fpB", 11L), ("fpC", 13L), ("fpD", 15L)))
  }

  test("ST3 keepLatest emits only the max-version record after the grace period") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(
        Versioned("k1", ts(100), "v1", ts(10)),
        Versioned("k1", ts(300), "v3", ts(11)), // max version for k1
        Versioned("k2", ts(100), "w1", ts(12))),
      Seq(Versioned("k1", ts(200), "v2", ts(13))), // older version: ignored
      wakeV(1000), wakeV(2000)
    ))(ds => StatefulOps.keepLatest(ds, graceMs = 5000L))
    val byKey = out.filterNot(_.key == "zz").map(v => v.key -> v.payload).toMap
    assert(byKey == Map("k1" -> "v3", "k2" -> "w1"))
  }

  // watermark-advancing batch for Versioned streams; emitted after its own
  // grace so filter it out of assertions via key "zz"
  private def wakeV(sec: Long) = Seq(Versioned("zz", ts(0), "wake", ts(sec)))

  test("ST3 streaming equals batch row_number()=1 oracle") {
    import spark.implicits._
    val fixture = for (k <- 1 to 8; v <- 1 to 5)
      yield Versioned(s"k$k", ts(v * 10L + k), s"p$v", ts(k * 3L + v))
    val batches = fixture.grouped(11).toSeq :+ wakeV(5000) :+ wakeV(9000)
    val streaming = runStream(batches)(ds => StatefulOps.keepLatest(ds))
      .filterNot(_.key == "zz").map(v => (v.key, v.payload)).sorted
    val batch = fixture.groupBy(_.key).values
      .map(_.maxBy(v => (v.rowOpTs.getTime, v.ts.getTime)))
      .map(v => (v.key, v.payload)).toSeq.sorted
    assert(streaming == batch)
  }

  test("C1 bounce: start→start match, normal continuation, and timeout") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(
        PageView("match", "home", None, 1, ts(1000)),
        PageView("match", "home", None, 1, ts(1005)),        // within 10 s: first bounces
        PageView("cont", "home", None, 1, ts(1000)),
        PageView("cont", "cart", Some("home"), 1, ts(1003)), // continuation: no bounce
        PageView("lone", "home", None, 1, ts(1000))),        // nothing follows: timeout
      wake(1100), wake(1200)
    ))(ds => StatefulOps.bounce(ds))
    val bounced = out.map(_.mid).sorted
    // "match" second start also times out eventually (no further events)
    assert(bounced == Seq("lone", "match", "match"))
  }

  test("C1 bounce: late gap handled inline when horizon elapsed between events") {
    import spark.implicits._
    val out = runStream(Seq(
      Seq(
        PageView("a", "home", None, 1, ts(1000)),
        PageView("a", "cart", Some("home"), 1, ts(1060))), // 60 s later: first bounced
      wake(1500), wake(1600)
    ))(ds => StatefulOps.bounce(ds))
    assert(out.map(p => (p.mid, p.ts.getTime / 1000)) == Seq(("a", 1000L)))
  }

  test("W2 late data beyond the watermark slack is dropped from closed windows") {
    import spark.implicits._
    val out = runStream[OrderEvt, (String, Double)](Seq(
      Seq(OrderEvt("u1", 5.0, ts(11))),
      Seq(OrderEvt("zz", 0.0, ts(100))),   // watermark -> 97 s; window [10,20) closes
      Seq(OrderEvt("u1", 99.0, ts(12))),   // 88 s late, slack 3 s: DROPPED
      Seq(OrderEvt("zz", 0.0, ts(200))), Seq(OrderEvt("zz", 0.0, ts(300)))
    )) { ds =>
      StatefulOps.tumblingAgg(ds.toDF(), "ts", "3 seconds", "10 seconds",
        Seq(col("userId")), Seq(sum("amount").as("amt")))
        .select(col("userId"), col("amt")).as[(String, Double)]
    }
    // u1's window must contain ONLY the on-time 5.0 — the late 99.0 is gone
    assert(out.filter(_._1 == "u1") == Seq(("u1", 5.0)), out.toString)
  }

  test("W2/W4/A1 tumblingAgg sums per 10 s window with stt/edt stamps") {
    import spark.implicits._
    val out = runStream[OrderEvt, (String, String, String, Double)](Seq(
      Seq(OrderEvt("u1", 5.0, ts(1)), OrderEvt("u1", 7.0, ts(8)),
        OrderEvt("u2", 1.0, ts(12))),
      Seq(OrderEvt("u1", 2.0, ts(9))), // late but within slack: same window
      Seq(OrderEvt("u9", 0.0, ts(1000))), Seq(OrderEvt("u9", 0.0, ts(2000)))
    )) { ds =>
      StatefulOps.tumblingAgg(ds.toDF(), "ts", "30 seconds", "10 seconds",
        Seq(col("userId")), Seq(sum("amount").as("amt")))
        .select(col("stt"), col("edt"), col("userId"), col("amt"))
        .as[(String, String, String, Double)]
    }
    val rows = out.filterNot(_._3 == "u9").sorted
    assert(rows == Seq(
      ("1970-01-01 00:00:00", "1970-01-01 00:00:10", "u1", 14.0),
      ("1970-01-01 00:00:10", "1970-01-01 00:00:20", "u2", 1.0)))
  }

  test("sessionAgg merges sessions across micro-batches and stamps spans") {
    import spark.implicits._
    val out = runStream[Stamped, (String, String, Long, Long)](Seq(
      Seq(Stamped(1, 1, ts(1)), Stamped(1, 2, ts(5))),
      Seq(Stamped(1, 3, ts(12))),   // 7 s after 5: merges into the session
      Seq(Stamped(1, 4, ts(40))),   // 28 s gap: new session; wm closes first
      Seq(Stamped(9, 9, ts(1000)))  // far-future: closes the last session
    )) { ds =>
      StatefulOps.sessionAgg(ds.toDF(), "ts", "3 seconds", "10 seconds",
        Seq(col("userId")), Seq(count(lit(1)).as("n")))
        .select(col("stt"), col("edt"), col("userId"), col("n"))
        .as[(String, String, Long, Long)]
    }
    assert(out.filter(_._3 == 1L).sorted == Seq(
      ("1970-01-01 00:00:01", "1970-01-01 00:00:22", 1L, 3L),
      ("1970-01-01 00:00:40", "1970-01-01 00:00:50", 1L, 1L)))
  }

  test("slidingAgg streaming ≡ batch q50 on the shared events fixture") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"), col("ts"))
      .as[Stamped]
      .collect().sortBy(e => (e.ts.getTime, e.eventId))
    val epilogue = Stamped(-1L, 0L,
      new Timestamp(events.last.ts.getTime + 86400L * 1000))
    val batches = events.grouped((events.length + 3) / 4).map(_.toSeq).toSeq :+
      Seq(epilogue)
    val streamed = runStream[Stamped, (String, Long)](batches) { ds =>
      StatefulOps.slidingAgg(ds.toDF(), "ts", "0 seconds",
        "30 seconds", "10 seconds", Nil, Seq(count(lit(1)).as("pv_ct")))
        .select(col("stt"), col("pv_ct")).as[(String, Long)]
    }.toMap
    // batch q50 counts per window start (epilogue contributes 3 windows of
    // its own — subtract its count from any window it shares, which by
    // construction (1 day beyond the last event) it doesn't)
    val batch = graft.Registry.all.find(_.name == "q50_sliding_window").get
      .run(spark, sfDir)
      .select(col("stt"), col("pv_ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val epilogueWindows = streamed.keySet -- batch.keySet
    assert(epilogueWindows.forall(streamed(_) == 1L)) // the epilogue alone
    assert(streamed -- epilogueWindows == batch)
  }

  test("sessionAgg streaming ≡ batch q51 on the shared events fixture") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"), col("ts"))
      .as[Stamped]
      .collect().sortBy(e => (e.ts.getTime, e.eventId))
    val epilogue = Stamped(-1L, 0L,
      new Timestamp(events.last.ts.getTime + 86400L * 1000))
    val batches = events.grouped((events.length + 3) / 4).map(_.toSeq).toSeq :+
      Seq(epilogue)
    val sessions = runStream[Stamped, (Long, Long)](batches) { ds =>
      StatefulOps.sessionAgg(ds.toDF(), "ts", "0 seconds", "10 seconds",
        Seq(col("userId")), Seq(count(lit(1)).as("n")))
        .select(col("userId"), col("n")).as[(Long, Long)]
    }
    val streamed = sessions.filter(_._1 >= 0).groupBy(_._1).map {
      case (u, rows) =>
        u -> (rows.size.toLong, rows.count(_._2 == 1L).toLong)
    }
    val batch = graft.Registry.all.find(_.name == "q51_session_window").get
      .run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    // sanity: real sessionization happened (multiple sessions per user;
    // at sf0.001 events sit >=10 s apart so every session is a bounce —
    // the cross-batch MERGE path is pinned by the fixture test above)
    assert(streamed.values.exists(_._1 > 1))
    assert(streamed.values.exists(_._2 > 0))
  }

  test("debounce streaming ≡ batch q88 on the shared events fixture") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"), col("ts"))
      .as[Stamped]
      .collect().sortBy(e => (e.ts.getTime, e.eventId))
    // split into 4 micro-batches in event-time order (the kafka-keyed
    // in-order delivery the operator contracts on), so cross-batch state
    // carries the last raw timestamp
    val batches = events.grouped((events.length + 3) / 4).map(_.toSeq).toSeq
    assert(batches.length == 4)
    val streamed = runStream[Stamped, StampedKept](batches)(
      ds => StatefulOps.debounce(ds, 6L * 3600 * 1000))
      .map(k => (k.userId, k.eventId) -> k.kept).toMap
    val batch = graft.Registry.all.find(_.name == "q88_event_debounce").get
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    // sanity: the flag actually splits the fixture
    assert(streamed.values.toSet == Set(0, 1))
  }

  test("SCD2 streaming twin reconstructs batch q89 history across batches") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // the q89 input contract: user_info CDC versions = signup events, with
    // the envelope's status mapping (event_id%10 in {6,7} -> update 1003)
    val versions = graft.Tables(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("key"), col("event_id").as("eventId"),
        when(pmod(col("event_id"), lit(10)).isin(6, 7), "1003")
          .otherwise("1001").as("status"), col("ts"))
      .as[DimVersion]
      .collect().sortBy(e => (e.ts.getTime, e.eventId))
    val batches = versions.grouped((versions.length + 2) / 3).map(_.toSeq).toSeq
    assert(batches.length == 3)
    val emitted = runStream[DimVersion, Scd2Row](batches)(StatefulOps.scd2)
    // changelog reconstruction: per (key, version) the closed emission
    // (isCurrent=0) supersedes the open one — the K2 keep-latest contract
    val streamed = emitted.groupBy(r => (r.key, r.version)).map {
      case (kv, rows) =>
        kv -> rows.minBy(_.isCurrent) // 0 (closed) wins over 1 (open)
    }
    val batch = graft.Registry.all.find(_.name == "q89_scd2_history").get
      .run(spark, sfDir).collect().map { r =>
        (r.getLong(0), r.getInt(2)) ->
          (r.getLong(1), r.getString(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getInt(6))
      }.toMap
    assert(streamed.size == batch.size)
    streamed.foreach { case (kv, s) =>
      assert(batch(kv) == ((s.eventId, s.status, s.validFromUs,
        s.validToUs, s.isCurrent)), s"mismatch at $kv")
    }
    // sanity: multi-version keys exist and close intervals
    assert(emitted.exists(_.isCurrent == 0))
  }

  // walk the cause chain: MemoryStream failures surface as
  // StreamingQueryException wrapping the operator's IllegalStateException
  private def causeMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => String.valueOf(e.getMessage)).toSeq

  test("debounce fails fast when a later batch delivers an older event " +
    "(in-order cross-batch contract is enforced, not assumed)") {
    import spark.implicits._
    val e = intercept[Throwable] {
      runStream[Stamped, StampedKept](Seq(
        Seq(Stamped(1L, 1L, ts(100))),
        Seq(Stamped(1L, 2L, ts(50)))))( // behind the stored last timestamp
        ds => StatefulOps.debounce(ds, 1000L))
    }
    assert(causeMessages(e).exists(_.contains("out-of-order")))
  }

  test("scd2 fails fast when a later batch delivers a version older than " +
    "the open interval (no silent negative/overlapping validity)") {
    import spark.implicits._
    val e = intercept[Throwable] {
      runStream[DimVersion, Scd2Row](Seq(
        Seq(DimVersion(7L, 1L, "1001", ts(100))),
        Seq(DimVersion(7L, 2L, "1003", ts(50)))))(StatefulOps.scd2)
    }
    assert(causeMessages(e).exists(_.contains("out-of-order")))
  }

  test("lateDropFlags fails fast when a later batch delivers a lower " +
    "eventId (the q113-parity contract is enforced like debounce/scd2)") {
    import spark.implicits._
    val e = intercept[Throwable] {
      runStream[Stamped, LateMark](Seq(
        Seq(Stamped(1L, 5L, ts(100))),
        Seq(Stamped(1L, 3L, ts(100)))))( // eventId behind stored state
        ds => StatefulOps.lateDropFlags(ds, 3000L))
    }
    assert(causeMessages(e).exists(_.contains("out-of-order")))
  }

  test("lateDropFlags streamed drop counts equal batch q113 on a shared " +
    "out-of-order fixture (3 s and 30 s slacks, per day)") {
    import spark.implicits._
    // The driver testdata arrives perfectly in order (q113 counts are all
    // zero there), so the shared fixture here INJECTS disorder: per-user
    // mostly-increasing timestamps with 5 s regressions (late at 3 s slack
    // only) and 60 s regressions (late at both). Written as events.parquet
    // so the REGISTERED batch q113 runs on exactly the rows the stream sees.
    val events = (for {
      u <- 1L to 3L
      i <- 0L until 60L
    } yield {
      val base = 1000L + i * 10 // seconds, per-user arrival order
      val sec =
        if (i % 13 == 5) base - 5 - 10 // 5 s behind the running max
        else if (i % 17 == 9) base - 60 - 10 // 60 s behind
        else base
      Stamped(u, u * 1000 + i, ts(sec + u)) // offset days? keep one day
    }).sortBy(_.eventId)
    val dir = java.nio.file.Files.createTempDirectory("late_fixture_").toString
    events.toDF().select(col("userId").as("user_id"),
        col("eventId").as("event_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batches = events.grouped((events.length + 3) / 4).map(_.toSeq).toSeq
    assert(batches.length == 4)
    def dayOf(t: Timestamp): String = java.time.Instant.ofEpochMilli(t.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    def perDay(marks: Seq[LateMark]): Map[String, (Long, Long)] =
      marks.groupBy(m => dayOf(m.ts)).view.mapValues(ms =>
        (ms.size.toLong, ms.map(_.late.toLong).sum)).toMap
    val s3 = perDay(runStream[Stamped, LateMark](batches)(
      ds => StatefulOps.lateDropFlags(ds, 3000L)))
    val s30 = perDay(runStream[Stamped, LateMark](batches)(
      ds => StatefulOps.lateDropFlags(ds, 30000L)))
    val batch = graft.Registry.all.find(_.name == "q113_lateness_audit").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(s3.keySet == batch.keySet)
    batch.foreach { case (day, (nEvents, late3, late30)) =>
      assert(s3(day) == ((nEvents, late3)), s"3s mismatch on $day")
      assert(s30(day) == ((nEvents, late30)), s"30s mismatch on $day")
    }
    // sanity: both slacks actually observe (different) drop counts
    assert(batch.values.map(_._2).sum > 0)
    assert(batch.values.map(_._3).sum > 0)
    assert(batch.values.map(_._2).sum > batch.values.map(_._3).sum)
  }

  test("tumblingAggWithLateMetric: agg leg equals plain tumblingAgg, " +
    "metric leg exposes the watermark's drop rate") {
    import spark.implicits._
    val batches = Seq(
      Seq(Stamped(1L, 1L, ts(10)), Stamped(1L, 2L, ts(20))),
      // event 3: 15 s behind its key's running max AND behind the global
      // watermark (17 s) — flagged by the metric leg, dropped by the agg leg
      Seq(Stamped(1L, 3L, ts(5)), Stamped(2L, 4L, ts(21))),
      // wake: pushes the watermark to 57 s so closed windows emit in append
      Seq(Stamped(3L, 5L, ts(60))))
    queryId += 1
    val name = s"stateful_out_$queryId"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped]
    val (agg, metric) = StatefulOps.tumblingAggWithLateMetric(
      input.toDS(), 3000L, "10 seconds", Seq(count(lit(1)).as("pv")))
    val aggQ = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val metricQ = metric.writeStream.format("memory").queryName(s"${name}_m")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b)
        aggQ.processAllAvailable(); metricQ.processAllAvailable()
      }
    } finally { aggQ.stop(); metricQ.stop() }
    val lateById = spark.table(s"${name}_m").as[LateMark].collect()
      .map(m => m.eventId -> m.late).toMap
    assert(lateById == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 0))
    // closed windows (append mode): [10,20) holds event 1 only, [20,30)
    // events 2+4; [0,10) NEVER emits — its only row (event 3) is the drop
    // the metric leg flagged. The metric explains the hole in the output.
    val stts = spark.table(name).select("stt", "pv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stts.get("1970-01-01 00:00:10").contains(1L))
    assert(stts.get("1970-01-01 00:00:20").contains(2L))
    assert(!stts.contains("1970-01-01 00:00:00"))
  }

  test("funnel streaming twin reconstructs batch q92 per-day counts") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val fixture = graft.Tables(spark, sfDir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("event_type").as("etype"), col("ts"))
      .as[FunnelEvent]
      .collect().sortBy(e => (e.ts.getTime, e.eventId))
    val batches = fixture.grouped((fixture.length + 2) / 3).map(_.toSeq).toSeq
    val emitted = runStream[FunnelEvent, FunnelFlags](batches)(StatefulOps.funnel)
    // keep-latest per (user, day) on the per-key sequence position
    val finalFlags = emitted.groupBy(f => (f.userId, f.day)).map {
      case (_, rows) => rows.maxBy(f => (f.seqUs, f.seqId))
    }
    val streamedByDay = finalFlags.filter(_.hasView == 1)
      .groupBy(_.day).map { case (d, rows) =>
        d -> (rows.size.toLong, rows.count(_.hasClick == 1).toLong,
          rows.count(_.hasPurchase == 1).toLong)
      }
    val batch = graft.Registry.all.find(_.name == "q92_funnel_conversion").get
      .run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamedByDay.size == batch.size)
    streamedByDay.foreach { case (d, counts) =>
      assert(batch(d) == counts, s"day $d: $counts vs ${batch(d)}")
    }
    // sanity: the funnel actually narrows somewhere
    assert(streamedByDay.values.exists { case (v, _, p) => p < v })
  }
}
