package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial soak for the event-time analytics family restored in round 9
  * (round-9 VERDICT directive #3) — q75/q88/q92/q103/q104/q113 under dirty
  * data the driver fixtures never contain: null timestamps, duplicate
  * event_ids, same-key timestamp ties at window/ordering edges, and values
  * exactly ON the queries' boundary constants (6 h debounce gap, 7-day
  * attribution lookback, 3 s/30 s watermark slack). Every expectation below
  * is hand-computed from the documented semantics, so a tie-break or
  * boundary-comparison regression fails a NAMED case instead of drifting a
  * hash at the oracle.
  *
  * Timestamps are built from epoch-micros constants (session TZ is UTC), so
  * the fixture is encoding-independent of the driver's parquet drift.
  */
class DirtyEventsSpec extends SparkSpec {

  private val US = 1000000L
  private def us(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli * 1000L

  // (event_id, ts_us or null, user_id, event_type, value)
  //
  // user 1 — null ts + same-instant tie + exact 6 h debounce boundary
  // user 2 — duplicate event_id + out-of-order arrival 40 s behind the
  //          per-key high-watermark (beyond the 30 s slack)
  // user 3 — funnel: click ties the view's instant (strictly-after fails)
  // user 4 — funnel: purchase ties the click's instant (strictly-after fails)
  // user 5 — attribution touch exactly AT the 7-day lookback boundary (kept)
  // user 6 — touch ties the purchase instant (strict < fails → 'direct')
  private lazy val rows: Seq[(Long, Option[Long], Long, String, Double)] = Seq(
    (1L, Some(us("2024-03-01T01:00:00Z")), 1L, "view", 1.0),
    (2L, Some(us("2024-03-01T01:00:00Z")), 1L, "click", 1.0),
    (3L, Some(us("2024-03-01T07:00:00Z")), 1L, "view", 1.0),
    (4L, None, 1L, "error", 1.0),
    (100L, Some(us("2024-03-01T02:00:00Z")), 2L, "view", 2.0),
    (100L, Some(us("2024-03-01T02:00:00Z")), 2L, "view", 2.0),
    (101L, Some(us("2024-03-01T02:01:00Z")), 2L, "click", 2.0),
    (102L, Some(us("2024-03-01T02:00:20Z")), 2L, "view", 2.0),
    (200L, Some(us("2024-03-02T12:00:00Z")), 3L, "view", 3.0),
    (201L, Some(us("2024-03-02T12:00:00Z")), 3L, "click", 3.0),
    (202L, Some(us("2024-03-02T12:01:00Z")), 3L, "purchase", 3.0),
    (210L, Some(us("2024-03-02T12:00:00Z")), 4L, "view", 4.0),
    (211L, Some(us("2024-03-02T12:05:00Z")), 4L, "click", 4.0),
    (212L, Some(us("2024-03-02T12:05:00Z")), 4L, "purchase", 4.0),
    (300L, Some(us("2024-03-10T00:00:00Z")), 5L, "purchase", 50.0),
    (301L, Some(us("2024-03-03T00:00:00Z")), 5L, "click", 0.0),
    (310L, Some(us("2024-03-10T00:00:00Z")), 6L, "purchase", 60.0),
    (311L, Some(us("2024-03-10T00:00:00Z")), 6L, "view", 0.0))

  private lazy val dirtyDir: String = {
    val dir = Files.createTempDirectory("graft_dirty_ev_").toString
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        concat(lit("{\"k\": "), col("event_id") % 100, lit("}")).as("props"))
      .coalesce(1)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private val names = Seq("q75_event_gap_stats", "q88_event_debounce",
    "q92_funnel_conversion", "q103_last_touch_attribution",
    "q104_transition_matrix", "q113_lateness_audit",
    "q140_windowed_distinct_sketch")

  test("all listed event-time queries execute and are run-to-run stable") {
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def snap() = fn(spark, dirtyDir).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val (a, b) = (snap(), snap())
      assert(a == b, s"$name: two runs differ on the dirty fixture")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }

  test("q75: null ts contributes an event but no gap; tie gap is zero") {
    // user 1 order (nulls first): e4(null), e1, e2, e3 — gaps null, null,
    // 0 (the tie), 6 h; so 4 events, 2 countable gaps, one session break.
    val r = graft.SparkEntry.queries("q75_event_gap_stats")(spark, dirtyDir)
      .filter(col("user_id") === 1).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_events") == 4L)
    assert(row.getAs[Long]("n_gaps") == 2L)
    assert(row.getAs[Long]("max_gap_us") == 6L * 3600 * US)
    assert(row.getAs[Long]("total_gap_us") == 6L * 3600 * US)
    assert(row.getAs[Long]("n_session_breaks") == 1L)
  }

  test("q88: exact 6 h gap is kept (>=), same-instant repeat is dropped") {
    val kept = graft.SparkEntry.queries("q88_event_debounce")(spark, dirtyDir)
      .filter(col("user_id") === 1)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Int]("kept"))
    // e4 (null ts, sorts first) kept; e1 kept (prev is the null-ms row);
    // e2 ties e1's instant → dropped; e3 is EXACTLY 6 h after e2 → kept.
    assert(kept.toMap == Map(4L -> 1, 1L -> 1, 2L -> 0, 3L -> 1))
    // duplicate event_id: first occurrence kept, its clone gap-0 dropped —
    // deterministic as a multiset even though the two rows are identical
    val dup = graft.SparkEntry.queries("q88_event_debounce")(spark, dirtyDir)
      .filter(col("user_id") === 2 && col("event_id") === 100)
      .collect().map(_.getAs[Int]("kept")).sorted.toSeq
    assert(dup == Seq(0, 1))
  }

  test("q92: stage ties never convert (strictly-after chaining)") {
    val byDay = graft.SparkEntry.queries("q92_funnel_conversion")(spark, dirtyDir)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n_viewed"), r.getAs[Long]("n_clicked_after_view"),
          r.getAs[Long]("n_purchased_after_click")))).toMap
    // 03-01: users 1,2 viewed; only user 2's click is strictly after its
    // view (user 1's ties) — no purchases.
    assert(byDay("2024-03-01") == ((2L, 1L, 0L)))
    // 03-02: user 3's click ties the view (out), so its purchase has no
    // qualified click; user 4 clicks strictly after view but the purchase
    // ties the click (out) → 2 viewed, 1 clicked, 0 purchased.
    assert(byDay("2024-03-02") == ((2L, 1L, 0L)))
  }

  test("q103: 7-day boundary touch is credited, same-instant touch is not") {
    val m = graft.SparkEntry.queries("q103_last_touch_attribution")(spark, dirtyDir)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value")))).toMap
    // click: purchase 202 (its two 12:00 touches tie on tus → event_id
    //        desc picks the click) + purchase 300 (touch exactly at
    //        p_tus - 7d, inclusive edge) → 2 purchases, 53.0
    // view:  purchase 212 (the 12:05 click ties the purchase instant and
    //        is excluded by the strict <; the 12:00 view wins) → 4.0
    // direct: purchase 310 (only touch ties its own instant) → 60.0
    assert(m == Map(
      "click" -> ((2L, 53.0)),
      "view" -> ((1L, 4.0)),
      "direct" -> ((1L, 60.0))))
  }

  test("q104: transitions over the dirty total order, integer ppm shares") {
    val got = graft.SparkEntry.queries("q104_transition_matrix")(spark, dirtyDir)
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Long]("share_ppm"))).toSet
    // Hand-walked per-user orders (nulls first, event_id tiebreak, the
    // duplicate id pair adjacent): 12 transitions = Σ(n_user - 1).
    assert(got == Set(
      ("view", "click", 4L, 666666L),
      ("view", "view", 2L, 333333L),
      ("click", "view", 1L, 250000L),
      ("click", "purchase", 3L, 750000L),
      ("error", "view", 1L, 1000000L),
      ("purchase", "view", 1L, 1000000L)))
  }

  test("q113: arrival-order watermark audit counts the planted stragglers") {
    val byDay = graft.SparkEntry.queries("q113_lateness_audit")(spark, dirtyDir)
      .collect().map(r => Option(r.getAs[String]("day")).getOrElse("null") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_late_3s"),
          r.getAs[Long]("n_late_30s")))).toMap
    assert(byDay == Map(
      // event 102 arrives 40 s behind user 2's watermark → late at both slacks
      "2024-03-01" -> ((7L, 1L, 1L)),
      // in-order ties only: a tie equals the watermark, strict < keeps it
      "2024-03-02" -> ((6L, 0L, 0L)),
      // event 301 arrives 7 days behind user 5's watermark
      "2024-03-03" -> ((1L, 1L, 1L)),
      "2024-03-10" -> ((3L, 0L, 0L)),
      // the null-ts event lands in a null day bucket, never in a late count
      "null" -> ((1L, 0L, 0L))))
  }

  test("q144: null-ts partition and zero campaign overlap execute cleanly") {
    // the partitioned layout write must survive a null event_day (the
    // null-ts event lands in the default partition), and a corpus with
    // no campaign-day overlap must return an EMPTY result, never crash —
    // visible-nothing, not invented-something
    val out = graft.SparkEntry
      .queries("q144_dynamic_partition_pruning")(spark, dirtyDir).collect()
    assert(out.isEmpty, out.mkString("\n"))
  }

  test("q140: tiny windows estimate exactly; null ts forms its own day") {
    // at |users| ≤ a handful per window, the 4Ki-bucket linear counter
    // must round to the exact count (occupancy ≈ cardinality), so every
    // dirty window reads err 0 — and the null-ts event must surface as a
    // (null day, type) window, not vanish
    val out = graft.SparkEntry.queries("q140_windowed_distinct_sketch")(
        spark, dirtyDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(4),
        s"window (${r.get(0)}, ${r.get(1)}): lc_est ${r.getLong(4)} " +
          s"!= exact ${r.getLong(2)}")
      assert(r.getLong(5) == 0L)
    }
    assert(out.exists(r => r.isNullAt(0) && r.getString(1) == "error"),
      "null-ts event did not form its own (null day) window")
  }
}
