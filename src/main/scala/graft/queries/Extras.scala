package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFns.hash32
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-completeness operators beyond the reference's inventory (the
  * reference uses no semi/anti joins and no sliding/session windows —
  * SURVEY §2.5/§2.8) but standard for a warehouse engine a reference user
  * would expect when switching.
  */
object Extras {

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------ semi/anti joins
    Q(
      "q49_semi_anti_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"))
        val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        withOrders.agg(lit("with_orders").as("segment"),
            count(lit(1)).as("cust_ct"))
          .unionByName(without.agg(lit("no_orders").as("segment"),
            count(lit(1)).as("cust_ct")))
      },
      Some("""
        SELECT 'with_orders' AS segment, COUNT(*) AS cust_ct
        FROM customer c WHERE EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'no_orders', COUNT(*)
        FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""),
      "Semi/anti joins (EXISTS / NOT EXISTS): customer segmentation by " +
        "order presence — beyond-reference engine surface."),

    // ------------------------------------------------------ sliding window
    Q(
      "q50_sliding_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "30 seconds", "10 seconds"))
          .agg(count(lit(1)).as("pv_ct"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
            col("pv_ct"), col("sum_value")),
      Some("""
        WITH w AS (
          SELECT time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP))
                   - i * INTERVAL 10 SECOND AS ws,
                 value
          FROM events, UNNEST(generate_series(0, 2)) AS t(i))
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
               COUNT(*) AS pv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM w GROUP BY ws"""),
      "Sliding event-time window (30 s width, 10 s slide): each record " +
        "contributes to three overlapping windows — beyond-reference " +
        "engine surface."),

    // ------------------------------------------------------ session window
    Q(
      "q51_session_window",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("user_id"), session_window(col("ts"), "10 seconds"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("session_cnt"),
            sum(when(col("n") === 1, 1).otherwise(0)).cast("long").as("bounce_cnt")),
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) >= 10.0
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        sessions AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n
          FROM sessions GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS session_cnt,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounce_cnt
        FROM per_session GROUP BY user_id"""),
      "Session window (10 s gap) validated against first-principles gap " +
        "sessionization — Spark's session_window ends a session when the " +
        "NEXT event is >= gap away, matching the lag >= 10 oracle."),

    // --------------------------------------- rolling-hash chunk dedup
    Q(
      "q52_chunk_fingerprint_dedup",
      (s, dir) => {
        import graft.functions.RollingHash.chunkFingerprints
        // content-defined chunks per doc (rolling-hash boundaries), then
        // near-dup pairs = docs sharing >= 50% of the smaller doc's chunks;
        // blocked on shared chunk hashes with the usual df cap
        val chunks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            explode(chunkFingerprints(col("text"))).as("ch"))
          .distinct()
        val capped = chunks.join(
          chunks.groupBy("ch").agg(count(lit(1)).as("df"))
            .filter(col("df") <= 100).select("ch"),
          "ch")
        val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val pairs = capped.select(col("doc_id").as("i"), col("ch"))
          .join(capped.select(col("doc_id").as("j"), col("ch")), "ch")
          .filter(col("i") < col("j"))
          .groupBy("i", "j").agg(count(lit(1)).as("common"))
        pairs
          .join(sizes.select(col("doc_id").as("i"), col("sz").as("si")), "i")
          .join(sizes.select(col("doc_id").as("j"), col("sz").as("sj")), "j")
          .withColumn("overlap",
            col("common").cast("double") / least(col("si"), col("sj")))
          .filter(col("overlap") >= 0.5)
          .select(col("i"), col("j"), col("overlap"))
      },
      // Hash-parity oracle: the Rabin-Karp chunker is replayed in DuckDB
      // with a recursive CTE over codepoints. Java's wrapping long
      // arithmetic is emulated in HUGEINT mod 2^64 (constants: Base=1000003,
      // R = Base^16 mod 2^64 = 2205457682549662529, signed reinterpretation
      // at chunk emit); boundary test (win & 0x3f)==0 becomes win % 64 = 0,
      // which is consistent under mod-2^64 because 64 divides 2^64.
      Some("""
        WITH RECURSIVE step AS (
          SELECT doc_id, text, length(text) AS n, 0 AS i,
                 0::HUGEINT AS win, 0::HUGEINT AS ck, 0 AS cstart,
                 CAST([] AS BIGINT[]) AS chunks
          FROM documents
          UNION ALL
          SELECT doc_id, text, n, i + 1,
                 win2,
                 CASE WHEN cut THEN 0::HUGEINT ELSE ck2 END,
                 CASE WHEN cut THEN i + 1 ELSE cstart END,
                 CASE WHEN cut THEN list_append(chunks,
                   CAST(CASE WHEN ck2 >= 9223372036854775808::HUGEINT
                             THEN ck2 - 18446744073709551616::HUGEINT
                             ELSE ck2 END AS BIGINT))
                      ELSE chunks END
          FROM (
            SELECT *, ((i - cstart >= 16 AND win2 % 64 = 0) OR i = n - 1) AS cut
            FROM (
              SELECT *,
                (ck * 1000003::HUGEINT + c) % 18446744073709551616::HUGEINT AS ck2,
                (((win * 1000003::HUGEINT + c) % 18446744073709551616::HUGEINT)
                  + 18446744073709551616::HUGEINT
                  - (CASE WHEN i >= 16
                          THEN (2205457682549662529::HUGEINT * cprev) % 18446744073709551616::HUGEINT
                          ELSE 0::HUGEINT END))
                  % 18446744073709551616::HUGEINT AS win2
              FROM (
                SELECT *, unicode(text[i+1])::HUGEINT AS c,
                       CASE WHEN i >= 16 THEN unicode(text[i-15])::HUGEINT
                            ELSE 0::HUGEINT END AS cprev
                FROM step WHERE i < n
              )
            )
          )
        ),
        ex AS (
          SELECT DISTINCT doc_id, ch
          FROM (SELECT doc_id, chunks FROM step WHERE i = n),
               UNNEST(chunks) AS t(ch)
        ),
        capped AS (
          SELECT ex.* FROM ex
          JOIN (SELECT ch FROM ex GROUP BY ch HAVING COUNT(*) <= 100) g USING (ch)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
          FROM capped a JOIN capped b ON a.ch = b.ch AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT p.i, p.j,
               CAST(p.common AS DOUBLE) / LEAST(si.sz, sj.sz) AS overlap
        FROM pairs p
        JOIN sizes si ON si.doc_id = p.i
        JOIN sizes sj ON sj.doc_id = p.j
        WHERE CAST(p.common AS DOUBLE) / LEAST(si.sz, sj.sz) >= 0.5"""),
      "Rolling-hash (Rabin-Karp) content-defined chunk fingerprints -> " +
        "chunk-overlap near-dup pairs; robust to insertions " +
        "(pipeline ops brief: document fingerprinting)."),

    // ------------------------------------------------------------ AS-OF join
    Q(
      "q53_asof_join",
      (s, dir) => {
        // True FOR SYSTEM_TIME AS OF semantics (ref J3,
        // RT/app/dwd/db/DwdTradeCartAdd.java:54-56): each purchase joins
        // the LATEST click by the same user at-or-before its event time —
        // point-in-time lookup against a versioned history, composed from
        // built-ins per the preference order (keyed join + time predicate
        // + per-left-row top-1; WindowGroupLimit evaluates the rank
        // partially before the final shuffle).
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir, "events")
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("value").as("c_value"))
        val w = Window.partitionBy(col("p_id"))
          .orderBy(col("c_ts").desc, col("c_value").desc)
        p.join(c, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"),
            "left_outer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_id"), col("p_user"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
            col("c_value").as("asof_value"))
      },
      Some("""
        WITH p AS (SELECT event_id AS p_id, user_id AS p_user,
                          CAST(ts AS TIMESTAMP) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, CAST(ts AS TIMESTAMP) AS c_ts, value AS c_value
              FROM events WHERE event_type = 'click'),
        j AS (SELECT p.p_id, p.p_user, c.c_ts, c.c_value,
                     row_number() OVER (PARTITION BY p.p_id
                       ORDER BY c.c_ts DESC NULLS LAST, c.c_value DESC NULLS LAST) AS rn
              FROM p LEFT JOIN c
                ON p.p_user = c.c_user AND c.c_ts <= p.p_ts)
        SELECT p_id, p_user,
               strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
               c_value AS asof_value
        FROM j WHERE rn = 1"""),
      "AS-OF join: latest right-side version at-or-before each left row's " +
        "time (FOR SYSTEM_TIME AS OF semantics, ref " +
        "RT/app/dwd/db/DwdTradeCartAdd.java:54-56) — composed from keyed " +
        "join + time predicate + per-row top-1."),

    // ------------------------------------------------------------ ROLLUP
    Q(
      "q67_rollup",
      (s, dir) =>
        Tables(s, dir, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("order_ct"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_amount"))
          .select(col("o_orderpriority").as("priority"),
            col("o_orderstatus").as("status"),
            col("order_ct"), col("total_amount")),
      Some("""
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               COUNT(*) AS order_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""),
      "ROLLUP hierarchy aggregation (priority → status → grand total): " +
        "multi-level OLAP subtotals in one pass — beyond-reference engine " +
        "surface."),

    // ------------------------------------------------------------- PIVOT
    Q(
      "q68_pivot",
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupBy(month(col("o_orderdate")).cast("long").as("order_month"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("order_month"),
            coalesce(col("F"), lit(0L)).as("f_ct"),
            coalesce(col("O"), lit(0L)).as("o_ct"),
            coalesce(col("P"), lit(0L)).as("p_ct")),
      Some("""
        SELECT EXTRACT(month FROM o_orderdate) AS order_month,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_ct,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_ct,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_ct
        FROM orders
        GROUP BY 1"""),
      "PIVOT: order counts spread across status columns per month — " +
        "beyond-reference engine surface (relational pivot operator)."),

    // ----------------------------------------------------- running totals
    Q(
      "q69_running_total",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("day_amt"))
        val w = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("day_amt").cast("double").as("day_amount"),
            // running sum over exact decimal, ordered frame: engine-exact
            sum(col("day_amt")).over(w).cast("double").as("cum_amount"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_amt
          FROM orders GROUP BY 1)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               CAST(day_amt AS DOUBLE) AS day_amount,
               CAST(SUM(day_amt) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS cum_amount
        FROM daily"""),
      "Running cumulative totals (ordered window frame over exact " +
        "decimals, cast once at the edge) — beyond-reference engine " +
        "surface (frame-based window aggregation)."),

    // -------------------------------------------------- column profiling
    Q(
      "q70_column_profile",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        // examined round-19 and deliberately LEFT in the per-column union
        // form: a single-scan aggregate with three countDistincts was
        // measured SLOWER (0.81 -> 1.54 s same-command A/B) — the Expand
        // x4 it plans costs more than the three columnar re-scans, which
        // each read only their own column's pages anyway.
        def profile(c: String) =
          l.agg(lit(c).as("column_name"),
            count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("double").as("min_val"),
            max(col(c)).cast("double").as("max_val"))
        profile("l_quantity")
          .unionByName(profile("l_extendedprice"))
          .unionByName(profile("l_discount"))
      },
      Some("""
        SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT l_quantity) AS n_distinct,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*),
               CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT l_extendedprice),
               CAST(MIN(l_extendedprice) AS DOUBLE),
               CAST(MAX(l_extendedprice) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*),
               CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT l_discount),
               CAST(MIN(l_discount) AS DOUBLE),
               CAST(MAX(l_discount) AS DOUBLE)
        FROM lineitem"""),
      "Column profiling: per-column row/null/distinct counts and min/max " +
        "in one scan each — the data-quality survey a warehouse runs " +
        "before ingest (beyond-reference engine surface)."),

    // --------------------------------------------- EXCEPT / INTERSECT
    Q(
      "q71_set_ops",
      (s, dir) => {
        // churn/retention via relational set ops: customers active only in
        // H1 (EXCEPT), and customers active in both halves (INTERSECT)
        val o = Tables(s, dir, "orders")
        val h1 = o.filter(month(col("o_orderdate")) <= 6).select("o_custkey")
        val h2 = o.filter(month(col("o_orderdate")) > 6).select("o_custkey")
        h1.except(h2)
          .select(lit("h1_only").as("segment"), col("o_custkey"))
          .unionByName(
            h1.intersect(h2)
              .select(lit("both").as("segment"), col("o_custkey")))
      },
      Some("""
        WITH h1 AS (SELECT o_custkey FROM orders WHERE EXTRACT(month FROM o_orderdate) <= 6),
        h2 AS (SELECT o_custkey FROM orders WHERE EXTRACT(month FROM o_orderdate) > 6)
        SELECT 'h1_only' AS segment, o_custkey FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)
        UNION ALL
        SELECT 'both', o_custkey FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)"""),
      "EXCEPT / INTERSECT set operations: half-year churn and retention " +
        "segments — beyond-reference engine surface (§2.10 completion)."),

    // ------------------------------------------------- lead/lag gap stats
    Q(
      "q75_event_gap_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Per-user inter-event gaps via lag over a total order (ts, then
        // event_id for same-microsecond ties). Gaps in integer microseconds
        // so every aggregate is order-independent exact; one shuffle on
        // user_id (high cardinality — naturally parallel at corpus scale).
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), Tables.tsMicros(col("ts")).as("tus"))
          .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            count(col("gap_us")).as("n_gaps"),
            max(col("gap_us")).as("max_gap_us"),
            sum(col("gap_us")).as("total_gap_us"),
            sum(when(col("gap_us") > 300L * 1000000L, 1L).otherwise(0L))
              .as("n_session_breaks"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                 epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS gap_us
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(gap_us) AS n_gaps,
               MAX(gap_us) AS max_gap_us,
               CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
               CAST(SUM(CASE WHEN gap_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_session_breaks
        FROM g GROUP BY user_id"""),
      "Per-user inter-event gap statistics via lag over a deterministic " +
        "total order: session-break detection in integer microseconds — " +
        "beyond-reference engine surface (lead/lag window navigation)."),

    // -------------------------------------------------------------- CUBE
    Q(
      "q76_cube_agg",
      (s, dir) => {
        // Pre-aggregate on the FULL grouping key before the cube: Spark's
        // Expand otherwise replicates every input row once per grouping set
        // (4x the scan through the shuffle). Exact decimal sums are
        // associative, so cubing the |flag x status| pre-aggregate is
        // result-identical — and at 100 TB the expand input drops from the
        // fact table to a handful of rows. Measured 1.87 s -> ~0.3 s at
        // sf0.1.
        val base = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("ct"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("decimal(18,2)").as("qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("decimal(18,2)").as("price"))
        base
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("ct")).as("line_ct"),
            sum(col("qty")).cast("double").as("sum_qty"),
            sum(col("price")).cast("double").as("sum_price"))
          .select(col("l_returnflag").as("rflag"),
            col("l_linestatus").as("lstatus"),
            col("line_ct"), col("sum_qty"), col("sum_price"))
      },
      Some("""
        SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
               COUNT(*) AS line_ct,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)"""),
      "CUBE aggregation: all 2^k grouping-set combinations (flag x status " +
        "x subtotals x grand total) in one pass over exact decimals — " +
        "beyond-reference engine surface (completes ROLLUP/PIVOT/CUBE)."),

    // -------------------------------------------------- ntile quantile bins
    Q(
      "q79_length_deciles",
      (s, dir) => {
        import graft.operators.RangeOps
        // Decile binning of document lengths — the SCALE-SAFE form: approx
        // cutpoints pick balanced n_chars ranges, per-range exact counts
        // broadcast as offsets, and a range-partitioned local row_number +
        // offset is the exact global rank; the standard ntile arithmetic on
        // (rank, N) then assigns deciles. Bit-identical to ntile(10) over
        // the single-partition (n_chars, doc_id) window (RangeOpsSpec
        // asserts parity; the DuckDB oracle below IS the exact-ntile twin)
        // but no task ever sorts more than ~1/32 of the corpus.
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        val (ranked, total) =
          RangeOps.globalRowNumber(docs, "n_chars", "doc_id", "grank")
        ranked
          .withColumn("decile", RangeOps.ntileFromRank("grank", total, 10))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("sum_chars"))
      },
      Some("""
        WITH b AS (
          SELECT doc_id, n_chars,
                 CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS decile
          FROM documents)
        SELECT decile, COUNT(*) AS n_docs,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM b GROUP BY decile"""),
      "Quantile binning: ntile(10) length deciles over a deterministic " +
        "total order with per-bin profiles — the length-bucketing step of " +
        "a curriculum/packing pipeline (beyond-reference engine surface)."),

    // ------------------------------------------------- skew-salted join
    Q(
      "q82_skew_salted_join",
      (s, dir) => {
        import s.implicits._
        // The fact side joins a 5-row conversion-class dim through
        // SkewOps.saltedJoin: the dim is replicated per salt bucket and the
        // fact side salts deterministically, so ONE hot key fans out over
        // saltBuckets reducers instead of one — the manual mitigation for
        // the AQE skew-join blind spots (joins AQE can't split). Salting is
        // result-invariant; the oracle is the plain join, which is the
        // proof.
        val events = Tables(s, dir, "events")
          .select(col("event_type"), col("user_id"))
        val dim = Seq(("click", 0), ("view", 0), ("signup", 1),
          ("purchase", 1), ("error", 0)).toDF("et", "conv")
        graft.operators.SkewOps.saltedJoin(events, dim, col("event_type"), col("et"))
          .groupBy(col("conv"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        WITH dim(et, conv) AS (VALUES ('click', 0), ('view', 0),
          ('signup', 1), ('purchase', 1), ('error', 0))
        SELECT conv, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events JOIN dim ON event_type = et
        GROUP BY conv"""),
      "Skew-salted join surfaced as a query: hot-key fact side joins a " +
        "replicated-per-salt dim, oracle-proven identical to the plain " +
        "join — the manual skew mitigation for AQE's blind spots " +
        "(beyond-reference engine surface)."),

    // -------------------------------------------- exact percentile profile
    Q(
      "q83_exact_percentiles",
      (s, dir) => {
        // Discrete (picked, never interpolated) percentiles: the element at
        // rank ceil(p*n) under a per-group order. Picking an actual data
        // value sidesteps interpolation-formula drift between engines —
        // both sides run the identical rank arithmetic. The rank comes
        // from RangeOps.groupedRowNumber (two-pass value-range buckets),
        // NOT a per-group window sort: with a handful of event types a
        // `partition by event_type order by value` window funnels a
        // fact-sized sort through one task per group — fine at sf0.01,
        // fatal at corpus scale. No tiebreak needed: only `value` at the
        // picked rank is read, and any order among equal values yields
        // the same value. approx_percentile remains the documented 100 TB
        // switch; this is its exactness baseline.
        graft.operators.RangeOps.groupedRowNumber(
            Tables(s, dir, "events").select(col("event_type"), col("value")),
            "event_type", "value", Nil, "rk", "n")
          .groupBy("event_type")
          .agg(max(col("n")).as("n_events"),
            max(when(col("rk") === ceil(col("n") * 0.5), col("value"))).as("p50"),
            max(when(col("rk") === ceil(col("n") * 0.9), col("value"))).as("p90"),
            max(when(col("rk") === ceil(col("n") * 0.99), col("value"))).as("p99"))
      },
      Some("""
        WITH r AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, MAX(n) AS n_events,
               MAX(CASE WHEN rk = CEIL(n * 0.5) THEN value END) AS p50,
               MAX(CASE WHEN rk = CEIL(n * 0.9) THEN value END) AS p90,
               MAX(CASE WHEN rk = CEIL(n * 0.99) THEN value END) AS p99
        FROM r GROUP BY event_type"""),
      "Exact discrete percentiles per group (rank-picked data values, no " +
        "interpolation): the column-profile percentiles a warehouse quotes " +
        "— engine-exact by construction (beyond-reference engine " +
        "surface)."),

    // ------------------------------------------------- fixed-width histogram
    Q(
      "q84_value_histogram",
      (s, dir) =>
        // Fixed-width histogram as a pure hash aggregation: bucket =
        // floor(value/width) — scan-speed, one shuffle on (type, bucket),
        // bucket count bounded by the value range, not the row count.
        Tables(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") / 50.0).cast("long").as("bucket"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n_events"))
          .withColumn("bucket_lo", col("bucket") * 50.0),
      Some("""
        SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
               COUNT(*) AS n_events,
               CAST(FLOOR(value / 50.0) AS BIGINT) * 50.0 AS bucket_lo
        FROM events
        GROUP BY 1, 2"""),
      "Fixed-width value histogram per event type: floor-bucketing as one " +
        "hash aggregation — the distribution profile behind monitoring " +
        "dashboards (beyond-reference engine surface)."),

    // ------------------------------------------------ time-grid gap fill
    Q(
      "q85_time_grid_fill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Resample to a dense per-user daily grid: sequence() generates the
        // calendar spine (one row, exploded), cross join the (small) user
        // dim, left join real daily counts, then forward-fill the last
        // active day with a running max — gap filling and
        // days-since-last-activity without any non-deterministic
        // interpolation. The spine explode is O(days); the fill is one
        // window per user.
        val e = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val daily = e.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
        val spine = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val grid = e.select("user_id").distinct().crossJoin(broadcast(spine))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        grid.join(daily, Seq("user_id", "day"), "left_outer")
          .withColumn("n_events", coalesce(col("n"), lit(0L)))
          .withColumn("last_active",
            max(when(col("n_events") > 0, col("day"))).over(w))
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_events"),
            when(col("last_active").isNull, lit(-1L))
              .otherwise(datediff(col("day"), col("last_active")).cast("long"))
              .as("days_since_active"))
      },
      Some("""
        WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        daily AS (SELECT user_id, day, COUNT(*) AS n FROM e GROUP BY 1, 2),
        spine AS (
          SELECT CAST(unnest(generate_series(MIN(day), MAX(day),
                   INTERVAL 1 DAY)) AS DATE) AS day
          FROM e),
        grid AS (SELECT DISTINCT e.user_id, spine.day FROM e CROSS JOIN spine),
        f AS (
          SELECT g.user_id, g.day, COALESCE(d.n, 0) AS n_events
          FROM grid g LEFT JOIN daily d USING (user_id, day)),
        ff AS (
          SELECT user_id, day, n_events,
                 MAX(CASE WHEN n_events > 0 THEN day END)
                   OVER (PARTITION BY user_id ORDER BY day) AS last_active
          FROM f)
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CAST(n_events AS BIGINT) AS n_events,
               CASE WHEN last_active IS NULL THEN -1
                    ELSE date_diff('day', last_active, day) END AS days_since_active
        FROM ff"""),
      "Time-series resampling: calendar-spine cross join + left join + " +
        "running-max forward fill — dense per-user daily activity with " +
        "days-since-last-active, fully deterministic (beyond-reference " +
        "engine surface: gap filling)."),

    // ---------------------------------------------------- global top-k
    Q(
      "q86_global_topk",
      (s, dir) =>
        // Global ORDER BY + LIMIT plans as TakeOrderedAndProject: each
        // partition keeps its local top-20 and only those reach the driver-
        // side merge — no global sort ever materializes. The deterministic
        // (n_chars desc, doc_id) tiebreak makes the result set (and the
        // oracle) total-order stable.
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(20),
      Some("""
        SELECT doc_id, lang, n_chars
        FROM documents
        ORDER BY n_chars DESC, doc_id
        LIMIT 20"""),
      "Global top-k (ORDER BY + LIMIT -> TakeOrderedAndProject: per-" +
        "partition partial top-k, no full sort) — the longest-documents " +
        "report every corpus survey starts with (beyond-reference engine " +
        "surface)."),

    // ------------------------------------------------- sequence packing
    Q(
      "q87_sequence_packing",
      (s, dir) => {
        import graft.operators.RangeOps
        // Concat-and-chunk packing index (how pretraining actually packs
        // documents into fixed context windows): documents concatenate in
        // doc_id order, every window of C tokens becomes one training
        // sequence, docs may straddle windows. The running sum is the
        // SCALE-SAFE two-pass distributed prefix sum (doc_id range buckets,
        // per-bucket token sums -> broadcast exclusive offsets -> bucket-
        // local running sum + offset) — deterministic longs, bit-identical
        // to the single-partition window (RangeOpsSpec asserts parity),
        // and every bucket's sort is ~1/32 of the corpus.
        val C = 512L
        // null text packs zero tokens (coalesce BEFORE the typed prefix
        // sum — RangeOps encodes non-null longs; DirtyCorpusSpec pins
        // the null-text corpus path)
        RangeOps.runningSum(
            Tables(s, dir, "documents")
              .select(col("doc_id"),
                coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
                  .as("tok")),
            "doc_id", "tok", "cum")
          .withColumn("bin", floor((col("cum") - col("tok")) / C))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs_starting"),
            sum(col("tok")).as("tokens_started"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS tok
          FROM documents),
        c AS (
          SELECT doc_id, tok,
                 SUM(tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
        SELECT CAST(FLOOR((cum - tok) / 512.0) AS BIGINT) AS bin,
               COUNT(*) AS n_docs_starting,
               CAST(SUM(tok) AS BIGINT) AS tokens_started,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM c
        GROUP BY 1"""),
      "Sequence-packing index: concat-and-chunk documents into 512-token " +
        "context windows via one running sum + floor division — the " +
        "packing step between curation and the trainer (pipeline ops " +
        "brief)."),

    // ------------------------------------------------------ event debounce
    Q(
      "q88_event_debounce",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Debounce/throttle: kept=1 iff >= 6 h after the previous raw event
        // of the same user (first event kept). Millisecond integers over a
        // (ms, event_id) total order — engine-exact; one shuffle on
        // user_id. Streaming twin: StatefulOps.debounce (same semantics
        // across micro-batches, spec-proven equivalent).
        val gapMs = 6L * 3600 * 1000
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), Tables.tsMillis(col("ts")).as("ms"))
          .withColumn("prev", lag(col("ms"), 1).over(w))
          .select(col("user_id"), col("event_id"),
            when(col("prev").isNull || col("ms") - col("prev") >= gapMs, 1)
              .otherwise(0).cast("int").as("kept"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
                 lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS prev
          FROM events)
        SELECT user_id, event_id,
               CAST(CASE WHEN prev IS NULL OR ms - prev >= 21600000
                         THEN 1 ELSE 0 END AS INT) AS kept
        FROM g"""),
      "Event debounce/throttle: keep an event only >= 6 h after the " +
        "user's previous raw event — rate limiting for alert/notification " +
        "pipelines; streaming twin in StatefulOps.debounce " +
        "(beyond-reference engine surface)."),

    // ----------------------------------------------- RANGE-frame rolling sum
    Q(
      "q91_rolling_7d",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // 7-day trailing revenue per day through a RANGE frame over the
        // day number — unlike q69's ROWS frame, missing calendar days
        // correctly shrink the window instead of reaching further back.
        // Exact decimals inside the frame, one cast at the edge.
        // The unpartitioned window runs AFTER the per-day rollup, whose
        // cardinality is bounded by the calendar (1 row/day regardless of
        // input scale), so the single-partition sort never sees raw data.
        val daily = Tables(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("day_amt"))
          .withColumn("dayn", datediff(col("d"), to_date(lit("1970-01-01"))))
        val w = Window.orderBy(col("dayn")).rangeBetween(-6, 0)
        daily.select(
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("day_amt").cast("double").as("day_amount"),
          sum(col("day_amt")).over(w).cast("double").as("rolling_7d"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_amt,
                 date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayn
          FROM orders GROUP BY 1, 3)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               CAST(day_amt AS DOUBLE) AS day_amount,
               CAST(SUM(day_amt) OVER (ORDER BY dayn
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS rolling_7d
        FROM daily"""),
      "7-day trailing sums via a RANGE window frame over day numbers " +
        "(calendar gaps shrink the window; ROWS frames would not) — " +
        "beyond-reference engine surface (range frames)."),

    // ------------------------------------------------- ordered event funnel
    Q(
      "q92_funnel_conversion",
      (s, dir) => {
        // Ordered view→click→purchase funnel per user-day: each stage's
        // first qualifying timestamp must strictly follow the previous
        // stage's (min-ts chaining, not mere same-day presence). Three
        // aggregations + two equi joins, all shuffled on (user_id, day) —
        // high-cardinality keys, so the plan stays balanced at corpus
        // scale; integer-µs comparisons keep it engine-exact.
        val e = Tables(s, dir, "events").select(
          col("user_id"), to_date(col("ts")).as("d"),
          col("event_type"), Tables.tsMicros(col("ts")).as("tus"))
        val ks = Seq("user_id", "d")
        val v = e.filter(col("event_type") === "view")
          .groupBy(ks.map(col): _*).agg(min("tus").as("v_ts"))
        val c = e.filter(col("event_type") === "click")
          .join(v, ks).filter(col("tus") > col("v_ts"))
          .groupBy(ks.map(col): _*).agg(min("tus").as("c_ts"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, ks).filter(col("tus") > col("c_ts"))
          .groupBy(ks.map(col): _*).agg(min("tus").as("p_ts"))
        v.join(c.select(col("user_id"), col("d"), col("c_ts")), ks, "left_outer")
          .join(p.select(col("user_id"), col("d"), col("p_ts")), ks, "left_outer")
          .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_viewed"),
            count(col("c_ts")).as("n_clicked_after_view"),
            count(col("p_ts")).as("n_purchased_after_click"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS d, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS tus
          FROM events),
        v AS (SELECT user_id, d, MIN(tus) AS v_ts FROM e
              WHERE event_type = 'view' GROUP BY user_id, d),
        c AS (SELECT e.user_id, e.d, MIN(e.tus) AS c_ts
              FROM e JOIN v ON e.user_id = v.user_id AND e.d = v.d
              WHERE e.event_type = 'click' AND e.tus > v.v_ts
              GROUP BY e.user_id, e.d),
        p AS (SELECT e.user_id, e.d, MIN(e.tus) AS p_ts
              FROM e JOIN c ON e.user_id = c.user_id AND e.d = c.d
              WHERE e.event_type = 'purchase' AND e.tus > c.c_ts
              GROUP BY e.user_id, e.d)
        SELECT strftime(v.d, '%Y-%m-%d') AS day,
               COUNT(*) AS n_viewed,
               COUNT(c.c_ts) AS n_clicked_after_view,
               COUNT(p.p_ts) AS n_purchased_after_click
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id AND v.d = c.d
        LEFT JOIN p ON v.user_id = p.user_id AND v.d = p.d
        GROUP BY 1"""),
      "Ordered conversion funnel (view→click→purchase, each stage " +
        "strictly after the previous) per day via min-ts chaining — the " +
        "product-analytics staple (beyond-reference engine surface)."),

    // --------------------------------------------------- retention cohorts
    Q(
      "q93_retention_cohorts",
      (s, dir) => {
        // Cohort retention matrix: users grouped by first-active day,
        // counted at each day offset they return. Two aggregations + one
        // join on user_id — the per-user history fan-in is bounded by the
        // calendar, and the output is cohorts × offsets (tiny) however
        // large the input.
        val act = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val first = act.groupBy("user_id").agg(min("d").as("cd"))
        val sizes = first.groupBy("cd").agg(count(lit(1)).as("cohort_size"))
        act.join(first, "user_id")
          .groupBy(col("cd"), datediff(col("d"), col("cd")).as("day_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cd")
          .select(date_format(col("cd"), "yyyy-MM-dd").as("cohort_day"),
            col("day_offset"), col("cohort_size"), col("n_active"))
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        f AS (SELECT user_id, MIN(d) AS cd FROM act GROUP BY user_id),
        sz AS (SELECT cd, COUNT(*) AS cohort_size FROM f GROUP BY cd),
        r AS (
          SELECT f.cd, CAST(date_diff('day', f.cd, act.d) AS INT) AS day_offset,
                 COUNT(*) AS n_active
          FROM act JOIN f USING (user_id)
          GROUP BY 1, 2)
        SELECT strftime(r.cd, '%Y-%m-%d') AS cohort_day,
               r.day_offset, sz.cohort_size, r.n_active
        FROM r JOIN sz USING (cd)"""),
      "Retention cohort matrix: first-active-day cohorts × return-day " +
        "offsets with cohort sizes — distinct-activity rollup, join on " +
        "user_id only (beyond-reference engine surface)."),

    // ------------------------------------------------- Z-order data layout
    Q(
      "q98_zorder_layout",
      (s, dir) => {
        // Z-order (Morton) interleaving of (custkey, order-day) — the
        // multi-dimensional clustering key behind OPTIMIZE ZORDER BY: one
        // sort key that keeps BOTH dimensions range-bounded per bucket, so
        // a 100 TB table laid out by z supports file skipping on either
        // column. The per-bucket min/max spans ARE the demonstration:
        // every bucket bounds custkey and day simultaneously (row-major
        // sorting would bound only the leading column). Bit interleave as
        // an integer fold — engine-exact.
        val zExpr = "aggregate(sequence(0, 9), 0L, (acc, i) -> acc" +
          " + shiftleft(shiftright(zx, i) & 1L, 2 * i)" +
          " + shiftleft(shiftright(zy, i) & 1L, 2 * i + 1))"
        Tables(s, dir, "orders")
          .select(pmod(col("o_custkey"), lit(1024)).cast("long").as("zx"),
            pmod(datediff(to_date(col("o_orderdate")),
              to_date(lit("1970-01-01"))), lit(1024)).cast("long").as("zy"))
          .withColumn("z", expr(zExpr))
          .withColumn("bucket", expr("z div 16384"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("zx").as("min_cust"), max("zx").as("max_cust"),
            min("zy").as("min_day"), max("zy").as("max_day"))
      },
      Some("""
        WITH b AS (
          SELECT o_custkey % 1024 AS zx,
                 date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) % 1024 AS zy
          FROM orders),
        z AS (
          SELECT zx, zy,
                 (SELECT SUM((((zx >> i) & 1) << (2 * i))
                           + (((zy >> i) & 1) << (2 * i + 1)))
                  FROM UNNEST(generate_series(0, 9)) AS t(i)) AS z
          FROM b)
        SELECT CAST(z AS BIGINT) // 16384 AS bucket,
               COUNT(*) AS n_rows,
               MIN(zx) AS min_cust, MAX(zx) AS max_cust,
               MIN(zy) AS min_day, MAX(zy) AS max_day
        FROM z GROUP BY 1"""),
      "Z-order (Morton) multi-dimensional layout key: bit-interleaved " +
        "(custkey, day) with per-bucket min/max spans bounding BOTH " +
        "columns — the OPTIMIZE ZORDER clustering primitive for " +
        "two-column file skipping (beyond-reference engine surface)."),

    // ------------------------------------------------ explicit GROUPING SETS
    Q(
      "q101_grouping_sets",
      (s, dir) => {
        // The non-hierarchical grouping-set combination neither ROLLUP
        // (q67, prefixes) nor CUBE (q76, all subsets) expresses: the two
        // one-dimensional margins plus the grand total, skipping the full
        // cross table. Same Expand pre-aggregation trick as q76: exact
        // decimal sums are associative, so expanding the |flag×status|
        // rollup instead of the fact scan is result-identical.
        val base = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("ct"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("decimal(18,2)").as("price"))
        base
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("ct")).as("line_ct"),
            sum(col("price")).cast("double").as("sum_price"))
          .select(col("l_returnflag").as("rflag"),
            col("l_linestatus").as("lstatus"),
            col("line_ct"), col("sum_price"))
      },
      Some("""
        SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
               COUNT(*) AS line_ct,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""),
      "Explicit GROUPING SETS (both one-dim margins + grand total, no " +
        "cross table) — the arbitrary-subtotal form completing " +
        "ROLLUP/CUBE/PIVOT (beyond-reference engine surface)."),

    // --------------------------------------- relative-rank window functions
    Q(
      "q102_relative_rank",
      (s, dir) => {
        import graft.operators.RangeOps
        // percent_rank / cume_dist per language over document length:
        // rank-based ratios of integers, so the doubles are single exact
        // divisions — engine-identical (unlike any summed float). The
        // SCALE-SAFE two-pass form: real corpora are ~50% one language, so
        // the per-lang window would sort half the corpus in one task;
        // instead rank = (lang, n_chars-range-bucket)-local rank + a
        // broadcast per-(lang, bucket) count offset, spreading every
        // language over all 32 range buckets. Bit-identical to the window
        // functions (RangeOpsSpec asserts parity on a 90%-one-lang skew
        // fixture; the oracle below is the exact-window twin).
        RangeOps.relativeRanks(
          Tables(s, dir, "documents")
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", "pct_rank", "cume")
      },
      Some("""
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM documents
        WINDOW w AS (PARTITION BY lang ORDER BY n_chars)"""),
      "Relative-rank window functions (percent_rank, cume_dist) per " +
        "group: exact integer-ratio doubles, ties resolved identically in " +
        "both engines — beyond-reference engine surface (window " +
        "navigation completion)."),

    // ------------------------------------------------ last-touch attribution
    Q(
      "q103_last_touch_attribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Marketing attribution: each purchase credits the user's most
        // recent view/click in the prior 7 days (deterministic tiebreak on
        // (tus, event_id) desc); purchases with no touch are 'direct'.
        // The as-of shape of q53, composed into a revenue rollup: join on
        // user_id (high cardinality), per-purchase top-1 via the
        // WindowGroupLimit partial-rank path, then a channels-sized
        // aggregate.
        val e = Tables(s, dir, "events").select(col("user_id"),
          col("event_id"), Tables.tsMicros(col("ts")).as("tus"),
          col("event_type"), col("value"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_eid"),
            col("tus").as("p_tus"), col("value"))
        val t = e.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("event_id").as("t_eid"),
            col("tus").as("t_tus"), col("event_type").as("channel"))
        val w = Window.partitionBy(col("p_eid"))
          .orderBy(col("t_tus").desc, col("t_eid").desc)
        // lookback predicate INSIDE the join condition: as a post-filter it
        // would delete purchases whose only touches are out-of-window
        // instead of falling them back to 'direct'
        val attributed = p.join(t,
            p("user_id") === t("user_id") &&
              t("t_tus") < p("p_tus") &&
              t("t_tus") >= p("p_tus") - lit(7L * 86400000000L),
            "left_outer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        attributed
          .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("attributed_value"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                 event_type, value
          FROM events),
        p AS (SELECT user_id, event_id AS p_eid, tus AS p_tus, value
              FROM e WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_id AS t_eid, tus AS t_tus,
                     event_type AS channel
              FROM e WHERE event_type IN ('view', 'click')),
        j AS (
          SELECT p.p_eid, p.value, t.channel,
                 row_number() OVER (PARTITION BY p.p_eid
                   ORDER BY t.t_tus DESC, t.t_eid DESC) AS rn
          FROM p LEFT JOIN t
            ON p.user_id = t.user_id
           AND t.t_tus < p.p_tus
           AND t.t_tus >= p.p_tus - 604800000000)
        SELECT COALESCE(channel, 'direct') AS channel,
               COUNT(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 AS attributed_value
        FROM j WHERE rn = 1
        GROUP BY 1"""),
      "Last-touch attribution: each purchase credits the most recent " +
        "view/click inside a 7-day lookback (as-of top-1 per purchase), " +
        "unmatched purchases fall to 'direct' — the product-analytics " +
        "revenue-attribution staple (beyond-reference engine surface)."),

    // --------------------------------------------- page-transition matrix
    Q(
      "q104_transition_matrix",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // First-order Markov transition counts over each user's event
        // sequence (lag over the deterministic total order), with a ppm
        // row-share per source state — integer-exact. One shuffle on
        // user_id for the lag, one tiny aggregate; the matrix is
        // |event-types|² however large the input.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            Tables.tsMicros(col("ts")).as("tus"), col("event_type"))
          .withColumn("from_type", lag(col("event_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share_ppm",
            expr("n * 1000000L div sum(n) over (partition by from_type)"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_type,
                 lag(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                   AS from_type
          FROM events),
        m AS (
          SELECT from_type, event_type AS to_type, COUNT(*) AS n
          FROM g WHERE from_type IS NOT NULL
          GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY from_type)
                                  AS BIGINT) AS share_ppm
        FROM m"""),
      "First-order Markov page-transition matrix (lag pairs over the " +
        "per-user total order) with integer ppm row shares — the " +
        "user-journey diagnostic behind funnel design " +
        "(beyond-reference engine surface)."),

    // ------------------------------------------------ Pareto skyline
    Q(
      "q105_pareto_skyline",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Skyline (Pareto frontier) over orders: keep an order iff no
        // strictly earlier day saw a strictly higher price. Computed
        // scale-safely: the prefix max runs over the DAILY maxima
        // (calendar-bounded, one row/day however large the table), then a
        // broadcast join back to orders applies the per-day threshold —
        // never an unpartitioned window over the fact table.
        val o = Tables(s, dir, "orders").select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          col("o_totalprice").cast("double").as("price"))
        val daily = o.groupBy("d").agg(max(col("price")).as("day_max"))
          .withColumn("dayn",
            datediff(col("d"), to_date(lit("1970-01-01"))))
        val w = Window.orderBy(col("dayn"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val thresholds = daily
          .withColumn("prev_max", max(col("day_max")).over(w))
          .select(col("d"), col("prev_max"))
        o.join(broadcast(thresholds), "d")
          .filter(col("prev_max").isNull || col("price") >= col("prev_max"))
          .select(col("o_orderkey"),
            date_format(col("d"), "yyyy-MM-dd").as("day"), col("price"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders),
        daily AS (
          SELECT d, MAX(price) AS day_max,
                 date_diff('day', DATE '1970-01-01', d) AS dayn
          FROM o GROUP BY d),
        th AS (
          SELECT d, MAX(day_max) OVER (ORDER BY dayn
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
          FROM daily)
        SELECT o.o_orderkey, strftime(o.d, '%Y-%m-%d') AS day, o.price
        FROM o JOIN th ON o.d = th.d
        WHERE th.prev_max IS NULL OR o.price >= th.prev_max"""),
      "Pareto skyline (no strictly earlier day with a strictly higher " +
        "price): prefix max over calendar-bounded daily maxima + broadcast " +
        "threshold join — multi-objective dominance filtering " +
        "(beyond-reference engine surface)."),

    // --------------------------------------------- MAD outlier detection
    Q(
      "q106_mad_outliers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Robust outlier detection on daily revenue: median absolute
        // deviation with rank-picked medians (actual data values, never
        // interpolated — the q83 trick), flag = |x − med| > 3·1.4826·MAD.
        // Exact decimals through both median picks; one double multiply
        // at the comparison, identical in both engines. All windows run
        // over the calendar-bounded daily rollup.
        val daily = Tables(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("amt"))
        def medianOf(df: DataFrame, c: String): DataFrame = {
          val w = Window.orderBy(col(c), col("d"))
          df.withColumn("rn", row_number().over(w))
            .withColumn("n", count(lit(1)).over(
              Window.partitionBy()))
            .filter(col("rn") === expr("(n + 1) div 2"))
            .select(col(c).as("m"))
        }
        val med = medianOf(daily, "amt")
        val dev = daily.crossJoin(broadcast(med))
          .withColumn("adev", abs(col("amt") - col("m")))
        val mad = medianOf(dev.select(col("d"), col("adev")), "adev")
          .withColumnRenamed("m", "mad")
        dev.crossJoin(broadcast(mad))
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("amt").cast("double").as("day_amount"),
            // 4.4478 as ONE literal on both sides: 3.0*1.4826 rounds
            // differently than the decimal literal's nearest double
            (col("adev").cast("double") >
              lit(4.4478) * col("mad").cast("double"))
              .cast("int").as("is_outlier"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
          FROM orders GROUP BY 1),
        r AS (
          SELECT d, amt,
                 row_number() OVER (ORDER BY amt, d) AS rn,
                 COUNT(*) OVER () AS n
          FROM daily),
        med AS (SELECT amt AS m FROM r WHERE rn = (n + 1) // 2),
        dev AS (SELECT daily.d, daily.amt, ABS(daily.amt - med.m) AS adev
                FROM daily, med),
        r2 AS (
          SELECT adev, row_number() OVER (ORDER BY adev, d) AS rn,
                 COUNT(*) OVER () AS n
          FROM dev),
        mad AS (SELECT adev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        SELECT strftime(dev.d, '%Y-%m-%d') AS day,
               CAST(dev.amt AS DOUBLE) AS day_amount,
               CAST(CAST(dev.adev AS DOUBLE) >
                      4.4478 * CAST(mad.mad AS DOUBLE) AS INT) AS is_outlier
        FROM dev, mad"""),
      "Robust anomaly detection: median-absolute-deviation flags on daily " +
        "revenue with rank-picked (never interpolated) medians — " +
        "engine-exact despite the robust statistics " +
        "(beyond-reference engine surface)."),

    // ------------------------------------------------ rolling distinct DAU
    Q(
      "q109_rolling_dau",
      (s, dir) => {
        // 7-day rolling ACTIVE USERS per day. Distinct counts cannot ride
        // a window frame (sums can — q91), so the rolling set is expressed
        // as day-spine × 7 offsets joined to the distinct (user, day)
        // activity — the offsets table is a constant 7 rows, the spine is
        // calendar-bounded, and the only large shuffle is the final
        // count-distinct keyed by report day.
        val act = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val spine = act.select(col("d").as("rd")).distinct()
        val win = spine.crossJoin(
            broadcast(s.range(0, 7).select(col("id").cast("int").as("off"))))
          .select(col("rd"), date_sub(col("rd"), col("off")).as("d"))
        win.join(act, "d")
          .groupBy(date_format(col("rd"), "yyyy-MM-dd").as("day"))
          .agg(countDistinct(col("user_id")).as("dau_7d"))
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        spine AS (SELECT DISTINCT d AS rd FROM act),
        win AS (
          SELECT rd, rd - i * INTERVAL 1 DAY AS d
          FROM spine, UNNEST(generate_series(0, 6)) AS t(i))
        SELECT strftime(win.rd, '%Y-%m-%d') AS day,
               COUNT(DISTINCT act.user_id) AS dau_7d
        FROM win JOIN act ON CAST(win.d AS DATE) = act.d
        GROUP BY 1"""),
      "Rolling 7-day distinct active users: day-spine × offsets join " +
        "against distinct activity (distinct counts cannot ride a window " +
        "frame) — the DAU/WAU dashboard staple " +
        "(beyond-reference engine surface)."),

    // ----------------------------------------------- activity bitmaps
    Q(
      "q110_activity_bitmaps",
      (s, dir) => {
        // Per-user activity as a 30-bit bitmap (bit i = active on day i) —
        // the bitmap-index representation Druid/ClickHouse-style engines
        // use for segment membership: one bit_or aggregate per user, then
        // popcount analytics are pure integer ops on one long per user.
        val base = to_date(lit("2024-01-01"))
        Tables(s, dir, "events")
          .select(col("user_id"), datediff(to_date(col("ts")), base).as("off"))
          .filter(col("off").between(0, 29))
          .select(col("user_id"), expr("shiftleft(1L, off)").as("bit"))
          .groupBy("user_id")
          .agg(expr("bit_or(bit)").as("bitmap"))
          .select(col("user_id"), col("bitmap"),
            bit_count(col("bitmap")).as("n_active_days"),
            bit_count(col("bitmap").bitwiseAND(lit(127L)))
              .as("active_week1"),
            (col("bitmap").bitwiseAND(lit(1L)) === 1L).cast("int")
              .as("active_day0"))
      },
      Some("""
        WITH b AS (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS off
          FROM events),
        m AS (
          SELECT user_id,
                 CAST(BIT_OR(1::BIGINT << off) AS BIGINT) AS bitmap
          FROM b WHERE off BETWEEN 0 AND 29
          GROUP BY user_id)
        SELECT user_id, bitmap,
               CAST(bit_count(bitmap) AS INT) AS n_active_days,
               CAST(bit_count(bitmap & 127) AS INT) AS active_week1,
               CAST((bitmap & 1) = 1 AS INT) AS active_day0
        FROM m"""),
      "Per-user activity bitmaps (bit_or of day bits + popcount " +
        "analytics): the bitmap-index membership representation, one " +
        "long per user regardless of event count " +
        "(beyond-reference engine surface)."),

    // --------------------------------------------------- zone maps
    Q(
      "q112_zone_maps",
      (s, dir) => {
        // Zone maps (per-storage-bucket min/max synopses) — the data-
        // skipping metadata parquet/ORC/ClickHouse keep per block: one
        // aggregate keyed by bucket, plus the skip decision for a sample
        // predicate (o_orderdate >= 2024-07-01) evaluated on the synopsis
        // alone. Lexicographic-vs-temporal agreement of ISO date strings
        // (q31) is what makes the string min/max a valid date zone map.
        Tables(s, dir, "orders")
          .select(expr("o_orderkey div 1024").as("bucket"),
            date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("ds"),
            col("o_totalprice").cast("double").as("price"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min(col("ds")).as("min_date"), max(col("ds")).as("max_date"),
            min(col("price")).as("min_price"),
            max(col("price")).as("max_price"))
          .withColumn("skip_h2",
            (col("max_date") < "2024-07-01").cast("int"))
      },
      Some("""
        WITH b AS (
          SELECT o_orderkey // 1024 AS bucket,
                 strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
                 CAST(o_totalprice AS DOUBLE) AS price
          FROM orders)
        SELECT bucket, COUNT(*) AS n_rows,
               MIN(ds) AS min_date, MAX(ds) AS max_date,
               MIN(price) AS min_price, MAX(price) AS max_price,
               CAST(MAX(ds) < '2024-07-01' AS INT) AS skip_h2
        FROM b GROUP BY bucket"""),
      "Zone maps: per-bucket min/max synopses plus a predicate skip " +
        "decision computed on the synopsis alone — the data-skipping " +
        "metadata that prunes blocks at 100 TB " +
        "(beyond-reference engine surface)."),

    // ------------------------------------------------- lateness audit
    Q(
      "q113_lateness_audit",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Watermark-design audit: per partition-analog (user_id — the
        // Kafka key whose per-partition order a watermark actually sees),
        // replay events in arrival order (event_id) and count how many
        // would arrive behind a 3 s / 30 s watermark — the measurement
        // that picks W1/W2's bounded-OOO delay from data instead of
        // folklore. One shuffle on user_id, running max per key.
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            Tables.tsMicros(col("ts")).as("tus"),
            to_date(col("ts")).as("d"))
          .withColumn("hwm", max(col("tus")).over(w))
          .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("tus") < col("hwm") - 3000000L, 1L).otherwise(0L))
              .as("n_late_3s"),
            sum(when(col("tus") < col("hwm") - 30000000L, 1L).otherwise(0L))
              .as("n_late_30s"))
      },
      Some("""
        WITH a AS (
          SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                 CAST(ts AS DATE) AS d,
                 MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
          FROM events)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN tus < hwm - 3000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late_3s,
               CAST(SUM(CASE WHEN tus < hwm - 30000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late_30s
        FROM a GROUP BY 1"""),
      "Watermark lateness audit: per-key arrival-order replay counting " +
        "events a 3 s / 30 s bounded-OOO watermark would drop — the " +
        "data-driven way to size W1/W2 delays " +
        "(beyond-reference engine surface)."),

    // ------------------------------------------- weekly rollup + WoW growth
    Q(
      "q114_weekly_growth",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // ISO-week revenue with week-over-week growth: date_trunc('week')
        // agrees between engines (ISO Monday start), growth is an integer
        // ppm ratio over exact decimal sums — the BI trend line without a
        // float division drift. Lag rides the calendar-bounded weekly
        // rollup.
        val weekly = Tables(s, dir, "orders")
          .groupBy(date_trunc("week", col("o_orderdate")).as("wk"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("amt"),
            count(lit(1)).as("n_orders"))
        val w = Window.orderBy(col("wk"))
        weekly
          .withColumn("prev", lag(col("amt"), 1).over(w))
          .select(date_format(col("wk"), "yyyy-MM-dd").as("week_start"),
            col("n_orders"), col("amt").cast("double").as("revenue"),
            expr("cast((amt - prev) * 1000000 as bigint) div " +
              "cast(prev * 100 as bigint)").as("wow_growth_x10k"))
      },
      Some("""
        WITH weekly AS (
          SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS wk,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1),
        g AS (
          SELECT wk, n_orders, amt,
                 lag(amt, 1) OVER (ORDER BY wk) AS prev
          FROM weekly)
        SELECT strftime(wk, '%Y-%m-%d') AS week_start, n_orders,
               CAST(amt AS DOUBLE) AS revenue,
               CAST((amt - prev) * 1000000 AS BIGINT)
                 // CAST(prev * 100 AS BIGINT) AS wow_growth_x10k
        FROM g"""),
      "ISO-week revenue rollup with week-over-week growth as an integer " +
        "ratio over exact decimal sums — the BI trend staple without " +
        "float-division drift (beyond-reference engine surface)."),

    // --------------------------------------------- co-purchase affinity
    Q(
      "q115_basket_affinity",
      (s, dir) => {
        // Market-basket affinity: part-type pairs bought together in one
        // order. The pair expansion is per-order (bounded by order line
        // count — TPC-H ≤7, never corpus-sized), then one aggregate over
        // (type, type) — the same capped-blocking discipline as the dedup
        // family, applied to retail affinity. Type lookup joins before
        // the self-join so the pair join carries small ints, not part
        // rows.
        // NOT floor-limited (measured, round 13): the pre-shuffle work is
        // a projection + broadcast probe + partial distinct — cheap per
        // row — and Tables.parallel's round-robin cost exceeded the
        // unlocked parallelism (1.42 → 1.56 s at sf0.1), so the plain
        // scan stays
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val types = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))
        val typed = li.join(types, li("l_partkey") === types("p_partkey"))
          .select(col("l_orderkey"), col("p_type"))
        // in-row pair expansion instead of the orderkey self-join
        // (round-19 optimization, guide §2.4; the jaccardPairs/mh_pairs
        // in-group pattern): per-order type SETS are bounded (≤7
        // lineitems/order), so collect_set per order folds the old
        // `.distinct()` into the same shuffle and the in-row expansion
        // replaces the self-join — one order-keyed exchange total where
        // the join form paid the distinct exchange plus the join's.
        // array_sort makes x < y deterministic and identical to the join
        // predicate's p_type ordering; pair counts are unchanged
        // (distinct-per-order ≡ collect_set).
        typed
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_set(col("p_type"))).as("ts"))
          .select(explode(expr(
            "flatten(transform(ts, (x, ix) -> " +
              "filter(transform(ts, (y, iy) -> " +
              "IF(x < y, struct(x AS a, y AS b), NULL)), p -> p IS NOT NULL)))"))
            .as("p"))
          .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 20)
      },
      Some("""
        WITH typed AS (
          SELECT DISTINCT l.l_orderkey, p.p_type
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        SELECT a.p_type AS type_a, b.p_type AS type_b,
               COUNT(*) AS n_orders
        FROM typed a JOIN typed b
          ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
        GROUP BY 1, 2
        HAVING COUNT(*) >= 20"""),
      "Market-basket co-purchase affinity: per-order part-type pairs " +
        "(bounded expansion per basket) aggregated to pair counts — " +
        "the retail recommendation primitive " +
        "(beyond-reference engine surface)."),

    // --------------------------------------------- fulfillment latency
    Q(
      "q116_ship_latency",
      (s, dir) => {
        // Order→ship latency distribution per order priority: rank-picked
        // median (q83 discipline) + late rate as integer ppm. A
        // `partition by priority` window would sort ~1/5 of ALL lineitems
        // in one task per priority (the sort, not the shuffle, is the
        // single-task killer). But `days` is a bounded small int
        // (order→ship spans ≤ ~4 months), so the scale-right plan is
        // RangeOps.groupedValueCounts: ONE fact pass collapses to a
        // (priority, days) count rollup — ~600 rows at ANY corpus scale —
        // and the median is the smallest day whose cumulative count
        // reaches rank (n+1) div 2. The l_orderkey tiebreak of the
        // row_number form is unnecessary: every row of one day is one
        // rollup row, and the picked value is the day itself.
        val lat = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
          .join(Tables(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"),
              to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(col("sd"), col("od")).as("days"))
        graft.operators.RangeOps.groupedValueCounts(lat, "priority", "days")
          .groupBy("priority")
          .agg(first(col("n")).as("n_lines"),
            min(col("days")).as("min_days"),
            max(col("days")).as("max_days"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col("days")))
              .as("median_days"),
            expr("sum(case when days > 90 then cnt else 0 end) " +
              "* 1000000L div first(n)").as("late90_ppm"))
      },
      Some("""
        WITH lat AS (
          SELECT o.o_orderpriority AS priority,
                 date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS days,
                 l.l_orderkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        r AS (
          SELECT priority, days,
                 row_number() OVER (PARTITION BY priority
                   ORDER BY days, l_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY priority) AS n
          FROM lat)
        SELECT priority, ANY_VALUE(n) AS n_lines,
               CAST(MIN(days) AS INT) AS min_days,
               CAST(MAX(days) AS INT) AS max_days,
               CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN days END) AS INT)
                 AS median_days,
               CAST(SUM(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT)
                 * 1000000 // COUNT(*) AS late90_ppm
        FROM r GROUP BY priority"""),
      "Order→ship latency distribution per priority: rank-picked median " +
        "+ integer ppm late rate over one fact-fact join — fulfillment " +
        "SLA analytics (beyond-reference engine surface)."),

    // ------------------------------------------ supplier concentration HHI
    Q(
      "q117_supplier_hhi",
      (s, dir) => {
        // Herfindahl–Hirschman supplier-concentration index per part
        // type: squared integer ppm shares summed — fully
        // order-independent (sum of exact integers), no float anywhere.
        // Two aggregates + a type lookup join; output is |types| rows at
        // any scale.
        val li = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_type"), col("l_suppkey"))
        val perSupp = li.groupBy("p_type", "l_suppkey")
          .agg(count(lit(1)).as("n_s"))
        val perType = li.groupBy("p_type").agg(count(lit(1)).as("n_t"))
        perSupp.join(perType, "p_type")
          .withColumn("share_ppm", expr("n_s * 1000000L div n_t"))
          .groupBy("p_type")
          .agg(first(col("n_t")).as("n_lines"),
            count(lit(1)).as("n_suppliers"),
            expr("sum(share_ppm * share_ppm) div 1000000L").as("hhi_ppm"))
      },
      Some("""
        WITH li AS (
          SELECT p.p_type, l.l_suppkey
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        ps AS (SELECT p_type, l_suppkey, COUNT(*) AS n_s
               FROM li GROUP BY 1, 2),
        pt AS (SELECT p_type, COUNT(*) AS n_t FROM li GROUP BY 1),
        sh AS (
          SELECT ps.p_type, pt.n_t,
                 (ps.n_s * 1000000) // pt.n_t AS share_ppm
          FROM ps JOIN pt USING (p_type))
        SELECT p_type, ANY_VALUE(n_t) AS n_lines,
               COUNT(*) AS n_suppliers,
               CAST(SUM(share_ppm * share_ppm) AS BIGINT) // 1000000
                 AS hhi_ppm
        FROM sh GROUP BY p_type"""),
      "Supplier-concentration HHI per part type: squared integer ppm " +
        "shares, order-independent exact — the supply-chain risk metric " +
        "(beyond-reference engine surface)."),

    // --------------------------------- windowed distinct-user sketches
    Q(
      "q140_windowed_distinct_sketch",
      (s, dir) => {
        // Per-(day, event_type) distinct-user LINEAR-COUNTING sketches —
        // the windowed form of q134, i.e. the streaming-dashboard DAU
        // shape: one 4 Ki-bucket occupancy bitmap per window key, OR-
        // mergeable both ACROSS SHARDS and across windows (a week's
        // users = OR of its days' bitmaps, then re-estimate) — at 100 TB
        // each executor ships 512 B per window instead of its user set.
        // The exact distinct rides along as the accuracy audit (the
        // q134 discipline: the exact leg's (window, user) shuffle is the
        // audit's cost, not the sketch's — a deployment carries only the
        // bitmaps). ln() confined to a positive argument exactly as in
        // q134; saturation (occupied = m) reports null, never ln(inf).
        val m = 4096
        Tables(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .select(
            date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"), col("user_id"),
            pmod(hash32(col("user_id").cast("string")), lit(m)).as("b"))
          .groupBy("day", "event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"),
            countDistinct(col("b")).as("occupied"))
          .select(col("day"), col("event_type"),
            col("exact_users"), col("occupied"),
            graft.functions.LinearCounting.estimate(col("occupied"), m)
              .as("lc_est"))
          .withColumn("abs_err_ppm",
            expr("abs(lc_est - exact_users) * 1000000L div exact_users"))
      },
      Some("""
        WITH b AS (
          SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 event_type, user_id,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 4096 AS b
          FROM events WHERE user_id IS NOT NULL),
        g AS (
          SELECT day, event_type, COUNT(DISTINCT user_id) AS exact_users,
                 COUNT(DISTINCT b) AS occupied
          FROM b GROUP BY 1, 2),
        e AS (
          SELECT day, event_type, exact_users, occupied,
                 CASE WHEN occupied = 4096 THEN NULL
                      ELSE CAST(round(4096.0 *
                             ln(4096.0 / (4096.0 - occupied))) AS BIGINT)
                 END AS lc_est
          FROM g)
        SELECT day, event_type, exact_users, occupied, lc_est,
               abs(lc_est - exact_users) * 1000000 // exact_users
                 AS abs_err_ppm
        FROM e"""),
      "Windowed distinct-user linear-counting sketches per (day, " +
        "event_type): 4Ki-bucket occupancy bitmaps, OR-mergeable across " +
        "shards and windows, exact distinct + error ppm riding along — " +
        "the streaming-dashboard DAU shape " +
        "(pipeline ops brief: sketches)."),

    // ------------------------------------ epoch-shuffled sequence packing
    Q(
      "q146_epoch_shuffle_pack",
      (s, dir) => {
        import graft.operators.RangeOps
        import graft.functions.TextFns.hash32
        // q87 packs in doc_id order; a real pretraining run packs in a
        // SHUFFLED order, re-shuffled every epoch. The permutation is a
        // seeded hash sort — deterministic pseudo-random, replayable
        // months later (the q58/q142 sampling contract) — and the only
        // global total-order sort a pretraining pipeline should pay per
        // epoch. Scale shape: the hash is uniform by construction, so the
        // two-pass globalRowNumber (range buckets → broadcast offsets →
        // bucket-local rank) never sees a skewed range, and each epoch is
        // an independent plan — epochs parallelize trivially. The pack
        // manifest (which docs start in which 512-token window, at which
        // global position) is exactly what a trainer's data loader
        // prefetches by.
        val C = 512L
        // the per-row split+md5 is re-evaluated per epoch AND per
        // RangeOps pass (4+ corpus evaluations off one scan) — size-gated
        // floored entry (round 13: x10 6.55 → 5.08 s — the RangeOps shuffles
        // own the rest; gated because the
        // per-row work is q121-class, not gram-explode-class)
        val base = Tables.parallel(s, dir, "documents", 4L << 20)
          .select(col("doc_id"),
          coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
            .as("tok"))
        // fused rank+prefix-sum (ONE offsets job per epoch, ONE window)
        // with arithmetic cutpoints on the uniform 32-bit hash — the
        // composed globalRowNumber→runningSum form paid 4 eager passes
        // per epoch (2 approxQuantile + 2 offset collects, the running-sum
        // pair re-running the rank window); outputs are bit-identical
        // (guide §1.2/§2.4: remove passes, share the exchange)
        val hashCuts = Some(RangeOps.uniformCutpoints(4294967296.0))
        Seq(1L, 2L).map { ep =>
          val hashed = base.withColumn("hv",
            hash32(concat_ws(":", lit(ep), col("doc_id"))))
          RangeOps.rankedRunningSum(hashed, "hv", "doc_id", "tok",
              "pos", "cum", cuts = hashCuts)._1
            .select(col("pos"), col("tok"), col("cum"))
            .withColumn("epoch", lit(ep))
        }.reduce(_ unionByName _)
          .withColumn("bin", floor((col("cum") - col("tok")) / C))
          .groupBy(col("epoch"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("tokens_started"),
            min(col("pos")).as("first_pos"),
            max(col("pos")).as("last_pos"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS tok
          FROM documents),
        ep AS (SELECT CAST(1 AS BIGINT) AS epoch
               UNION ALL SELECT CAST(2 AS BIGINT)),
        h AS (SELECT ep.epoch, t.doc_id, t.tok,
                     CAST(('0x' || substr(md5(ep.epoch || ':' || t.doc_id),
                                          1, 8)) AS BIGINT) AS hv
              FROM ep, t),
        r AS (SELECT epoch, doc_id, tok, hv,
                     row_number() OVER (PARTITION BY epoch
                       ORDER BY hv, doc_id) AS pos
              FROM h),
        c AS (SELECT epoch, pos, tok,
                     SUM(tok) OVER (PARTITION BY epoch ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM r)
        SELECT epoch, CAST(FLOOR((cum - tok) / 512.0) AS BIGINT) AS bin,
               COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens_started,
               CAST(MIN(pos) AS BIGINT) AS first_pos,
               CAST(MAX(pos) AS BIGINT) AS last_pos
        FROM c GROUP BY 1, 2"""),
      "Epoch-shuffled sequence packing: seeded-hash global permutation " +
        "per epoch (deterministic pseudo-random, two-pass distributed " +
        "rank — no single-task sort) + prefix-sum packing into 512-token " +
        "windows — the shuffle-then-pack manifest a trainer's data " +
        "loader consumes, replayable per epoch (pipeline ops brief)."))
}
