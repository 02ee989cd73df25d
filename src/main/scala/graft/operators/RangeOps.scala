package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order operators for the 100 TB path.
  *
  * A plain `Window.orderBy(...)` with no partition funnels the whole input
  * through ONE task (`WindowExec: No Partition Defined`); fine at sf0.01,
  * fatal at corpus scale. Every operator here replaces that shape with the
  * classic two-pass form:
  *
  *   1. approx-quantile cutpoints on the order column pick ~balanced value
  *      ranges (accuracy affects only BALANCE — results never depend on the
  *      cutpoints, so the approximation introduces zero error);
  *   2. per-range exact counts/sums collect to the driver (≤ nBuckets rows)
  *      and prefix-sum into per-range offsets;
  *   3. a range-partitioned window computes the local rank / running sum,
  *      and `local + offset` IS the exact global value.
  *
  * Outputs are bit-identical to the single-partition window (specs assert
  * parity), but no task ever holds more than ~1/nBuckets of the data.
  * Bucketing is a pure function of the order column's VALUE (count of
  * cutpoints strictly below it), so all ties land in one bucket and the
  * assignment is monotone in any (value, tiebreak) total order — the
  * property that makes local-rank + offset exact.
  */
object RangeOps {

  /** Approx-quantile cutpoints on a numeric column (distinct, sorted).
    * Relative error 1%: cutpoints only steer balance, never results.
    * nBuckets <= 1 yields no cutpoints (one bucket — the degenerate but
    * still-correct single-range form; approxQuantile NPEs on an empty
    * probability array otherwise).
    */
  def cutpoints(df: DataFrame, colName: String, nBuckets: Int): Array[Double] =
    if (nBuckets <= 1) Array.empty
    else df.stat
      .approxQuantile(colName,
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.01)
      .distinct.sorted

  /** Adds `bucketCol` = number of cutpoints strictly below the value — the
    * monotone range-bucket id. Equal values always share a bucket.
    */
  def withRangeBucket(df: DataFrame, colName: String, bucketCol: String,
      cuts: Array[Double]): DataFrame =
    df.withColumn(bucketCol,
      size(filter(typedLit(cuts.toSeq), c => c < col(colName).cast("double"))))

  /** Per-bucket exclusive prefix sums of `perBucket` totals: collects the
    * ≤ nBuckets aggregate rows and returns (bucket -> sum over LOWER
    * buckets, grand total).
    */
  private def offsets(perBucket: Array[(Int, Long)]): (Map[Int, Long], Long) = {
    var acc = 0L
    val m = perBucket.sortBy(_._1).map { case (b, t) =>
      val o = acc; acc += t; b -> o
    }.toMap
    (m, acc)
  }

  /** Exact global `row_number()` over the (valueCol, tieCol) total order
    * without a single-partition sort. Returns (df + rankCol, total rows).
    * `valueCol` must be numeric; `tieCol` must make the order total.
    */
  def globalRowNumber(df: DataFrame, valueCol: String, tieCol: String,
      rankCol: String, nBuckets: Int = 32): (DataFrame, Long) = {
    val b = withRangeBucket(df, valueCol, "__rb", cutpoints(df, valueCol, nBuckets))
    val (off, total) = offsets(
      b.groupBy(col("__rb")).agg(count(lit(1)).as("t")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)))
    val w = Window.partitionBy(col("__rb")).orderBy(col(valueCol), col(tieCol))
    val ranked = b
      .withColumn(rankCol,
        row_number().over(w).cast("long") + element_at(typedLit(off), col("__rb")))
      .drop("__rb")
    (ranked, total)
  }

  /** Arithmetic cutpoints for a column KNOWN uniform over [0, bound) —
    * e.g. the 32-bit md5-prefix hash ([[graft.functions.TextFns.hash32]],
    * bound 2^32). Replaces the approxQuantile JOB of [[cutpoints]] with
    * driver arithmetic: cutpoints only steer range-bucket BALANCE, never
    * results (see the header contract), so on a uniform hash the fixed
    * grid is as balanced as the measured one and costs zero passes
    * (guide §1.2: remove whole passes before tuning anything).
    */
  def uniformCutpoints(bound: Double, nBuckets: Int = 32): Array[Double] =
    if (nBuckets <= 1) Array.empty
    else (1 until nBuckets).map(i => bound * i / nBuckets).toArray

  /** FUSED exact global `row_number()` + running sum over ONE
    * (valueCol, tieCol) total order — the composition
    * `runningSum(globalRowNumber(df)._1, rankCol, sumCol, cumCol)`
    * collapsed to ONE offsets job and ONE window:
    *
    *   - the composed form pays 4 eager passes (quantile + count-offsets
    *     on valueCol, then quantile + sum-offsets on the rank column,
    *     the latter two RE-RUNNING the rank window);
    *   - bucketing is monotone in the (valueCol, tieCol) order, so the
    *     rank order IS the within-bucket (valueCol, tieCol) order: one
    *     groupBy collects per-bucket (count, sum) together, and one
    *     window yields both `local rank + count-offset` and
    *     `local running sum + sum-offset` — bit-identical outputs
    *     (running sums are exact under ANY bucketing; RangeOpsSpec pins
    *     parity against the composed form).
    *
    * Pass `cuts` (e.g. [[uniformCutpoints]] for a hash order column) to
    * skip the approxQuantile job too. Returns (df + rankCol + cumCol,
    * total row count).
    */
  def rankedRunningSum(df: DataFrame, valueCol: String, tieCol: String,
      sumCol: String, rankCol: String, cumCol: String,
      nBuckets: Int = 32, cuts: Option[Array[Double]] = None)
      : (DataFrame, Long) = {
    val cs = cuts.getOrElse(cutpoints(df, valueCol, nBuckets))
    val b = withRangeBucket(df, valueCol, "__rb", cs)
    val perBucket = b.groupBy(col("__rb"))
      .agg(count(lit(1)).as("c"), coalesce(sum(col(sumCol)), lit(0L)).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accC = 0L
    var accS = 0L
    val offC = Map.newBuilder[Int, Long]
    val offS = Map.newBuilder[Int, Long]
    perBucket.foreach { case (rb, c, sm) =>
      offC += rb -> accC; offS += rb -> accS
      accC += c; accS += sm
    }
    val w = Window.partitionBy(col("__rb")).orderBy(col(valueCol), col(tieCol))
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = b
      .withColumn(rankCol, row_number().over(w).cast("long") +
        element_at(typedLit(offC.result()), col("__rb")))
      .withColumn(cumCol, sum(col(sumCol)).over(wSum) +
        element_at(typedLit(offS.result()), col("__rb")))
      .drop("__rb")
    (out, accC)
  }

  /** Exact global running sum of `valueCol` over the total order of the
    * numeric UNIQUE key `orderCol` (two-pass distributed prefix sum):
    * per-range sums -> broadcast exclusive offsets -> range-local running
    * sum + offset.
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, nBuckets: Int = 32): DataFrame = {
    val b = withRangeBucket(df, orderCol, "__rb", cutpoints(df, orderCol, nBuckets))
    val (off, _) = offsets(
      b.groupBy(col("__rb")).agg(sum(col(valueCol)).as("t")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)))
    val w = Window.partitionBy(col("__rb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn(outCol,
        sum(col(valueCol)).over(w) + element_at(typedLit(off), col("__rb")))
      .drop("__rb")
  }

  /** Shared first pass of the per-group operators: per-(group, bucket)
    * exact counts (≤ |groups| × nBuckets rows collected) prefix-summed
    * into a broadcast offsets frame (__g, __rb2, __off, __tot). `partCol`
    * must be a STRING column (the driver-side collect reads it with
    * getString; a numeric group key throws ClassCastException — cast it
    * first).
    */
  private def groupBucketOffsets(b: DataFrame, partCol: String): DataFrame = {
    val spark = b.sparkSession
    import spark.implicits._
    val cnt = b.groupBy(col(partCol), col("__rb")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offRows = cnt.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val tot = rows.map(_._3).sum
      var acc = 0L
      rows.sortBy(_._2).map { case (_, rb, c) =>
        val o = acc; acc += c; (g, rb, o, tot)
      }
    }
    broadcast(offRows.toDF("__g", "__rb2", "__off", "__tot"))
  }

  /** Exact `percent_rank` / `cume_dist` per `partCol` group (a STRING
    * column) over numeric `valueCol`, safe under group skew (a group
    * holding half the corpus still spreads over all value-range buckets).
    * Offsets live in a broadcast (group, bucket) frame of
    * |groups| * nBuckets rows.
    */
  def relativeRanks(df: DataFrame, partCol: String, valueCol: String,
      pctCol: String, cumeCol: String, nBuckets: Int = 32): DataFrame = {
    val b = withRangeBucket(df, valueCol, "__rb", cutpoints(df, valueCol, nBuckets))
    val offDf = groupBucketOffsets(b, partCol)
    val wRank = Window.partitionBy(col(partCol), col("__rb")).orderBy(col(valueCol))
    val wLe = wRank.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE group equality: a null partition key is its own group (the
    // Window.partitionBy semantics this operator replaces — a plain
    // column-equality join silently dropped null-group rows)
    b.join(offDf, col(partCol) <=> col("__g") && col("__rb") === col("__rb2"))
      .drop("__g", "__rb2")
      .withColumn("__grank", col("__off") + rank().over(wRank))
      .withColumn("__nle", col("__off") + count(lit(1)).over(wLe))
      .withColumn(pctCol,
        when(col("__tot") === 1, lit(0.0))
          .otherwise((col("__grank") - 1).cast("double") /
            (col("__tot") - 1).cast("double")))
      .withColumn(cumeCol, col("__nle").cast("double") / col("__tot").cast("double"))
      .drop("__rb", "__off", "__tot", "__grank", "__nle")
  }

  /** Exact per-group `row_number()` + group total over numeric `valueCol`
    * without a fact-sized single-task sort — the replacement for the
    * few-groups `row_number() OVER (PARTITION BY g ORDER BY v)` shape,
    * where each of a handful of partitions funnels a fact-sized sort
    * through one task. Two-pass like [[relativeRanks]]: value-range
    * buckets spread every group over all buckets, per-(group, bucket)
    * counts (≤ |groups| × nBuckets rows) prefix-sum into offsets, and the
    * (group, bucket)-partitioned local row number + offset is the exact
    * in-group global row number. `tieCols` break ties within `valueCol`
    * (pass the columns that make the order total — or none when
    * downstream only reads `valueCol` at a picked rank, where any tie
    * order yields the same value). `partCol` must be a STRING column
    * (see [[groupBucketOffsets]]). Returns df + `rankCol` (1-based,
    * long) + `totCol` (group size, long).
    */
  def groupedRowNumber(df: DataFrame, partCol: String, valueCol: String,
      tieCols: Seq[String], rankCol: String, totCol: String,
      nBuckets: Int = 32): DataFrame = {
    val b = withRangeBucket(df, valueCol, "__rb", cutpoints(df, valueCol, nBuckets))
    val offDf = groupBucketOffsets(b, partCol)
    val w = Window.partitionBy(col(partCol), col("__rb"))
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    // null-SAFE group equality, as in relativeRanks
    b.join(offDf, col(partCol) <=> col("__g") && col("__rb") === col("__rb2"))
      .drop("__g", "__rb2")
      .withColumn(rankCol, col("__off") + row_number().over(w))
      .withColumn(totCol, col("__tot"))
      .drop("__rb", "__off", "__tot")
  }

  /** Exact per-group rank arithmetic over a LOW-CARDINALITY value column
    * without touching fact rows twice: one fact pass collapses to
    * (group, value, cnt) — bounded by |groups| × |distinct values|, not
    * by row count — then `cum` (rows with value ≤ this one) and `n`
    * (group total) come from windows over that tiny rollup. The value at
    * in-group rank k is the smallest value with cum ≥ k, so rank-picked
    * medians/percentiles reduce to `min(when(cum >= target, value))`.
    * Ties need no tiebreak: all rows of one value are one rollup row.
    * Use [[groupedRowNumber]] when the value column is high-cardinality
    * (a rollup would not shrink the data).
    */
  def groupedValueCounts(df: DataFrame, partCol: String, valueCol: String): DataFrame = {
    val cnts = df.groupBy(col(partCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(partCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(partCol))))
  }

  /** Exact `ntile(n)` bucket from a global row number and total count —
    * the standard SQL arithmetic (first `total % n` tiles get the extra
    * row), applied to [[globalRowNumber]]'s output instead of a
    * single-partition window.
    */
  def ntileFromRank(rankCol: String, total: Long, n: Int): org.apache.spark.sql.Column = {
    val q = total / n
    val r = total % n
    val qa = math.max(q, 1L) // q = 0 only when total < n; then r-branch covers all rows
    if (r == 0)
      expr(s"cast(($rankCol - 1) div $qa + 1 as int)")
    else {
      val thresh = r * (q + 1)
      expr(s"cast(case when $rankCol <= $thresh then ($rankCol - 1) div ${q + 1} " +
        s"else $r + ($rankCol - 1 - $thresh) div $qa end + 1 as int)")
    }
  }
}
