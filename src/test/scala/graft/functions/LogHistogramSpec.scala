package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the log-histogram bucket arithmetic over a wide
  * random domain (the oracle corpora only exercise n_chars ≈ 50–550):
  * bucket ids must be monotone in the value, every value must sit inside
  * its bucket's [lower, upper] derived from the representative formula,
  * and the midpoint representative must honor the gamma = 2^(1/8)
  * worst-case relative error (1/16) everywhere up to 2^40.
  */
class LogHistogramSpec extends SparkSpec {

  test("bid is monotone, rep stays in-bucket, error bound holds to 2^40") {
    val rnd = new scala.util.Random(42)
    val ws = (Seq(1L, 2L, 7L, 8L, 15L, 16L, 17L, 31L, 32L, 1L << 20,
      (1L << 40) - 1, 1L << 40) ++
      (1 to 4000).map(_ => 1L + (math.abs(rnd.nextLong()) % (1L << 40))))
      .distinct.sorted
    import spark.implicits._
    val rows = ws.toDF("w")
      .withColumn("bid", LogHistogram.bid("w"))
      .withColumn("rep", LogHistogram.rep("bid"))
      .orderBy("w")
      .select(col("w"), col("bid"), col("rep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    rows.sliding(2).foreach {
      case Array((w1, b1, _), (w2, b2, _)) =>
        assert(b1 <= b2, s"bid not monotone: bid($w1)=$b1 > bid($w2)=$b2")
      case _ =>
    }
    for ((w, bid, rep) <- rows) {
      if (bid < 16) assert(rep == w, s"singleton bucket $bid: rep $rep != $w")
      else {
        val shift = (bid / 8 - 1).toInt
        val m = bid % 8
        val lower = (8 + m) << shift
        val upper = ((9 + m) << shift) - 1
        assert(w >= lower && w <= upper,
          s"w=$w outside bucket $bid bounds [$lower, $upper]")
        assert(rep == (lower + upper) / 2, s"rep $rep not the midpoint")
        // relative error of the midpoint vs any member of the bucket
        val err = math.max(rep - lower, upper - rep).toDouble / lower
        assert(err <= 1.0 / 16 + 1e-12,
          s"bucket $bid: worst rel err $err exceeds 1/16")
      }
    }
  }
}
