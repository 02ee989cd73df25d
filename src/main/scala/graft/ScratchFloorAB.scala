package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TEMPORARY measurement scratch (deleted before round end): same-session
  * A/B of the grams3 build with and without the Tables.parallel floor —
  * alternating reps cancel ambient co-tenant load, which the isolated
  * cold-session numbers cannot.
  * Usage: runMain graft.ScratchFloorAB <dir> [reps]
  */
object ScratchFloorAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFns.{hash32, tokens, wordNgrams}

    def pipeline(entry: DataFrame): DataFrame = entry
      .select(col("doc_id"),
        explode(array_distinct(wordNgrams(tokens(col("text")), 3))).as("ng"))
      .select(col("doc_id"), hash32(col("ng")).as("hv"),
        xxhash64(col("ng")).as("ng64"))

    val mode = args.lift(2).getOrElse("staged")
    if (mode == "staged") {
      // FIRST job of the session: the staged floored build, nothing before
      val t0 = System.nanoTime()
      Staging.stage(spark, dir, "scratch_grams3")(
        pipeline(Tables.parallel(spark, dir, "documents"))).count()
      println(f"first_job_staged secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    } else {
      // FIRST job of the session: the real q57 chain
      val t1 = System.nanoTime()
      SparkEntry.queries("q57_neardup_cluster")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"first_job_q57 secs=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    Staging.buildTimes(spark).toVector
      .foreach { case (n, v) => println(f"staging:$n $v%.3f") }
    spark.stop()
  }
}
