package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All graft queries take `(SparkSession, sfDir)` and read through here so
  * the same code runs at any scale factor. At cluster scale the same
  * `spark.read.parquet(dir)` distributes across executors; nothing here is
  * local-mode-specific.
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * matching DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncation so oracle
  * comparisons agree.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Set at SparkSession construction in the library mains; repeated here
    // (idempotent, runtime-settable) as a fallback for externally created
    // sessions (tests, user shells) — without it the events read fails.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
