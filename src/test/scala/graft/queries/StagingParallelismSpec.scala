package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the staging cold-path parallelism contract (round-11 VERDICT
  * directive #1): the driver testdata is single-row-group parquet, which a
  * scan cannot split — so without Tables.parallel every staged build
  * (gram explode, envelope parse, Lloyd lattice) serialized its expensive
  * per-row work on ONE core (x100 cold grams3: 182 s of single-thread
  * work on a 32-core box). The floor must engage on such inputs, be a
  * passthrough on production multi-split layouts, and never change
  * results.
  */
class StagingParallelismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def floor = spark.sparkContext.defaultParallelism

  test("single-row-group scan engages the floor; staged gram frame is " +
    "multi-task") {
    // the raw scan CANNOT split the one row group: one partition
    val plain = graft.Tables(spark, sfDir, "documents")
    assert(plain.rdd.getNumPartitions == 1,
      s"fixture drifted: expected a single-row-group documents.parquet, " +
        s"got ${plain.rdd.getNumPartitions} scan partitions")
    // the staged-build entry scan distributes to the parallelism floor
    val par = graft.Tables.parallel(spark, sfDir, "documents")
    assert(par.rdd.getNumPartitions == floor)
    // and the STAGED frame built from it inherits multi-task execution —
    // this is the property the cold-build measurement rides on
    val grams = Grams.hashed(spark, sfDir, 5)
    assert(grams.rdd.getNumPartitions >= floor,
      s"staged grams5 frame is ${grams.rdd.getNumPartitions}-partition — " +
        "the cold build would serialize")
    // identical content to the unfloored pipeline (order-insensitive set)
    val direct = plain.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.wordNgrams(
          graft.functions.TextFns.tokens(col("text")), 5))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("ng"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val staged = grams.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(staged == direct)
  }

  test("size-gated floor: below minBytes the plain scan stays (a tiny " +
    "corpus pays the round-robin more than moderate per-row work saves); " +
    "above it the floor engages; passthrough contract unchanged") {
    val small = graft.Tables.parallel(spark, sfDir, "documents",
      minBytes = Long.MaxValue)
    assert(small.rdd.getNumPartitions == 1,
      "gate must skip the floor below minBytes")
    val big = graft.Tables.parallel(spark, sfDir, "documents", minBytes = 1L)
    assert(big.rdd.getNumPartitions == floor,
      "gate must engage the floor at/above minBytes")
    // identical content either way (order-insensitive set)
    assert(small.collect().map(_.toString).sorted.toSeq ==
      big.collect().map(_.toString).sorted.toSeq)
  }

  test("multi-split input passes through: no repartition exchange added " +
    "at production layouts") {
    // a many-file layout already yields >= floor scan partitions — the
    // floor must NOT add a shuffle there (at 100 TB that shuffle would be
    // the whole corpus for nothing)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_multisplit_").toString
    graft.Tables(spark, sfDir, "documents")
      .repartition(floor * 2)
      .write.parquet(s"$dir/documents.parquet")
    // pin the file bin-packing arithmetic: with openCost = maxPartition,
    // a second file never fits a bin, so every tiny file is its own scan
    // partition regardless of Spark's packing defaults or core count
    // (round-12 ADVICE: the unpinned form depended on openCostInBytes /
    // maxPartitionBytes defaults and could pack below the floor)
    withConfs(
      "spark.sql.files.maxPartitionBytes" -> "134217728",
      "spark.sql.files.openCostInBytes" -> "134217728") {
      val par = graft.Tables.parallel(spark, dir, "documents")
      assert(par.rdd.getNumPartitions >= floor)
      val plan = par.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"passthrough added an exchange on a multi-split layout:\n$plan")
    }
  }
}
