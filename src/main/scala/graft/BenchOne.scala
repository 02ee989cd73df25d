package graft

import org.apache.spark.sql.SparkSession

/** Times a single registered query in isolation (min-of-N, noop sink) —
  * the per-query iteration loop Bench is too coarse for.
  * Usage: runMain graft.BenchOne <queryName> [sfDir] [repeats]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.BenchOne <queryName> [sfDir] [repeats]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    val samples = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"BENCHONE $name min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    spark.stop()
  }
}
