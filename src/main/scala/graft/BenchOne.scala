package graft

import org.apache.spark.sql.SparkSession

/** Times one or more registered queries in isolation (min-of-N, noop sink) —
  * the per-query iteration loop Bench is too coarse for. Multiple names run
  * sequentially in ONE session, which reproduces Bench's shared-session
  * conditions: `BenchOne q100_semantic_dedup q101_grouping_sets` answers
  * "does q100 contaminate q101's samples?".
  * Usage: runMain graft.BenchOne <queryName>... [sfDir] [repeats]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.BenchOne <queryName>... [sfDir] [repeats]")
      sys.exit(2)
    }
    val known = SparkEntry.queries.keySet
    val names = args.filter(known).toSeq
    val rest = args.filterNot(known)
    val badNames = rest.filterNot(a => a.contains("/") || a.forall(_.isDigit))
    if (names.isEmpty || badNames.nonEmpty) {
      System.err.println(s"no such quer${if (names.isEmpty) "ies: " + args.mkString(", ") else "y: " + badNames.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = rest.find(_.contains("/")).getOrElse("/root/testdata/sf0.1")
    val repeats = rest.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
