package graft

import org.apache.spark.sql.SparkSession

/** Times one or more registered queries in isolation (min-of-N, noop sink) —
  * the per-query iteration loop Bench is too coarse for. Multiple names run
  * sequentially in ONE session, which reproduces Bench's shared-session
  * conditions: `BenchOne q100_semantic_dedup q101_grouping_sets` answers
  * "does q100 contaminate q101's samples?".
  * Usage: runMain graft.BenchOne <queryName>... [-d sfDir] [-n repeats]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val usage = "usage: runMain graft.BenchOne <queryName>... [-d sfDir] [-n repeats]"
    if (args.isEmpty) {
      System.err.println(usage)
      sys.exit(2)
    }
    // explicit flags, not classify-by-shape: a misspelled query name must
    // be an error, never silently consumed as a parameter
    var sfDir = "/root/testdata/sf0.1"
    var repeats = 3
    var stages = false
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-stages" => stages = true; i += 1
        case "-d" if i + 1 < args.length => sfDir = args(i + 1); i += 2
        case "-n" if i + 1 < args.length =>
          repeats = args(i + 1).toIntOption.filter(_ >= 1).getOrElse {
            System.err.println(s"-n needs a positive integer, got: ${args(i + 1)}\n$usage")
            sys.exit(2)
          }
          i += 2
        case "-d" | "-n" =>
          System.err.println(s"${args(i)} needs a value\n$usage"); sys.exit(2)
        case n => names += n; i += 1
      }
    }
    val known = SparkEntry.queries.keySet
    val bad = names.filterNot(known)
    if (names.isEmpty || bad.nonEmpty) {
      System.err.println(
        if (names.isEmpty) usage
        else s"no such quer${if (bad.size > 1) "ies" else "y"}: ${bad.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true") // round-20: AQE sizes CACHED-plan output by bytes, so every
        // session-staged frame gets a data-derived partition count (tiny
        // graph/pair frames collapse to ~1 partition instead of 2x cpus;
        // corpus-scale frames keep their width) — scale-adaptive by
        // construction, guide SS2.2/SS2.6
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail-loud pairwork guard, like Bench/ScalingBench (round-11
    // directive #6) — BenchOne reproduces Bench's session conditions, so
    // it must reproduce its guard mode too; same env override
    spark.conf.set("graft.semdedup.pairworkGuard",
      sys.env.getOrElse("SPARK_GRAFT_PAIRWORK_GUARD", "fail"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
      // -stages: time each composed sub-plan of a decomposable query
      // separately (currently q120) — variance attribution, not a bench
      // number (the sub-plans recompute shared subtrees, so their sum
      // exceeds the one-plan time by design)
      if (stages && name == "q120_recipe_funnel") {
        graft.queries.DedupOps.recipeFunnelStages(spark, sfDir)
          .foreach { case (st, df) =>
            val ss = (1 to repeats).map { _ =>
              val t0 = System.nanoTime()
              df.write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            println(f"BENCHONE stage:$st min=${ss.min}%.3f " +
              f"samples=${ss.map(x => f"$x%.3f").mkString(",")}")
          }
      }
    }
    // staged frames this run built (marginal seconds, same accounting as
    // Bench) — so isolating a consumer query also isolates its builds
    Staging.buildTimes(spark).toVector
      .collect { case ((d, n), v) if d == sfDir => n -> v }
      .sortBy(_._1)
      .foreach { case (n, v) => println(f"BENCHONE staging:$n $v%.3f") }
    spark.stop()
  }
}
