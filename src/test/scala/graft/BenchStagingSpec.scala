package graft

/** Pins the staging-cost contract (round-6 VERDICT directive): a staged
  * frame's build time is recorded as its own entry by [[Staging]], and no
  * consumer query's reported MIN ever includes it — so per-query bench
  * numbers are marginal cost and order-independent (whichever consumer
  * runs first pays the build in its first sample only, which min-of-N
  * discards; the cost itself is visible in the staging entries).
  */
class BenchStagingSpec extends SparkSpec {

  test("staged build cost lands in Staging.buildTimes, never in a " +
    "consumer's min — regardless of which consumer runs first") {
    import spark.implicits._
    var builds = 0
    def consumer(): Unit = {
      val df = Staging.stage(spark, "/tmp/bench-staging-spec", "slow_frame") {
        builds += 1
        Thread.sleep(200) // the "expensive" build
        Seq(1, 2, 3).toDF("x")
      }
      assert(df.count() == 3)
    }
    val (ts, errs) = Bench.measure(Seq(
      "first_consumer" -> (() => consumer()),
      "second_consumer" -> (() => consumer())), repeats = 3)
    assert(errs.isEmpty)
    assert(builds == 1, "staged frame must build exactly once")
    val built = Staging.buildTimes(spark).get(("/tmp/bench-staging-spec", "slow_frame"))
    assert(built.exists(_ >= 0.2), s"build time entry missing or short: $built")
    // the min of EVERY consumer — including the one that triggered the
    // build — excludes the build (it rode one discarded sample only)
    ts.toMap.foreach { case (name, min) =>
      assert(min < 0.2, s"$name's min ($min s) absorbed the staging build")
    }
  }

  test("nested staged builds are billed marginally: a parent frame's " +
    "recorded time excludes its children's, so entries are additive") {
    import spark.implicits._
    val dir = "/tmp/bench-staging-additive"
    // child: ~300 ms sleep; grandchild: ~200 ms; parent's own: ~100 ms.
    // (Each build also pays real persist+count overhead, so the spec
    // asserts RELATIVE properties — additivity vs measured wall time —
    // not absolute bounds.) Round-7's accounting billed child+grandchild
    // to every ancestor, so the entries summed to ~2x wall time.
    def grandchild() = Staging.stage(spark, dir, "grandchild") {
      Thread.sleep(200); Seq(1).toDF("x")
    }
    def child() = Staging.stage(spark, dir, "child") {
      grandchild(); Thread.sleep(300); Seq(2).toDF("x")
    }
    val t0 = System.nanoTime()
    Staging.stage(spark, dir, "parent") {
      child()
      grandchild() // nested HIT: charges nothing
      Thread.sleep(100); Seq(3).toDF("x")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val t = Staging.buildTimes(spark).collect { case ((d, n), v) if d == dir => n -> v }
    // each entry covers at least its own sleep, and no entry absorbed a
    // descendant's sleep on top of its own
    assert(t("grandchild") >= 0.2, t.toString)
    assert(t("child") >= 0.3, t.toString)
    assert(t("parent") >= 0.1, t.toString)
    // the additivity contract, asserted one-sidedly: the sum of marginal
    // entries can never EXCEED the outer wall time (+20 ms clock skew) —
    // ancestor double-billing would make it ~2x wall. The other side
    // (wall − sum) is un-clocked bookkeeping between builds, which a
    // loaded box can stretch arbitrarily (GC pause, co-tenant stall), so
    // a tight lower bound would flake; double-billing is the failure
    // this spec exists to catch.
    val sum = t.values.sum
    assert(sum <= wall + 0.02,
      s"entries double-billed: sum=$sum > wall=$wall $t")
    // and each entry is bounded by its own sleep + the whole overhead
    // budget, so no entry silently absorbed a descendant's sleep
    assert(t("parent") < 0.1 + (wall - 0.6),
      s"parent absorbed a descendant's build: $t wall=$wall")
  }

  test("render emits staging entries as a first-class JSON object") {
    val (stdout, file) = Bench.render(
      Vector(("q01_a", 1.0)), Map.empty, "sf",
      staging = Vector(("mh_pairs", 7.5), ("pr_edges", 0.25)))
    for (line <- Seq(stdout, file)) {
      assert(line.contains("\"staging\":{\"mh_pairs\":7.5") &&
        line.contains("\"pr_edges\":0.25"), line)
    }
    // absent staging still renders an empty object, keeping parsers happy
    assert(Bench.render(Vector(("q01_a", 1.0)), Map.empty, "sf")._2
      .contains("\"staging\":{}"))
  }
}
