package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** The q100 pairwork guard (round-10 VERDICT directive #5): the fixed-K
  * SemDeDup member is deliberately kept as the family's textbook-fidelity
  * baseline, but its within-cluster all-pairs join is O(n_c²) — a
  * collapsed clustering (one viral meme, boilerplate pages) detonates it.
  * The guard estimates Σ n_c·(n_c−1)/2 from the assignment BEFORE the
  * pair join runs and, above the documented 64-pairs-per-doc threshold,
  * warns (default) or fails (`graft.semdedup.pairworkGuard=fail`),
  * pointing users at q131/q133. This spec triggers it on a collapse
  * fixture and proves a balanced corpus passes untouched.
  */
class PairworkGuardSpec extends SparkSpec {

  private val dim = 64
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(i => ((seed * 31 + i * 7) % 13 - 6) / 6.0f)

  /** 400 vectors: 16 distinct seeds (the fixed-K centroids) + 384 copies
    * of one vector — every copy lands in one cluster, so pairwork is
    * ~384²/2 ≈ 74k over 400 docs (~184/doc, far past the 64 threshold).
    */
  private lazy val collapseDir: String = {
    val dir = Files.createTempDirectory("graft_collapse_emb_").toString
    import spark.implicits._
    val rows: Seq[(Long, Array[Float])] =
      (0L to 15L).map(i => (i, vec(i.toInt))) ++
        (16L to 399L).map(i => (i, vec(3)))
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  // Conf-mutating legs run on an ISOLATED session (spark.newSession():
  // shared SparkContext, private SQLConf) — the fix the SkewOpsSpec
  // sequential-execution note prescribes, applied here from the start so
  // enabling suite parallelism can never leak fail-mode into another
  // suite's q100 run. Staging keys on the session, so the isolated
  // session builds its own (tiny) staged assignment.
  private def runQ100(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.SparkEntry.queries("q100_semantic_dedup")(s, dir)
      .collect()

  test("fail mode stops the quadratic member on the collapse fixture, " +
    "pointing at the scale-path members") {
    val s = spark.newSession()
    s.conf.set("graft.semdedup.pairworkGuard", "fail")
    val e = intercept[IllegalStateException] { runQ100(s, collapseDir) }
    assert(e.getMessage.contains("q131"), e.getMessage)
    assert(e.getMessage.contains("q133"), e.getMessage)
    assert(e.getMessage.contains("per doc"), e.getMessage)
  }

  test("default mode only warns: the collapse fixture still computes") {
    // default = warn: the guard must never change results or crash the
    // textbook member — it makes the cost visible and names the exits
    runQ100(spark, collapseDir)
  }

  test("a balanced corpus passes the guard even in fail mode") {
    // sf0.001: 500 embeddings over 16 clusters ≈ 15.6 pairs/doc — well
    // under the threshold; the guard must not fire on healthy shapes
    val s = spark.newSession()
    s.conf.set("graft.semdedup.pairworkGuard", "fail")
    runQ100(s, "/root/testdata/sf0.001")
  }

  test("the threshold is conf-tunable and off disables the estimate") {
    // a deliberately tiny threshold trips even the balanced corpus...
    val s = spark.newSession()
    s.conf.set("graft.semdedup.pairworkGuard", "fail")
    s.conf.set("graft.semdedup.maxPairworkPerDoc", "1")
    intercept[IllegalStateException] { runQ100(s, "/root/testdata/sf0.001") }
    // ...and off bypasses the guard entirely, threshold notwithstanding
    s.conf.set("graft.semdedup.pairworkGuard", "off")
    runQ100(s, "/root/testdata/sf0.001")
  }
}
