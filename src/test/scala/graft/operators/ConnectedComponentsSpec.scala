package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Pins the star-contraction CC operator: correctness against a driver-side
  * union-find oracle, and the O(log n) round bound on the adversarial
  * chain topology that motivated replacing min-label propagation (which
  * needs O(diameter) = O(n) rounds on the same input).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("u", "v")

  /** Driver-side union-find for the expected labeling (min id per comp). */
  private def oracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain topology: path of 1024 nodes converges in O(log n) rounds") {
    // Worst case for label propagation: one component whose diameter equals
    // its size. Node ids shuffled so the min is in the middle of the path —
    // sequential ids let propagation cheat (every hop moves the min label).
    val n = 1024
    val perm = new Random(7).shuffle((0L until n.toLong).toVector)
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    val (labels, rounds) = ConnectedComponents.run(edgesDf(pairs))
    val got = labelsOf(labels)
    assert(got.size === n)
    assert(got.values.toSet === Set(0L), "single component labeled by its min")
    // ⌈log2 1024⌉ = 10; +2 covers the final fixpoint-confirming round and
    // the star-forest normalization round. Label propagation would need
    // ~n/2 rounds here — this assertion is the operator's scale contract.
    val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 2
    assert(rounds <= bound, s"chain of $n took $rounds rounds (bound $bound)")
  }

  test("bucket-clique star edges label like the full clique") {
    // The DedupOps input shape: per-bucket star edges (min → member). Two
    // buckets overlapping in one doc chain into a single component; one
    // disjoint bucket stays separate.
    val pairs = Seq(
      (10L, 20L), (10L, 30L),           // bucket A {10,20,30}
      (30L, 40L), (30L, 50L),           // bucket B {30,40,50} — overlaps at 30
      (70L, 80L), (70L, 90L))           // bucket C {70,80,90} — disjoint
    val (labels, _) = ConnectedComponents.run(edgesDf(pairs))
    val got = labelsOf(labels)
    assert(got === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 10L, 70L -> 70L, 80L -> 70L, 90L -> 70L))
  }

  test("random graphs match a union-find oracle") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val pairs = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val (labels, rounds) = ConnectedComponents.run(edgesDf(pairs))
      assert(labelsOf(labels) === oracle(pairs), s"trial $trial")
      assert(rounds < 25, s"trial $trial failed to converge")
    }
  }

  test("an exhausted round budget fails loudly, never returns partial labels") {
    val pairs = (0 until 63).map(i => (i.toLong, i.toLong + 1))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(edgesDf(pairs), maxRounds = 1)
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("self-loops and duplicate edges are tolerated") {
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))
    val (labels, _) = ConnectedComponents.run(edgesDf(pairs))
    val got = labelsOf(labels)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("superseded round frames release their blocks IN-LOOP: the " +
    "persistent-RDD count grows by at most the final round frame, " +
    "however many rounds run (round-13 storage-bound contract — " +
    "without the release, every round lingers until driver GC)") {
    val n = 600
    val perm = new Random(11).shuffle((0L until n.toLong).toVector)
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, rounds) = ConnectedComponents.run(edgesDf(pairs))
    labels.collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(rounds >= 3, s"fixture converged too fast ($rounds rounds) " +
      "to exercise the in-loop release")
    assert(after - before <= 2,
      s"CC left ${after - before} persistent frames behind over " +
        s"$rounds rounds — the in-loop release regressed")
  }
}
