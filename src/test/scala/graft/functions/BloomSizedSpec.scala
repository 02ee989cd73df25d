package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sized Bloom geometry (BloomSizing over hash60): the directive it
  * answers is "the legacy 4096-bit/32-bit-hash filter saturates to fp≈1 on
  * a real (100k+-gram) held-out set — make bits/probes parameters over a
  * hash wide enough for disjoint windows, and show measured fp under a
  * target at a 10× held-out set". Three legs: geometry validation, the
  * no-false-negative guarantee plus measured-vs-formula fp on a synthetic
  * 10× member set, and the registered q132's in-row fp_ppm under target on
  * the real corpus (its held-out premise doc_id<100 is 10× q130's).
  */
class BloomSizedSpec extends SparkSpec {

  private val sz = BloomSizing(bits = 131072, probes = 3)

  test("sizing rejects geometries the 60-bit hash cannot hold") {
    intercept[IllegalArgumentException](BloomSizing(bits = 100000, probes = 3))
    intercept[IllegalArgumentException](BloomSizing(bits = 1 << 21, probes = 3))
    intercept[IllegalArgumentException](BloomSizing(bits = 4096, probes = 6))
    assert(BloomSizing(bits = 4096, probes = 5).offsets == Seq(0, 12, 24, 36, 48))
    assert(sz.window == 17 && sz.offsets == Seq(0, 17, 34))
  }

  test("no false negatives; measured fp on a 10x member set tracks the independent-probe formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def h60(): Long = rnd.nextLong() & ((1L << 60) - 1)
    // 5 000 members ≈ 10× q130's ~500-gram held-out premise
    val members = Vector.fill(5000)(h60()).distinct
    val memberSet = members.toSet
    val words = BloomFns.buildSized(members, sz)
    val nonMembers = Vector.fill(100000)(h60()).distinct.filterNot(memberSet)

    val res = (members.map(_ -> 1) ++ nonMembers.map(_ -> 0))
      .toDF("h", "member")
      .withColumn("hit", BloomFns.mightContainSized(words, col("h"), sz))
      .groupBy("member").agg(count(lit(1)).as("n"),
        sum("hit").cast("long").as("hits"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // members: every probe bit is set — false negatives impossible
    assert(res(1)._1 == res(1)._2, s"false negatives: ${res(1)}")

    // non-members: with DISJOINT probe windows the k-independent formula
    // (1 - e^(-kn/m))^k finally applies (the legacy overlapping geometry
    // under-predicted); 3x headroom covers binomial variance on ~100k
    // probes (expected ≈ 126 hits, σ ≈ 11)
    val (n0, fp) = res(0)
    val fill = 1.0 - math.exp(-sz.probes.toDouble * members.size / sz.bits)
    val formula = math.pow(fill, sz.probes)
    val measured = fp.toDouble / n0
    assert(measured <= 3 * formula,
      f"measured fp $measured%.6f vs independent-probe formula $formula%.6f")
    assert(measured > 0.0, "a 26x-loaded filter with zero false positives means the probe is broken")
  }

  test("q132's in-row measured fp_ppm is under target on the real 10x held-out corpus") {
    val row = graft.SparkEntry.queries("q132_bloom_decon_sized")(
      spark, "/root/testdata/sf0.01").collect()(0)
    val (nProbed, fpPpm) = (row.getLong(0), row.getLong(3))
    assert(nProbed > 10000L, s"premise: a real probed corpus, got $nProbed")
    // formula at n≈4.8k grams, m=131072, k=3 predicts ≈ 1.1e-3; target
    // 10 000 ppm is the sizing budget with an order-of-magnitude margin
    assert(fpPpm < 10000L, s"fp_ppm $fpPpm exceeds the 10k sizing target")
  }
}
