package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (normalized-content hash), n-gram Jaccard similarity join,
  * MinHash-LSH banding, and SimHash signatures.
  *
  * Scale design (100 TB): nothing here is all-pairs. Exact dedup is one
  * hash-groupBy. The Jaccard join blocks on shared n-grams with a
  * document-frequency cap so hot shingles can't produce O(df²) pair
  * explosions. MinHash reduces each document to an 8-value signature
  * (groupBy doc), then candidates come from equality joins on banded
  * signature pairs — the classic LSH shape that scales linearly in
  * collisions, not quadratically in corpus size. SimHash is one aggregation
  * to a 32-bit signature per doc.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Session-staged distinct (doc_id, 3-gram) set carrying BOTH hash forms
    * the family needs — hv (md5-prefix, the MinHash permutation input the
    * oracle mirrors) and ng64 (xxhash64, q35's shuffle key). One tokenize +
    * explode serves q35 and the whole MinHash/LSH family (q36/q57/q65/
    * q78/q95/q97), the materialize-once DWD discipline of [[graft.Staging]].
    *
    * Measurement history: with 40-char STRING grams, persisting measured
    * SLOWER end-to-end (cache pressure outweighed the recompute). Re-run
    * in round 6 with 8-byte hashed grams (24 B/row, ~10x smaller), min-of-5
    * at sf0.1: q35 2.49->1.49 s, and the same flip for the CorpusOps gram
    * frames (q63 1.60->0.44, q96 1.82->0.47, q119 2.10->0.69), no
    * regression in the MinHash family — the cache-pressure argument
    * reversed, so staged it is. At cluster scale the same role is a
    * written staging table.
    * Distinctness is PER DOC, enforced with array_distinct inside the row
    * before exploding — a global .distinct() here cost a full shuffle for
    * the identical result.
    */
  private def ngramSet(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, dir, "grams3") {
      // parallelism-floored entry scan (Tables.parallel): the build's
      // tokenize+explode must distribute even off a single-row-group file
      Tables.parallel(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(wordNgrams(tokens(col("text")), 3))).as("ng"))
        .select(col("doc_id"), hash32(col("ng")).as("hv"),
          xxhash64(col("ng")).as("ng64"))
    }

  private val ngramCte = """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS ng
          FROM tk, UNNEST(generate_series(1, len(t) - 2)) AS s(i))"""

  /** df-capped blocked Jaccard pairs `(i, j, jaccard >= threshold)` —
    * q35's pipeline, SHARED with q124's truth side so the recall audit can
    * never drift to a different blocking scheme than the operator it
    * audits. Shape notes:
    * - 8-byte shingle hashes through the shuffle, not ~40-char strings —
    *   set cardinalities (and so Jaccard) unchanged, ~5x less volume.
    * - df-cap FIRST (windowed count, no collection), so a hot shingle can
    *   never materialize an unbounded list or df² pairs.
    * - Per-doc capped sizes as a SEPARATE aggregate joined onto the pair
    *   set at the end. History: when the gram explode was recomputed per
    *   reference, carrying sz through the pair path as a second window was
    *   1.5x faster; with the gram frame session-staged the trade flipped
    *   (round 6, min-of-5 at sf0.1: 1.49 -> 1.12 s) — the corpus-sized
    *   path shuffles once (by ng; the window's exchange is REUSED by the
    *   groupBy), the doc_id shuffle carries only (doc_id, sz), and the
    *   pair set it joins is near-dup-sized.
    * - In-group pair generation (bounded by the cap) as one expression —
    *   measured ~25% faster than the equivalent self-join.
    */
  private[graft] def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    // The family uses two thresholds (q35 at 0.8, q124's truth at 0.5);
    // the pipeline below is identical for both, so the pair frame is
    // session-staged ONCE at the 0.5 floor and each consumer filters —
    // the mh_pairs discipline (round-19 optimization): the pair set is
    // near-dup-sized while its producing pipeline (window df-cap +
    // in-group pair expansion + two size joins over the corpus-sized
    // staged gram frame) is the dedup family's most expensive, and a
    // recall AUDIT (q124) re-running the exact truth pipeline its
    // operator (q35) already ran is precisely the recompute a 100 TB
    // curation run cannot afford. `filter(jaccard >= t)` over the staged
    // ≥0.5 frame is bit-identical to computing at t directly for any
    // t >= 0.5 (same jaccard values, same comparison).
    require(threshold >= JcPairsFloor,
      s"jaccardPairs: threshold $threshold below the staged floor " +
        s"$JcPairsFloor — widen JcPairsFloor (and re-check consumers)")
    graft.Staging.stage(s, dir, "jc_pairs") {
      val g = ngramSet(s, dir)
        .select(col("doc_id"), col("ng64").as("ng"))
      val wN = Window.partitionBy(col("ng"))
      val capped = g
        .withColumn("df", count(lit(1)).over(wN))
        .filter(col("df") <= 100)
      val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      capped
        .groupBy("ng")
        .agg(collect_list(col("doc_id")).as("ids"))
        .select(explode(expr(
          "flatten(transform(ids, (x, ix) -> " +
            "filter(transform(ids, (y, iy) -> " +
            "IF(x < y, struct(x AS i, y AS j), NULL)), p -> p IS NOT NULL)))"))
          .as("p"))
        .select(col("p.i"), col("p.j"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("i"), col("sz").as("si")), "i")
        .join(sizes.select(col("doc_id").as("j"), col("sz").as("sj")), "j")
        .withColumn("jaccard",
          col("common").cast("double") / (col("si") + col("sj") - col("common")))
        .filter(col("jaccard") >= JcPairsFloor)
        .select(col("i"), col("j"), col("jaccard"))
    }.filter(col("jaccard") >= threshold)
  }

  /** The smallest threshold any jaccardPairs consumer uses — the staged
    * frame's cut. Consumers: q35 (0.8), q124's truth side (0.5).
    */
  private val JcPairsFloor = 0.5

  /** The (doc_id, band, bkey) LSH band assignments behind q36/q57: 8
    * permutation mins per doc folded into 4 bands of 2. Two equivalent
    * renditions exist (output proven identical by StreamingLshSpec):
    * this explode + hash-aggregate form for batch, and the in-row form
    * in [[graft.functions.MinHash]] for streaming (stateless, so it
    * applies to an unbounded frame). Batch keeps the aggregate: measured
    * 2.59 vs 3.78 s cold staging build at sf0.1, unchanged (3.73) after
    * nativizing the minima pass (MinHashSig) — the residual gap is md5
    * evaluated inside an interpreted transform() lambda vs codegen'd md5
    * over exploded rows. The reverse of the "no shuffle is faster"
    * intuition, twice measured.
    */
  private def minhashBands(s: SparkSession, dir: String): DataFrame =
    minhashBandsGeom(s, dir, 4)

  /** [[minhashBands]] generalized to any (bands, rows) split of the SAME
    * 8 permutation minima — the geometry knob q158's band-plan optimizer
    * selects over. `nBands = 4` is exactly the fixed q36 pipeline (same
    * expressions, same plan); the other splits exist so the q158 audit
    * can MEASURE the S-curve's recall ordering instead of trusting it.
    */
  private[graft] def minhashBandsGeom(s: SparkSession, dir: String,
      nBands: Int): DataFrame = {
    require(nBands > 0 && 8 % nBands == 0,
      s"band count $nBands must divide the 8-perm budget")
    val rowsPer = 8 / nBands
    val g = ngramSet(s, dir)
    val sigCols = (0 until 8).map(j =>
      min(pmod(lit(graft.functions.MinHash.a(j)) * col("hv") +
        lit(graft.functions.MinHash.b(j)),
        lit(graft.functions.MinHash.P))).as(s"s$j"))
    val sigs = g.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until nBands).map(b =>
      concat_ws(":",
        (0 until rowsPer).map(r => col(s"s${rowsPer * b + r}")): _*).as(s"b$b"))
    sigs
      .select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id",
        s"stack($nBands, " +
          (0 until nBands).map(b => s"$b, b$b").mkString(", ") +
          ") as (band, bkey)")
  }

  /** Candidate pairs for an alternative band geometry (unstaged — the
    * q158 audit's measurement path; the fixed 4-band geometry keeps its
    * staged [[minhashPairs]] frame).
    */
  private[graft] def minhashPairsGeom(s: SparkSession, dir: String,
      nBands: Int): DataFrame =
    minhashBandsGeom(s, dir, nBands)
      .groupBy("band", "bkey").agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (x, ix) -> " +
          "filter(transform(ids, (y, iy) -> " +
          "IF(x < y, struct(x AS i, y AS j), NULL)), p -> p IS NOT NULL)))"))
        .as("p"))
      .select(col("p.i"), col("p.j"))
      .distinct()

  /** q36's candidate pairs (i &lt; j, distinct): equality join on full bands.
    * Session-staged: the pair set is tiny (near-dup collisions only) but
    * its producing pipeline is the most expensive in the dedup family, and
    * the graph queries (q95 PageRank, q97 triangles) reference it 5–7
    * times per plan — staging pays for itself on the second reference.
    * (Staging the upstream SHINGLE set was measured slower — it is
    * corpus-sized; the pairs are not.)
    */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, dir, "mh_pairs") {
      // in-group pair generation instead of a band self-join: the join form
      // recomputed the whole shingle->signature->band pipeline on both sides.
      // Same pairs, one scan. Groups are same-signature-band buckets: their
      // size is bounded by the near-dup cluster size (docs that really do
      // collide), the same bound the self-join's output had.
      minhashBands(s, dir)
        .groupBy("band", "bkey").agg(collect_list(col("doc_id")).as("ids"))
        .select(explode(expr(
          "flatten(transform(ids, (x, ix) -> " +
            "filter(transform(ids, (y, iy) -> " +
            "IF(x < y, struct(x AS i, y AS j), NULL)), p -> p IS NOT NULL)))"))
          .as("p"))
        .select(col("p.i"), col("p.j"))
        .distinct()
    }

  /** Oracle CTE chain ending in `mh_pairs(i, j)` — the SQL twin of
    * [[minhashPairs]], shared by the q36 and q57 oracles.
    */
  private val minhashPairsCte = ngramCte + """,
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(ng), 1, 8)) AS BIGINT) AS hv FROM g),
        sig AS (
          SELECT doc_id, j,
                 MIN((1000003 * (j + 1) * hv + 7919 * (j + 1)) % 2147483647) AS s
          FROM h, UNNEST(generate_series(0, 7)) AS t(j)
          GROUP BY doc_id, j),
        bands AS (
          SELECT doc_id, j // 2 AS band,
                 string_agg(CAST(s AS VARCHAR), ':' ORDER BY j) AS bkey
          FROM sig GROUP BY doc_id, j // 2),
        mh_pairs AS (
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""

  /** q57's connected-components labeling as a reusable frame
    * `(node, label)`: the staged near-dup PAIR SET as the edge list, then
    * alternating large-star/small-star contraction
    * ([[graft.operators.ConnectedComponents]]). Round count is O(log n)
    * regardless of component shape — the previous min-label propagation
    * needed O(diameter) rounds AND re-joined the corpus-sized bands frame
    * every round; contraction iterates on the contracting (node → root)
    * pointer set only. Also feeds the q65 end-to-end curation pipeline.
    * Label values are identical (min doc_id of the component), so
    * consumers and oracle hashes are unchanged. See the inline comment
    * for the pair-set-vs-bucket-star input trade.
    */
  private def neardupLabels(s: SparkSession, dir: String): DataFrame = {
    // The staged near-dup pair set is exactly the CC edge list (bucket
    // cliques, deduped) and is already shared by q36/q95/q97 — reusing it
    // means the labels' marginal cost is the contraction alone, not a
    // second run of the shingle→signature→band pipeline. Known trade:
    // under EXTREME duplication the pair set itself is Σ cluster², and a
    // labels-only consumer would want the linear bucket-star construction
    // instead (per bucket: (min → member) edges, the q136 shape — same
    // connectivity, O(bucket) edges); here exact dedup runs upstream and
    // the pair frame is demanded by the graph queries regardless, so
    // pair reuse is the cheaper session-wide choice.
    val edges = minhashPairs(s, dir)
      .select(col("i").as("u"), col("j").as("v"))
    graft.operators.ConnectedComponents.run(edges)._1
  }

  /** Session-staged labels (graft.Staging): q57 and q65 share one CC run —
    * cost changes, results never (the staged frame is a pure projection).
    */
  private def stagedLabels(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, dir, "neardup_labels") {
      neardupLabels(s, dir).select(col("node"), col("label"))
    }

  /** q120's five composed stages as named sub-plans, last = the registered
    * query's full plan (the query IS `stages.last._2`, so decomposed
    * timing measures exactly the shipped subtrees). The complete modern
    * pretraining data recipe as ONE declarative plan, reported as a
    * survival funnel: raw corpus → exact dedup → near-dup representative →
    * benchmark decontamination → quality floor → temperature-mixture
    * sample. Every stage is a flag column over one shared scan
    * (independent subtrees joined on doc_id — no stage re-reads the
    * corpus), and every flag reuses the family's verified machinery:
    * q34's fingerprint, q57's CC labels, q63's 5-gram bench overlap,
    * q99/q107's isqrt gate. Exposed package-wide for BenchOne's `-stages`
    * variance attribution (round-9 VERDICT directive #4).
    */
  private[graft] def recipeFunnelStages(s: SparkSession, dir: String)
      : Seq[(String, DataFrame)] = {
    val corpus = docs(s, dir).filter(col("doc_id") >= 10)
    val fp = md5(array_join(array_sort(tokens(normText(col("text")))), " "))
    // the fingerprint pass (tokenize + sort + md5 per doc) is the
    // funnel's most expensive projection and is referenced twice inside
    // the flags join (canon's aggregate side + the join's left side);
    // one per-run localCheckpoint makes it a single corpus pass
    // (round-19 optimization, guide §5)
    val d = corpus.select(col("doc_id"), col("source"),
      col("n_chars"), fp.as("f"))
      .localCheckpoint(true)
    val canon = d.groupBy("f").agg(min("doc_id").as("c"))
    val reps = stagedLabels(s, dir)
      .select(col("node").as("doc_id"), col("label").as("rep"))
    // decontamination stage rides the staged 5-gram frame shared
    // with q63 (both sides filter the same staged explode)
    val g5 = Grams.hashed(s, dir, 5)
    val benchG = g5.filter(col("doc_id") < 10)
      .select("ng").distinct()
    val contam = g5.filter(col("doc_id") >= 10)
      .join(broadcast(benchG), "ng")
      .select("doc_id").distinct().withColumn("bad", lit(1))
    // the flags table is the funnel's decision set (guide §8: decide on
    // small rows once) and is consumed by BOTH the per-source rate
    // derivation and the final rollup — checkpoint so the join tree
    // above runs once per invocation
    val flags = d.join(canon, "f")
      .join(reps, Seq("doc_id"), "left_outer")
      .join(contam, Seq("doc_id"), "left_outer")
      .withColumn("k2", (col("doc_id") === col("c")).cast("int"))
      .withColumn("k3", (col("k2") === 1 &&
        (col("rep").isNull || col("rep") === col("doc_id"))).cast("int"))
      .withColumn("k4", (col("k3") === 1 && col("bad").isNull).cast("int"))
      .withColumn("k5", (col("k4") === 1 && col("n_chars") >= 100).cast("int"))
      .localCheckpoint(true)
    val rates = flags.filter(col("k5") === 1)
      .groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("w", floor(sqrt(col("n_s").cast("double"))).cast("long"))
    val total = rates.agg(sum(col("w")).as("wt"))
    val rate = rates.crossJoin(broadcast(total))
      .select(col("source"), least(lit(1000000L),
        expr("(200L * w div wt) * 1000000L div n_s")).as("rate_ppm"))
    val fin = flags.join(broadcast(rate), Seq("source"), "left_outer")
      .withColumn("k6", (col("k5") === 1 &&
        pmod(hash32(col("doc_id").cast("string")), lit(1000000)) <
          coalesce(col("rate_ppm"), lit(0L))).cast("int"))
      .agg(count(lit(1)).as("n_raw"),
        sum(col("k2")).as("n_exact"), sum(col("k3")).as("n_neardup"),
        sum(col("k4")).as("n_decon"), sum(col("k5")).as("n_quality"),
        sum(col("k6")).as("n_sampled"))
    Seq(
      "s1_exact_canon" -> canon,
      "s2_neardup_reps" -> reps,
      "s3_contam_grams" -> contam,
      "s4_flags_join" -> flags,
      "s5_rate_sample_full" -> fin)
  }

  /** Oracle CTE chain ending in `cc(doc_id, cluster_rep)` — the SQL twin of
    * [[neardupLabels]] via recursive transitive closure, shared by q57/q65.
    */
  private val ccCte =
    minhashPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """,
        edges AS (SELECT i AS a, j AS b FROM mh_pairs
                  UNION SELECT j, i FROM mh_pairs),
        reach AS (
          SELECT a AS node, b AS r FROM edges
          UNION
          SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a),
        cc AS (SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_rep
               FROM reach GROUP BY node)"""

  /** Majority-vote SimHash signatures `(doc_id, simhash)` over `bits`
    * signature bits (token hash = first bits/4 hex digits of md5, so both
    * engines agree). q37 pins the classic 32-bit form; q126 uses 60 bits —
    * at 32 bits the band buckets of a shared-vocab corpus saturate and the
    * near-dup join degenerates toward all-pairs (measured: 7.3 s and 14k
    * pairs at sf0.01 vs 0.6 s and tens of pairs at 60 bits).
    */
  private def simhashSigs(s: SparkSession, dir: String, bits: Int): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("hv",
        conv(substring(md5(col("tok")), 1, bits / 4), 16, 10).cast("long"))
    val bitCols = (0 until bits).map(b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"c$b"))
    val sums = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until bits)
      .map(b => when(col(s"c$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Oracle CTE chain ending in `sh(doc_id, simhash)` — the SQL twin of
    * [[simhashSigs]], shared by the q37 and q126 oracles.
    */
  private def simhashCte(bits: Int) = s"""
    WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, ${bits / 4})) AS BIGINT) AS hv FROM t),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
      FROM h, UNNEST(generate_series(0, ${bits - 1})) AS s(b)
      GROUP BY doc_id, b),
    sh AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id)"""

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------- exact dedup
    Q(
      "q34_exact_dedup",
      (s, dir) => {
        // Content-defined fingerprint: normalized, order-insensitive token
        // bag — collapses reordered near-copies, not just byte-exact ones.
        val fp = md5(array_join(array_sort(tokens(normText(col("text")))), " "))
        docs(s, dir)
          .select(col("doc_id"), fp.as("fp"))
          .groupBy(col("fp"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_cnt"))
      },
      Some("""
        SELECT md5(array_to_string(list_sort(
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS fp,
               MIN(doc_id) AS canonical_id, COUNT(*) AS dup_cnt
        FROM documents
        GROUP BY 1"""),
      "Exact dedup: hash-groupBy on a normalized order-insensitive content " +
        "fingerprint; one shuffle on the hash (pipeline ops brief)."),

    // ------------------------------------------------- n-gram Jaccard join
    Q(
      "q35_ngram_jaccard",
      (s, dir) => jaccardPairs(s, dir, 0.8),
      Some(ngramCte + """,
        capped AS (
          SELECT g.doc_id, g.ng FROM g
          JOIN (SELECT ng, COUNT(*) AS df FROM g GROUP BY 1 HAVING COUNT(*) <= 100) d
          USING (ng)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
          FROM capped a JOIN capped b ON a.ng = b.ng AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i, j,
               CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) AS jaccard
        FROM pairs JOIN sizes s1 ON i = s1.doc_id JOIN sizes s2 ON j = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) >= 0.8"""),
      "Near-dup similarity join: word-3-gram Jaccard >= 0.8 blocked on " +
        "shared shingles with a df cap (pipeline ops brief)."),

    // --------------------------------------------------- MinHash + LSH bands
    Q(
      "q36_minhash_band_dedup",
      (s, dir) => minhashPairs(s, dir),
      Some(minhashPairsCte + "\n        SELECT i, j FROM mh_pairs"),
      "MinHash-LSH near-dup candidates: shingle->8 permutation mins->4 " +
        "bands->equality join on band keys; never all-pairs " +
        "(pipeline ops brief)."),

    // ------------------------------------- near-dup clustering (conn. comp.)
    Q(
      "q57_neardup_cluster",
      (s, dir) =>
        // Training-data dedup's final step: candidate PAIRS become dedup
        // DECISIONS (see neardupLabels for the algorithm). Each doc maps to
        // its component's min doc_id; keep=1 exactly on that representative.
        stagedLabels(s, dir)
          .select(col("node").as("doc_id"), col("label").as("cluster_rep"),
            (col("node") === col("label")).cast("int").as("keep")),
      Some(ccCte + """
        SELECT doc_id, cluster_rep,
               CAST(doc_id = cluster_rep AS INT) AS keep
        FROM cc"""),
      "Near-dup cluster resolution: connected components over the LSH " +
        "candidate graph via min-label propagation (join+groupBy per " +
        "round, O(diameter) rounds), keep = component-min representative " +
        "(pipeline ops brief: dedup decisions at corpus scale)."),

    // -------------------------------------- cluster representative selection
    Q(
      "q78_cluster_representative",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Quality-aware dedup: instead of q57's arbitrary min-id keeper,
        // each near-dup cluster elects the LONGEST member (n_chars as the
        // quality proxy; doc_id tiebreak) — the "keep the best copy" rule a
        // curation pipeline actually wants. One join to attach quality, one
        // windowed top-1 per cluster (partial before the exchange), one
        // count aggregate; reuses the session-staged CC labels.
        val members = stagedLabels(s, dir)
          .select(col("node").as("doc_id"), col("label").as("cluster_rep"))
          .join(docs(s, dir).select(col("doc_id"), col("n_chars")), "doc_id")
        val stats = members.groupBy("cluster_rep")
          .agg(count(lit(1)).as("n_members"), max(col("n_chars")).as("max_chars"))
        val w = Window.partitionBy(col("cluster_rep"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        members
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("cluster_rep"), col("doc_id").as("best_doc"))
          .join(stats, "cluster_rep")
      },
      Some(ccCte + """,
        m AS (SELECT cc.doc_id, cc.cluster_rep, d.n_chars
              FROM cc JOIN documents d USING (doc_id)),
        best AS (
          SELECT cluster_rep, doc_id AS best_doc,
                 row_number() OVER (PARTITION BY cluster_rep
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM m),
        st AS (SELECT cluster_rep, COUNT(*) AS n_members,
                      MAX(n_chars) AS max_chars
               FROM m GROUP BY cluster_rep)
        SELECT cluster_rep, best_doc, n_members, max_chars
        FROM best JOIN st USING (cluster_rep) WHERE rn = 1"""),
      "Cluster-representative election: each near-dup cluster keeps its " +
        "highest-quality member (length proxy, deterministic tiebreak) — " +
        "the keep-the-best-copy dedup decision; windowed top-1 per cluster " +
        "over session-staged CC labels (pipeline ops brief)."),

    // ------------------------------------- PageRank over the near-dup graph
    Q(
      "q95_pagerank_neardup",
      (s, dir) => {
        // Fixed-iteration PageRank over the LSH near-dup pair graph — the
        // iterative-graph-computation shape (centrality over a similarity
        // graph) expressed as three unrolled join+aggregate rounds. All
        // arithmetic is scaled-integer (ranks in millionths, per-edge
        // contribution = rank div degree, damping 0.85 as *850 div 1000)
        // so both engines produce bit-identical ranks — no float summation
        // order anywhere. Per iteration: one join rank⋈edges (shuffled on
        // doc_id) + one sum by destination — linear in |E|, the plan a
        // Pregel round compiles to. Fixed 3 iterations keeps the plan
        // static; convergence-to-fixpoint would loop the same two ops.
        // Iterate over EDGE NODES only: contributions flow along edges, so
        // a node outside the pair graph holds the damped default
        // 150000 + 850*0 after every round and never influences anyone —
        // it re-attaches in one left join at the end. The iteration state
        // is near-dup-graph-sized (collision pairs), not corpus-sized:
        // at 100 TB the three rounds shuffle the (small) rank frame, and
        // the corpus is scanned exactly once for the final attach instead
        // of once per round.
        //
        // Degree is folded into the staged frames ONCE, not re-joined per
        // round (the r06 regression: deg was a groupBy recomputed inside
        // every unrolled iteration — 4 extra shuffles per run). pr_nodes
        // (doc_id, deg) doubles as the node list — every edge endpoint has
        // deg ≥ 1 — and pr_edges carries (src, dst, deg) so a round is
        // exactly one join + one aggregate over persisted leaves, the
        // Pregel-round plan. Both frames are near-dup-graph-sized.
        val prNodes = graft.Staging.stage(s, dir, "pr_nodes") {
          val pairs = minhashPairs(s, dir)
          pairs.select(col("i").as("src"), col("j").as("dst"))
            .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
            .groupBy(col("src").as("doc_id"))
            .agg(count(lit(1)).as("deg"))
        }
        val prEdges = graft.Staging.stage(s, dir, "pr_edges") {
          val pairs = minhashPairs(s, dir)
          pairs.select(col("i").as("src"), col("j").as("dst"))
            .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
            .join(prNodes.select(col("doc_id").as("src"), col("deg")), "src")
        }
        // Round-20 (§2.4, the r19 verdict's #3 — q95 ran ~10 serial
        // micro-stages and read FASTER at 8 cores than 32): the rank
        // frame never materializes between rounds. The old loop attached
        // every round's contributions back onto prNodes (a second join +
        // exchange per round) only so the next round could read `pr`;
        // but pr(u) = 150000 + 850*coalesce(in_sum(u), 0) div 1000 is a
        // FORMULA of the previous round's contribution row, so the next
        // round's edge join can compute it inline from a LEFT join
        // (missing src ≡ no in-edges ≡ in_sum 0 — exactly the value the
        // dropped attach would have carried; every edge src is a node by
        // construction). One exchange per round (the groupBy dst; the
        // src-side join reuses contrib's dst-hash partitioning) instead
        // of three. Values are bit-identical: same integer formula, same
        // join semantics, r3 materialized once at the end.
        var contrib = prEdges
          .select(col("dst"), expr("1000000L div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        for (_ <- 2 to 3) {
          contrib = prEdges
            .join(contrib.withColumnRenamed("dst", "src"),
              Seq("src"), "left_outer")
            .select(col("dst"),
              expr("(150000L + 850 * coalesce(in_sum, 0L) div 1000) " +
                "div deg").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        }
        // Fold the deg attach into the (small) rank frame before the single
        // corpus-sized left join — one scan of documents, not two joins;
        // the final rank formula applies here, once, over all nodes.
        val rd = prNodes
          .join(contrib.withColumnRenamed("dst", "doc_id"),
            Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            expr("150000L + 850 * coalesce(in_sum, 0L) div 1000").as("pr"),
            col("deg"))
        docs(s, dir).select(col("doc_id"))
          .join(rd, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("pr"), lit(150000L)).as("pr"),
            coalesce(col("deg"), lit(0L)).as("deg"))
      },
      Some(minhashPairsCte + """,
        edges AS (SELECT i AS a, j AS b FROM mh_pairs
                  UNION SELECT j, i FROM mh_pairs),
        deg AS (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
        nodes AS (SELECT doc_id FROM documents),
        r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        c1 AS (SELECT e.b AS doc_id, SUM(r0.pr // d.deg) AS s
               FROM edges e JOIN r0 ON e.a = r0.doc_id
               JOIN deg d ON d.a = e.a GROUP BY e.b),
        r1 AS (SELECT n.doc_id, 150000 + (850 * COALESCE(c1.s, 0)) // 1000 AS pr
               FROM nodes n LEFT JOIN c1 USING (doc_id)),
        c2 AS (SELECT e.b AS doc_id, SUM(r1.pr // d.deg) AS s
               FROM edges e JOIN r1 ON e.a = r1.doc_id
               JOIN deg d ON d.a = e.a GROUP BY e.b),
        r2 AS (SELECT n.doc_id, 150000 + (850 * COALESCE(c2.s, 0)) // 1000 AS pr
               FROM nodes n LEFT JOIN c2 USING (doc_id)),
        c3 AS (SELECT e.b AS doc_id, SUM(r2.pr // d.deg) AS s
               FROM edges e JOIN r2 ON e.a = r2.doc_id
               JOIN deg d ON d.a = e.a GROUP BY e.b),
        r3 AS (SELECT n.doc_id, 150000 + (850 * COALESCE(c3.s, 0)) // 1000 AS pr
               FROM nodes n LEFT JOIN c3 USING (doc_id))
        SELECT r3.doc_id, CAST(r3.pr AS BIGINT) AS pr,
               COALESCE(d.deg, 0) AS deg
        FROM r3 LEFT JOIN deg d ON d.a = r3.doc_id"""),
      "PageRank (3 unrolled iterations, damping 0.85) over the MinHash-LSH " +
        "near-dup graph in exact scaled-integer arithmetic — iterative " +
        "graph centrality as join+aggregate rounds " +
        "(pipeline ops brief: graph ops on similarity graphs)."),

    // --------------------------------------------------- triangle counting
    Q(
      "q97_triangle_count",
      (s, dir) => {
        // Per-node triangle participation + clustering coefficient over
        // the near-dup graph. Edges are canonically ordered (i<j), so each
        // triangle a<b<c is enumerated exactly once by the classic
        // two-join plan (e1.j=e2.i closes a<b<c candidates, e3 confirms
        // the a–c edge) — |E|-proportional shuffles, never a node
        // cross-product. The coefficient is scaled-integer
        // (2·tri·1e6 div deg·(deg−1)), engine-exact.
        val e = minhashPairs(s, dir)
        val cand = e.as("e1").join(e.as("e2"), col("e1.j") === col("e2.i"))
          .select(col("e1.i").as("ta"), col("e1.j").as("tb"),
            col("e2.j").as("tc"))
        val tri = cand.join(e.as("e3"),
          col("ta") === col("e3.i") && col("tc") === col("e3.j"))
          .select("ta", "tb", "tc")
        val perNode = tri.select(explode(array(col("ta"), col("tb"),
            col("tc"))).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
        val deg = e.select(col("i").as("doc_id"))
          .unionByName(e.select(col("j").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("deg"))
        deg.join(perNode, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("deg"),
            coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
            when(col("deg") >= 2,
              expr("2 * coalesce(n_triangles, 0L) * 1000000L " +
                "div (deg * (deg - 1))"))
              .otherwise(lit(0L)).as("clust_ppm"))
      },
      Some(minhashPairsCte + """,
        cand AS (
          SELECT e1.i AS ta, e1.j AS tb, e2.j AS tc
          FROM mh_pairs e1 JOIN mh_pairs e2 ON e1.j = e2.i),
        tri AS (
          SELECT ta, tb, tc
          FROM cand JOIN mh_pairs e3 ON cand.ta = e3.i AND cand.tc = e3.j),
        pn AS (
          SELECT doc_id, COUNT(*) AS n_triangles
          FROM (SELECT ta AS doc_id FROM tri
                UNION ALL SELECT tb FROM tri
                UNION ALL SELECT tc FROM tri)
          GROUP BY doc_id),
        deg AS (
          SELECT doc_id, COUNT(*) AS deg
          FROM (SELECT i AS doc_id FROM mh_pairs
                UNION ALL SELECT j FROM mh_pairs)
          GROUP BY doc_id)
        SELECT deg.doc_id, deg.deg,
               COALESCE(pn.n_triangles, 0) AS n_triangles,
               CASE WHEN deg.deg >= 2
                    THEN (2 * COALESCE(pn.n_triangles, 0) * 1000000)
                         // (deg.deg * (deg.deg - 1))
                    ELSE 0 END AS clust_ppm
        FROM deg LEFT JOIN pn USING (doc_id)"""),
      "Triangle counting + clustering coefficient on the near-dup graph: " +
        "canonical-order two-join enumeration (each triangle once), " +
        "scaled-integer coefficient — the graph-density diagnostic for " +
        "dedup cluster quality (pipeline ops brief: graph ops)."),

    // --------------------------------------- leakage-safe train/eval split
    Q(
      "q90_leakage_safe_split",
      (s, dir) => {
        // Train/eval assignment by CLUSTER, not by document: every member
        // of a near-dup cluster lands on the same side (hash-gated on the
        // cluster representative), so an eval doc can never have a
        // near-duplicate in train — the split-leakage guard a benchmark
        // pipeline needs on top of q63's exact decontamination.
        // Deterministic (hash32, no rand()); singletons are their own
        // cluster.
        val reps = stagedLabels(s, dir)
          .select(col("node").as("doc_id"), col("label").as("rep"))
        docs(s, dir).select(col("doc_id"))
          .join(reps, Seq("doc_id"), "left_outer")
          .withColumn("rep", coalesce(col("rep"), col("doc_id")))
          .withColumn("split",
            when(pmod(hash32(col("rep").cast("string")), lit(100)) < 90,
              lit("train")).otherwise(lit("eval")))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("rep")).as("n_clusters"))
      },
      Some(ccCte + """,
        r AS (
          SELECT d.doc_id, COALESCE(cc.cluster_rep, d.doc_id) AS rep
          FROM documents d LEFT JOIN cc USING (doc_id)),
        sp AS (
          SELECT doc_id, rep,
                 CASE WHEN CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 100 < 90
                      THEN 'train' ELSE 'eval' END AS split
          FROM r)
        SELECT split, COUNT(*) AS n_docs,
               COUNT(DISTINCT rep) AS n_clusters
        FROM sp GROUP BY split"""),
      "Leakage-safe train/eval split: hash-gated by near-dup CLUSTER " +
        "representative so no eval doc has a near-duplicate in train — " +
        "the split guard on top of exact decontamination (pipeline ops " +
        "brief)."),

    // --------------------------------------------- end-to-end curation
    Q(
      "q65_curation_pipeline",
      (s, dir) => {
        // The whole dedup family composed as ONE declarative pipeline —
        // what a corpus curation run actually executes: exact dedup
        // (canonical per content fingerprint) ∘ near-dup clustering (keep
        // the component representative), rolled up to kept-corpus stats
        // per language. Catalyst plans the fingerprint branch and the CC
        // labels as independent subtrees joined once on doc_id.
        val fp = md5(array_join(array_sort(tokens(normText(col("text")))), " "))
        val d = docs(s, dir).select(col("doc_id"), col("lang"), fp.as("f"))
        val canon = d.groupBy("f").agg(min("doc_id").as("c"))
        val reps = stagedLabels(s, dir)
          .select(col("node").as("doc_id"), col("label").as("rep"))
        d.join(canon, "f")
          .join(reps, Seq("doc_id"), "left_outer")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") === col("c") &&
              (col("rep").isNull || col("rep") === col("doc_id")), 1L)
              .otherwise(0L)).as("n_kept"))
      },
      Some(ccCte + """,
        fp AS (SELECT doc_id, lang,
                      md5(array_to_string(list_sort(string_split(
                        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS f
               FROM documents),
        canon AS (SELECT f, MIN(doc_id) AS c FROM fp GROUP BY f)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN doc_id = c AND
                               (cluster_rep IS NULL OR cluster_rep = doc_id)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM fp JOIN canon USING (f) LEFT JOIN cc USING (doc_id)
        GROUP BY lang"""),
      "End-to-end curation: exact dedup ∘ near-dup clustering rolled up to " +
        "kept-corpus stats per language — the dedup family composed as one " +
        "declarative pipeline (pipeline ops brief)."),


    // --------------------------------------- full pretraining-recipe funnel
    Q(
      "q120_recipe_funnel",
      (s, dir) => recipeFunnelStages(s, dir).last._2,
      Some(ccCte + """,
        corpus AS (SELECT * FROM documents WHERE doc_id >= 10),
        fp AS (SELECT doc_id, source, n_chars,
                      md5(array_to_string(list_sort(string_split(
                        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS f
               FROM corpus),
        canon AS (SELECT f, MIN(doc_id) AS c FROM fp GROUP BY f),
        tk5 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g5 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS ng
               FROM tk5, UNNEST(generate_series(1, len(t) - 4)) AS s(i)),
        bench AS (SELECT DISTINCT ng FROM g5 WHERE doc_id < 10),
        contam AS (SELECT DISTINCT g5.doc_id FROM g5 JOIN bench USING (ng)
                   WHERE g5.doc_id >= 10),
        fl AS (
          SELECT fp.doc_id, fp.source,
                 CASE WHEN fp.doc_id = canon.c THEN 1 ELSE 0 END AS k2,
                 CASE WHEN fp.doc_id = canon.c AND
                        (cc.cluster_rep IS NULL OR cc.cluster_rep = fp.doc_id)
                      THEN 1 ELSE 0 END AS k3,
                 CASE WHEN fp.doc_id = canon.c AND
                        (cc.cluster_rep IS NULL OR cc.cluster_rep = fp.doc_id)
                        AND contam.doc_id IS NULL
                      THEN 1 ELSE 0 END AS k4,
                 CASE WHEN fp.doc_id = canon.c AND
                        (cc.cluster_rep IS NULL OR cc.cluster_rep = fp.doc_id)
                        AND contam.doc_id IS NULL AND fp.n_chars >= 100
                      THEN 1 ELSE 0 END AS k5
          FROM fp JOIN canon USING (f)
          LEFT JOIN cc ON cc.doc_id = fp.doc_id
          LEFT JOIN contam ON contam.doc_id = fp.doc_id),
        rates AS (
          SELECT source, COUNT(*) AS n_s,
                 CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w
          FROM fl WHERE k5 = 1 GROUP BY source),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM rates),
        rt AS (SELECT rates.source,
                      LEAST(1000000, ((200 * rates.w) // tot.wt) * 1000000
                            // rates.n_s) AS rate_ppm
               FROM rates, tot)
        SELECT COUNT(*) AS n_raw,
               CAST(SUM(fl.k2) AS BIGINT) AS n_exact,
               CAST(SUM(fl.k3) AS BIGINT) AS n_neardup,
               CAST(SUM(fl.k4) AS BIGINT) AS n_decon,
               CAST(SUM(fl.k5) AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN fl.k5 = 1 AND
                 CAST(('0x' || substr(md5(CAST(fl.doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 1000000 < COALESCE(rt.rate_ppm, 0)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM fl LEFT JOIN rt ON fl.source = rt.source"""),
      "The full pretraining recipe as one plan: exact dedup ∘ near-dup " +
        "rep ∘ decontamination ∘ quality floor ∘ temperature sample, " +
        "reported as a survival funnel — every stage a flag over one " +
        "shared scan (pipeline ops brief capstone)."),

    // ------------------------------------------ embedding-cosine near-dup
    Q(
      "q45_embedding_neardup",
      (s, dir) => {
        import graft.functions.VectorFns.{bucketArray, dot, norm}
        // 12 sign bits (4096 buckets/table), not the ANN queries' 6: this
        // is the one LSH consumer that SELF-joins the whole corpus, so its
        // pair count grows ~n²/2^bits at fixed resolution. Measured on the
        // x10 scale corpus: 6 bits → ~78M candidate pairs and a 205 s
        // quadratic blowup; 12 bits → linear-regime candidates until the
        // corpus reaches millions of vectors. The recall profile this
        // buys, by similarity band (miss/table = 1-(1-θ/π)^bits, union
        // over 4 tables): cos 0.999 → ≥ 0.999; cos 0.99 → ≈ 0.967;
        // cos 0.9 → ≈ 0.49; at the τ = 0.35 rescore floor → ≈ 1 %. That
        // is the deliberate posture: q45 is a NEAR-DUPLICATE detector
        // tuned for the high-similarity band where near-dups live (the
        // planted-dup recall is asserted in PipelineOpsSpec); τ filters
        // candidates, it is NOT a completeness promise at moderate
        // similarity — moderate-sim retrieval is the ANN family's job
        // (q38/q39/q72, whose bounded probe sides keep 6-bit recall
        // affordable). At 10^8+ vectors, raise bits with log2(n)
        // (bits ≈ log2(n/16)); the operator is parametric, the registered
        // query pins (4, 12).
        val tables = 4; val bits = 12
        val base = Tables(s, dir, "embeddings")
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
        // ids-only bucket frame: the pair join moves (vec_id, t, bk)
        // triples, never the 64-dim vectors; candidate (i, j) ids are
        // deduped while still small and vectors re-attach afterwards by
        // key join — at corpus scale this is the difference between
        // shuffling ids and shuffling the embedding matrix
        val ids = base.select(col("vec_id"),
          posexplode(bucketArray(col("v"), tables, bits)).as(Seq("t", "bk")))
        val pairIds = ids.select(col("vec_id").as("i"), col("t"), col("bk"))
          .join(ids.select(col("vec_id").as("j"), col("t"), col("bk")),
            Seq("t", "bk"))
          .filter(col("i") < col("j"))
          .select(col("i"), col("j"))
          .distinct()
        // norms precomputed per vector (not per pair): rescore folds one
        // dot product per candidate instead of three
        val normed = base.withColumn("nrm", norm(col("v")))
        pairIds
          .join(normed.select(col("vec_id").as("i"), col("v").as("vi"),
            col("nrm").as("ni")), "i")
          .join(normed.select(col("vec_id").as("j"), col("v").as("vj"),
            col("nrm").as("nj")), "j")
          .withColumn("sim",
            when(col("ni") * col("nj") =!= 0.0,
              dot(col("vi"), col("vj")) / (col("ni") * col("nj"))))
          .filter(col("sim") >= 0.35)
          .select(col("i"), col("j"), col("sim"))
      },
      // Hash-parity hyperplanes (VectorFns.planeSigns) make the bucket
      // assignment DuckDB-replayable — full oracle; recall on planted
      // near-duplicates additionally asserted in PipelineOpsSpec.
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        ${graft.functions.VectorFns.planesCte(4, 12)},
        pairs AS (
          SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
          FROM bk a JOIN bk b ON a.t = b.t AND a.bk = b.bk AND a.vec_id < b.vec_id),
        s AS (
          SELECT i, j,
                 list_dot_product(ei.v, ej.v) /
                   (sqrt(list_dot_product(ei.v, ei.v)) * sqrt(list_dot_product(ej.v, ej.v))) AS sim
          FROM pairs JOIN e ei ON i = ei.vec_id JOIN e ej ON j = ej.vec_id)
        SELECT i, j, sim FROM s WHERE sim >= 0.35"""),
      "Embedding-cosine near-dup dedup: corpus-wide LSH bucket pairs " +
        "(4 tables x 12 sign bits — self-join resolution, see comment) -> " +
        "exact cosine rescore >= threshold; never all-pairs " +
        "(pipeline ops brief)."),
    // --------------------------------------------------- fuzzy (edit-dist)
    Q(
      "q48_fuzzy_prefix_match",
      (s, dir) => {
        // Edit-distance near-dup: block on (first token, prefix-length
        // band), compare 40-char prefixes with Levenshtein <= 10. The
        // composite key plus a df <= 100 frequency cap (the same O(df²)
        // guard as the shingle cap in q35) means a hot first token ("the")
        // can never put a large fraction of the corpus in one block — the
        // length band splits hot tokens across bands first, and anything
        // still hotter than the cap is dropped outright.
        val d = docs(s, dir).select(
          col("doc_id"),
          split(col("text"), " ").getItem(0).as("tok1"),
          substring(col("text"), 1, 40).as("pre"))
          .withColumn("lb", floor(length(col("pre")) / 8))
        // count-only aggregate (no collection), keys under the cap survive
        val capped = d.join(
          d.groupBy("tok1", "lb").agg(count(lit(1)).as("df"))
            .filter(col("df") <= 100).select("tok1", "lb"),
          Seq("tok1", "lb"))
        capped.select(col("doc_id").as("i"), col("tok1"), col("lb"),
            col("pre").as("pi"))
          .join(capped.select(col("doc_id").as("j"), col("tok1"), col("lb"),
            col("pre").as("pj")), Seq("tok1", "lb"))
          .filter(col("i") < col("j"))
          // 3-arg banded Levenshtein (Ukkonen cutoff): computes only the
          // |threshold|-band and returns -1 above it — same accepted pairs,
          // a fraction of the DP work
          .withColumn("edit_dist", levenshtein(col("pi"), col("pj"), 10))
          .filter(col("edit_dist").between(0, 10))
          .select(col("i"), col("j"), col("edit_dist"))
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ')[1] AS tok1,
                          substr(text, 1, 40) AS pre,
                          length(substr(text, 1, 40)) // 8 AS lb
                   FROM documents),
        c AS (SELECT tok1, lb FROM d GROUP BY 1, 2 HAVING COUNT(*) <= 100),
        dc AS (SELECT d.* FROM d JOIN c USING (tok1, lb))
        SELECT a.doc_id AS i, b.doc_id AS j,
               CAST(levenshtein(a.pre, b.pre) AS INT) AS edit_dist
        FROM dc a JOIN dc b
          ON a.tok1 = b.tok1 AND a.lb = b.lb AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pre, b.pre) <= 10"""),
      "Fuzzy near-dup: first-token blocking + prefix Levenshtein <= 10 " +
        "(pipeline ops brief; edit-distance dedup kernel)."),

    // ------------------------------------------------------------ SimHash
    Q(
      "q37_simhash",
      (s, dir) => simhashSigs(s, dir, 32),
      Some(simhashCte(32) + "\n        SELECT doc_id, simhash FROM sh"),
      "SimHash: 32-bit majority-vote signature over token hashes — one " +
        "aggregation per doc, Hamming-comparable downstream " +
        "(pipeline ops brief)."),

    // ------------------------------------------------ SimHash near-dup
    Q(
      "q126_simhash_neardup",
      (s, dir) => {
        // The dedup operator the q37 signatures exist for: pairs within
        // Hamming distance 3, over a 60-bit signature (32 bits saturates —
        // see simhashSigs). Blocking is 4 bands of 15 bits — 3 bit flips
        // can break at most 3 bands, so by pigeonhole every qualifying
        // pair shares at least one intact band: the band join is COMPLETE
        // for d<=3 across surviving buckets (unlike MinHash banding).
        // Verify is one codegen'd bit_count(xor) per candidate. Buckets
        // over 100 docs are skipped — the q35/q119 cap discipline: a
        // band value shared by hundreds of docs is a giant near-identical
        // cluster that exact dedup (q34) or CC clustering (q57) should
        // collapse, and enumerating its quadratic pair set adds no
        // information. The cap bounds pair work at O(cap^2 * buckets).
        val bands = simhashSigs(s, dir, 60)
          .select(col("doc_id"), col("simhash"),
            posexplode(array((0 until 4).map(b =>
              shiftright(col("simhash"), 15 * b).bitwiseAND(32767)): _*))
              .as(Seq("band", "bv")))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("band"), col("bv"))))
          .filter(col("n") <= 100)
        bands
          .groupBy(col("band"), col("bv"))
          .agg(collect_list(struct(col("doc_id").as("d"), col("simhash").as("sg")))
            .as("ids"))
          .select(explode(expr(
            "flatten(transform(ids, (x, ix) -> " +
              "filter(transform(ids, (y, iy) -> " +
              "IF(x.d < y.d, struct(x.d AS i, x.sg AS si, y.d AS j, y.sg AS sj), " +
              "NULL)), p -> p IS NOT NULL)))"))
            .as("p"))
          .select(col("p.i"), col("p.j"),
            bit_count(col("p.si").bitwiseXOR(col("p.sj"))).cast("int")
              .as("hamming"))
          .filter(col("hamming") <= 3)
          .distinct()
      },
      Some(simhashCte(60) + """,
        bands AS (
          SELECT doc_id, simhash, band, bv FROM (
            SELECT doc_id, simhash, b AS band,
                   (simhash >> (15 * b)) & 32767 AS bv,
                   COUNT(*) OVER (PARTITION BY b, (simhash >> (15 * b)) & 32767) AS n
            FROM sh, UNNEST(generate_series(0, 3)) AS s(b))
          WHERE n <= 100),
        cand AS (
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        SELECT i, j, hamming FROM cand WHERE hamming <= 3"""),
      "SimHash near-dup join: 60-bit signatures, 4x15-bit band blocking " +
        "(pigeonhole-complete for Hamming<=3) + bit_count(xor) verify — " +
        "signature-space dedup closing the q37 family " +
        "(pipeline ops brief)."),

    // ----------------------------------------------- LSH recall audit
    Q(
      "q124_lsh_recall_audit",
      (s, dir) => {
        // Measure, don't guess: how much of the exact Jaccard>=0.5 truth
        // set does the 8-perm/4-band MinHash index actually recall? Truth
        // is [[jaccardPairs]] — the SAME pipeline as q35, threshold 0.5
        // (the df cap doesn't bind on the fixtures — max df 25 — so
        // blocking is complete here; at corpus scale this audit runs on a
        // sample where the same holds); candidates are the staged q36
        // band pairs. One row out: the numbers that justify — or veto —
        // the band/row choice.
        val truth = jaccardPairs(s, dir, 0.5).select(col("i"), col("j"))
        val cand = minhashPairs(s, dir)
        val marked = truth.join(cand.withColumn("is_cand", lit(1)),
          Seq("i", "j"), "left_outer")
        marked
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("is_cand"), lit(0))).cast("long").as("n_hit"))
          .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
          // an empty truth set (clean corpus, nothing at threshold 0.5)
          // must report recall 1000000 — vacuously perfect — not crash
          // the audit with an ANSI divide-by-zero
          .select(col("n_truth"), col("n_cand"), col("n_hit"),
            when(col("n_truth") === 0, lit(1000000L))
              .otherwise(expr("n_hit * 1000000L div n_truth"))
              .as("recall_ppm"))
      },
      Some(minhashPairsCte + """,
        cappedr AS (
          SELECT g.doc_id, g.ng FROM g
          JOIN (SELECT ng FROM g GROUP BY 1 HAVING COUNT(*) <= 100) d
          USING (ng)),
        sizesr AS (SELECT doc_id, COUNT(*) AS sz FROM cappedr GROUP BY 1),
        pairsr AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
          FROM cappedr a JOIN cappedr b ON a.ng = b.ng AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT i, j FROM pairsr
          JOIN sizesr s1 ON i = s1.doc_id JOIN sizesr s2 ON j = s2.doc_id
          WHERE CAST(common AS DOUBLE) / (s1.sz + s2.sz - common) >= 0.5),
        t AS (SELECT COUNT(*) AS n_truth,
                     CAST(SUM(CASE WHEN mh.i IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hit
              FROM truth LEFT JOIN mh_pairs mh
                ON truth.i = mh.i AND truth.j = mh.j),
        c AS (SELECT COUNT(*) AS n_cand FROM mh_pairs)
        SELECT t.n_truth, c.n_cand, t.n_hit,
               CASE WHEN t.n_truth = 0 THEN 1000000
                    ELSE t.n_hit * 1000000 // t.n_truth END AS recall_ppm
        FROM t, c"""),
      "LSH index quality audit: recall of the MinHash band candidates " +
        "against the exact Jaccard>=0.5 truth set — the measurement that " +
        "sizes bands/rows before a 100 TB dedup run " +
        "(pipeline ops brief: measure the index, don't guess)."),

    // ----------------------------------------------- LSH band-plan optimizer
    Q(
      "q158_lsh_band_plan",
      (s, dir) => {
        // The INVERSE of q124: q124 audits a FIXED 8-perm/4-band
        // geometry; before a 100 TB run you need the planner that picks
        // it. Given the 8-permutation budget, enumerate every integer
        // (bands, rows_per_band) split and tabulate the S-curve
        // collision probability p = 1 - (1 - s^r)^b on a s = k/20 grid —
        // INTEGER-EXACT in both engines (all intermediates bounded by
        // 10^6 * 20^8 < 2^63; no float pow anywhere, so the hash can't
        // drift on ulp). The plan rule: among geometries whose
        // false-positive mass at s = 0.25 is <= 300000 ppm, pick the one
        // with max detection at the s = 0.5 target (fewest bands on
        // ties). The chosen plan here is (4 bands x 2 rows) — exactly
        // the fixed q36 geometry, which is the point: the planner
        // DERIVES what the pipeline hard-codes, and Round15OpsSpec
        // measures the predicted recall ordering with q124's machinery
        // (recall(4x2) >= recall(2x4) >= recall(1x8) on the corpus, and
        // the rejected 8x1's candidate blowup).
        //
        // A band planner is driver-sized BY CONSTRUCTION (|divisors| x
        // |grid| rows, evaluated before any cluster job is sized) — the
        // table is computed in exact Long arithmetic on the driver, the
        // same driver-literal discipline as ClusterOps' k-means models.
        import s.implicits._
        val budget = 8
        val geoms = Seq(1, 2, 4, 8).map(b => (b, budget / b))
        def powL(base: Long, e: Int): Long =
          (1 to e).foldLeft(1L)((a, _) => a * base)
        val pw8 = powL(20L, budget)
        val rows = for {
          (b, r) <- geoms
          k <- 1 to 19
        } yield {
          val qb = powL(powL(20L, r) - powL(k.toLong, r), b)
          (b, r, k * 5, 1000000L - 1000000L * qb / pw8)
        }
        val p50 = rows.collect { case (b, _, 50, p) => b -> p }.toMap
        val p25 = rows.collect { case (b, _, 25, p) => b -> p }.toMap
        // mirror of the oracle's ORDER BY: eligible first, then max
        // detection at target, then fewest bands
        val chosenB = geoms.map(_._1).minBy(b =>
          (if (p25(b) <= 300000L) 0 else 1, -p50(b), b))
        rows.map { case (b, r, sPct, p) =>
          (b, r, sPct, p, if (b == chosenB) 1 else 0)
        }.toDF("bands", "rows_per_band", "s_pct", "p_collide_ppm", "chosen")
      },
      Some("""
        WITH geo AS (SELECT * FROM (VALUES (1, 8), (2, 4), (4, 2), (8, 1))
                       g(bands, rows_per_band)),
        ks AS (SELECT CAST(k AS INT) AS k FROM generate_series(1, 19) t(k)),
        p AS (
          SELECT g.bands, g.rows_per_band, k.k,
            CASE g.rows_per_band
              WHEN 1 THEN CAST(k AS BIGINT)
              WHEN 2 THEN CAST(k AS BIGINT) * k
              WHEN 4 THEN CAST(k AS BIGINT) * k * k * k
              ELSE CAST(k AS BIGINT) * k * k * k * k * k * k * k END AS kr,
            CASE g.rows_per_band
              WHEN 1 THEN CAST(20 AS BIGINT)
              WHEN 2 THEN CAST(400 AS BIGINT)
              WHEN 4 THEN CAST(160000 AS BIGINT)
              ELSE CAST(25600000000 AS BIGINT) END AS tr
          FROM geo g, ks k),
        q AS (
          SELECT bands, rows_per_band, k,
            CASE bands
              WHEN 1 THEN (tr - kr)
              WHEN 2 THEN (tr - kr) * (tr - kr)
              WHEN 4 THEN (tr - kr) * (tr - kr) * (tr - kr) * (tr - kr)
              ELSE (tr - kr) * (tr - kr) * (tr - kr) * (tr - kr)
                   * (tr - kr) * (tr - kr) * (tr - kr) * (tr - kr)
              END AS qb
          FROM p),
        tbl AS (
          SELECT bands, rows_per_band, k * 5 AS s_pct,
                 1000000 - (1000000 * qb) // 25600000000 AS p_collide_ppm
          FROM q),
        sel AS (
          SELECT bands,
                 MAX(CASE WHEN s_pct = 50 THEN p_collide_ppm END) AS p50,
                 MAX(CASE WHEN s_pct = 25 THEN p_collide_ppm END) AS p25
          FROM tbl GROUP BY bands),
        ch AS (
          SELECT bands,
                 row_number() OVER (ORDER BY (p25 <= 300000) DESC,
                                             p50 DESC, bands ASC) AS rk
          FROM sel)
        SELECT t.bands, t.rows_per_band, t.s_pct, t.p_collide_ppm,
               CAST(CASE WHEN t.bands =
                 (SELECT bands FROM ch WHERE rk = 1) THEN 1 ELSE 0 END
                 AS INT) AS chosen
        FROM tbl t"""),
      "LSH band-plan optimizer: integer-exact S-curve table over every " +
        "(bands, rows) split of the 8-perm budget, with the plan rule " +
        "(max detection at s=0.5 under a false-positive cap at s=0.25) " +
        "deriving the 4x2 geometry the fixed pipeline uses; recall " +
        "ordering measured, not assumed, by the spec audit " +
        "(pipeline ops brief: size the index before the run)."),

    // ------------------------------------- incremental ingest dedup
    Q(
      "q125_incremental_dedup",
      (s, dir) => {
        // Dedup TODAY'S batch against the existing corpus without
        // reprocessing the corpus: the new side (doc_id % 10 = 0, the
        // arriving ~10%) probes the corpus's fingerprint set and its
        // staged 10-gram index. At 100 TB the corpus side is a written
        // gram/fp index that only the (small) new batch joins against —
        // per-ingest cost scales with the batch, not the corpus. Exact
        // matches via q34's content fingerprint; near-misses via best
        // single-corpus-doc gram overlap (q119's capped discipline).
        val isNew = pmod(col("doc_id"), lit(10)) === 0
        val fp = md5(array_join(array_sort(tokens(normText(col("text")))), " "))
        val fps = docs(s, dir).select(col("doc_id"), fp.as("f"))
        val corpusFps = fps.filter(!isNew).select(col("f")).distinct()
        val exact = fps.filter(isNew)
          .join(corpusFps.withColumn("hit", lit(1)), Seq("f"), "left_outer")
          .select(col("doc_id"), coalesce(col("hit"), lit(0)).as("exact_dup"))
        val g = Grams.hashed(s, dir, 10)
        val gNew = g.filter(pmod(col("doc_id"), lit(10)) === 0)
        val gCorp = g.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("ng"))))
          .filter(col("df") <= 20)
          .select(col("doc_id").as("cid"), col("ng"))
        val nNew = gNew.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        val best = gNew.join(gCorp, "ng")
          .groupBy(col("doc_id"), col("cid")).agg(count(lit(1)).as("shared"))
          .groupBy(col("doc_id")).agg(max(col("shared")).as("best_shared"))
        exact
          .join(nNew, Seq("doc_id"), "left_outer")
          .join(best, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("exact_dup"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("best_shared"), lit(0L)).as("best_shared"),
            when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0L))
              .otherwise(expr(
                "coalesce(best_shared, 0L) * 1000000L div n_grams"))
              .as("overlap_ppm"))
      },
      Some("""
        WITH fp AS (
          SELECT doc_id, doc_id % 10 = 0 AS is_new,
                 md5(array_to_string(list_sort(string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS f
          FROM documents),
        exact AS (
          SELECT n.doc_id,
                 CASE WHEN EXISTS (SELECT 1 FROM fp c
                                   WHERE NOT c.is_new AND c.f = n.f)
                      THEN 1 ELSE 0 END AS exact_dup
          FROM fp n WHERE n.is_new),
        tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+9], ' ') AS ng
              FROM tk, UNNEST(generate_series(1, len(t) - 9)) AS s(i)),
        gnew AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 = 0),
        gcorp AS (
          SELECT doc_id AS cid, ng FROM (
            SELECT doc_id, ng, COUNT(*) OVER (PARTITION BY ng) AS df
            FROM g WHERE doc_id % 10 <> 0) WHERE df <= 20),
        nn AS (SELECT doc_id, COUNT(*) AS n_grams FROM gnew GROUP BY 1),
        best AS (
          SELECT doc_id, MAX(shared) AS best_shared FROM (
            SELECT gnew.doc_id, gcorp.cid, COUNT(*) AS shared
            FROM gnew JOIN gcorp USING (ng)
            GROUP BY gnew.doc_id, gcorp.cid)
          GROUP BY doc_id)
        SELECT e.doc_id, e.exact_dup,
               COALESCE(nn.n_grams, 0) AS n_grams,
               COALESCE(best.best_shared, 0) AS best_shared,
               CASE WHEN COALESCE(nn.n_grams, 0) = 0 THEN 0
                    ELSE COALESCE(best.best_shared, 0) * 1000000
                         // nn.n_grams END AS overlap_ppm
        FROM exact e
        LEFT JOIN nn USING (doc_id)
        LEFT JOIN best USING (doc_id)"""),
      "Incremental ingest dedup: the arriving batch probes the corpus " +
        "fingerprint set and staged gram index — exact + best-overlap " +
        "flags at per-batch cost, never per-corpus " +
        "(pipeline ops brief: daily-crawl dedup)."),

    // ----------------------------------- embedding near-dup LABELS (linear)
    Q(
      "q136_embedding_dedup_labels",
      (s, dir) => {
        import graft.functions.VectorFns.{bucketArray, dot, norm}
        // The scale path q45's x10sat measurement demands: under mass
        // duplication the near-dup PAIR SET is Σ c_i² (measured 75 s /
        // ~25 M pairs on the 40 %-collapsed scale corpus) — any
        // pair-emitting form is output-bound. This query emits cluster
        // LABELS at strictly linear cost instead: per LSH bucket, only
        // (bucket-min → member) star edges are cosine-verified — O(size)
        // rescores per bucket, never O(size²) — then the star-contraction
        // CC collapses the verified edges to (vec_id, cluster_rep).
        // Recall trade vs pair emission, stated honestly: two similar
        // members of a bucket whose min is near-dup to NEITHER do not
        // connect through that bucket; each of the 4 tables re-deals the
        // bucket composition, and in the regime that needs this query
        // (tight mass-dup clusters) the cluster's own min is a member, so
        // true dup clusters stay connected (spec-asserted on planted
        // dups). Same (4 × 12-bit) geometry and τ = 0.35 as q45.
        val tables = 4; val bits = 12
        // NOT floor-limited (measured, round 13): this query's cost lives
        // in its shuffles (bucket window, two norm joins, CC), not the
        // pre-shuffle bucketArray — Tables.parallel on the shared base
        // measured 2.53 → 2.95 s and on the ids path alone 2.53 → 2.81 s
        // at sf0.1 (the round-robin exchange costs more than the
        // parallelized hyperplane dots save), so the plain scan stays
        val base = Tables(s, dir, "embeddings")
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
        val ids = base.select(col("vec_id"),
          posexplode(bucketArray(col("v"), tables, bits)).as(Seq("t", "bk")))
        val wB = Window.partitionBy(col("t"), col("bk"))
        val star = ids.withColumn("m", min(col("vec_id")).over(wB))
          .filter(col("vec_id") =!= col("m"))
          .select(col("m").as("u"), col("vec_id").as("w"))
          .distinct()
        val normed = base.withColumn("nrm", norm(col("v")))
        // the verified edge set is materialized ONCE per run (round-19
        // optimization, guide §5/§2.4): ConnectedComponents evaluates its
        // input twice (the node list + the initial contraction frame), and
        // without the cut each evaluation re-ran the bucket window plus
        // BOTH corpus-sized vector joins. localCheckpoint is per-invocation
        // (no cross-run reuse; blocks reclaimed by the context cleaner) and
        // the edge set is near-dup-sized by construction.
        val edges = star
          .join(normed.select(col("vec_id").as("u"), col("v").as("vu"),
            col("nrm").as("nu")), "u")
          .join(normed.select(col("vec_id").as("w"), col("v").as("vw"),
            col("nrm").as("nw")), "w")
          .filter(col("nu") * col("nw") =!= 0.0 &&
            dot(col("vu"), col("vw")) / (col("nu") * col("nw")) >= 0.35)
          .select(col("u"), col("w").as("v"))
          .localCheckpoint(true)
        val labels = graft.operators.ConnectedComponents.run(edges)._1
        base.select(col("vec_id"))
          .join(labels.withColumnRenamed("node", "vec_id"),
            Seq("vec_id"), "left_outer")
          .select(col("vec_id"),
            coalesce(col("label"), col("vec_id")).as("cluster_rep"))
      },
      Some(s"""
        WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        ${graft.functions.VectorFns.planesCte(4, 12)},
        bm AS (SELECT t, bk AS bkt, MIN(vec_id) AS m FROM bk GROUP BY t, bk),
        star AS (
          SELECT DISTINCT bm.m AS u, b.vec_id AS w
          FROM bk b JOIN bm ON b.t = bm.t AND b.bk = bm.bkt
          WHERE b.vec_id <> bm.m),
        edges AS (
          SELECT u, w FROM star
          JOIN e eu ON star.u = eu.vec_id
          JOIN e ew ON star.w = ew.vec_id
          WHERE sqrt(list_dot_product(eu.v, eu.v))
                  * sqrt(list_dot_product(ew.v, ew.v)) <> 0
            AND list_dot_product(eu.v, ew.v)
                  / (sqrt(list_dot_product(eu.v, eu.v))
                     * sqrt(list_dot_product(ew.v, ew.v))) >= 0.35),
        sym AS (SELECT u AS a, w AS b FROM edges UNION SELECT w, u FROM edges),
        reach AS (
          SELECT a AS node, b AS r FROM sym
          UNION
          SELECT reach.node, s2.b FROM reach JOIN sym s2 ON reach.r = s2.a),
        cc AS (SELECT node, LEAST(node, MIN(r)) AS lbl FROM reach GROUP BY node)
        SELECT e.vec_id, COALESCE(cc.lbl, e.vec_id) AS cluster_rep
        FROM e LEFT JOIN cc ON e.vec_id = cc.node"""),
      "Embedding near-dup cluster LABELS at linear cost: star-verified " +
        "LSH bucket edges (O(size) rescores per bucket) + large/small-star " +
        "CC contraction — the mass-duplication regime's replacement for " +
        "pair emission (pipeline ops brief)."),

    // --------------------------------------- post-dedup mixture accounting
    Q(
      "q147_post_dedup_mixture",
      (s, dir) => {
        // Dedup silently CHANGES the source mixture: near-dups concentrate
        // in scraped/boilerplate-heavy sources, so the post-dedup token
        // shares — what the trainer actually sees — drift from the raw
        // shares the mixture weights were tuned on (q99's temperature
        // sampling assumes it knows them). This operator recomputes the
        // mixture over SURVIVING docs (q57's component-min representative
        // rule; docs outside the candidate graph survive by definition)
        // and reports per-source raw vs surviving docs/tokens plus the
        // renormalized integer-ppm weight. One left join against the
        // session-staged CC labels + one small rollup — the accounting
        // step between dedup and mixture sampling. Scale shape: the only
        // corpus-sized work is the labels join (shuffle on doc_id);
        // the ppm renormalization runs on a ≤|sources| frame.
        val reps = stagedLabels(s, dir)
          .select(col("node").as("doc_id"), col("label").as("rep"))
        val perSource = docs(s, dir)
          .select(col("doc_id"), col("source"),
            coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
              .as("tok"))
          .join(reps, Seq("doc_id"), "left_outer")
          .withColumn("keep",
            (col("rep").isNull || col("rep") === col("doc_id")).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("keep")).as("n_survivors"),
            sum(col("tok")).as("tokens_total"),
            sum(col("tok") * col("keep")).as("tokens_surviving"))
        val total = perSource.agg(
          sum(col("tokens_surviving")).as("t")).select(col("t"))
        // ppm in DECIMAL(38,0): a source past ~9.2e12 surviving tokens
        // (a 100 TB-corpus share) would wrap tokens_surviving * 1e6 in
        // Long — Spark wraps silently while DuckDB errors, so the Long
        // form both corrupts and diverges (review-pass finding); the
        // decimal div is exact and floors like both engines' integer div.
        // NULLIF(t, 0) on BOTH sides: on a degenerate all-null-text corpus
        // the surviving-token total is 0, where Spark's div returns NULL
        // but DuckDB's // raises — the same silent-vs-error asymmetry;
        // guarded identically, both engines yield NULL mix_ppm
        perSource.crossJoin(broadcast(total))
          .select(col("source"), col("n_docs"), col("n_survivors"),
            col("tokens_total"), col("tokens_surviving"),
            expr("CAST((CAST(tokens_surviving AS DECIMAL(38,0)) * 1000000)" +
              " div nullif(t, 0) AS BIGINT)").as("mix_ppm"))
      },
      Some(ccCte + """,
        d AS (SELECT doc_id, source,
                     CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT)
                       AS tok
              FROM documents),
        k AS (SELECT d.source, d.tok,
                     CASE WHEN cc.cluster_rep IS NULL
                            OR cc.cluster_rep = d.doc_id
                          THEN 1 ELSE 0 END AS keep
              FROM d LEFT JOIN cc ON d.doc_id = cc.doc_id),
        ps AS (SELECT source, COUNT(*) AS n_docs,
                      CAST(SUM(keep) AS BIGINT) AS n_survivors,
                      CAST(SUM(tok) AS BIGINT) AS tokens_total,
                      CAST(SUM(tok * keep) AS BIGINT) AS tokens_surviving
               FROM k GROUP BY source)
        SELECT source, n_docs, n_survivors, tokens_total, tokens_surviving,
               CAST(CAST(tokens_surviving AS HUGEINT) * 1000000
                    // NULLIF(SUM(tokens_surviving) OVER (), 0) AS BIGINT)
                 AS mix_ppm
        FROM ps"""),
      "Post-dedup mixture accounting: per-source raw vs SURVIVING " +
        "docs/tokens under the near-dup representative rule, with " +
        "renormalized integer-ppm mixture weights — dedup changes the " +
        "mixture the trainer sees; this is the step that re-measures it " +
        "(pipeline ops brief)."),

    // -------------------------------------------- dedup cascade audit
    Q(
      "q168_dedup_cascade_audit",
      (s, dir) => {
        // The marginal-yield table of a staged cleaning cascade — what
        // each pass removes GIVEN everything before it: exact-dup (q34's
        // min-doc_id canonical rule) → MinHash near-dup (a doc falls iff
        // an mh_pair links it to a SMALLER stage-1 survivor — the
        // single-pass pair rule, deliberately not transitive closure, so
        // the oracle can replay it with one EXISTS) → benchmark
        // decontamination (q63's 5-gram rule). Real pipelines run the
        // passes in exactly this order (cheap-and-sure first); this is
        // the table that says what each one was worth.
        //
        // Scale shape: every arm is an already-proven geometry — one fp
        // window shuffle, the session-staged mh_pairs set (near-dup-
        // sized), the broadcast bench-gram probe over staged grams5.
        // Each doc gets ONE removal-stage label (the when-chain encodes
        // the cascade precedence), so the audit is a single aggregation
        // over the labeled corpus; the three report rows unfold from
        // that one row driver-side, never rescanning anything.
        val corpus = docs(s, dir).filter(col("doc_id") >= 10)
        val fpCol =
          md5(array_join(array_sort(tokens(normText(col("text")))), " "))
        // examined round-19: an eager localCheckpoint of this frame (the
        // q120 move — its fp pipeline is the same) read 0.81 -> 0.97 s in
        // the full bench; unlike q120's flags, the fp window here is
        // already stage-reused within the one job — left lazy
        val canon = corpus
          .select(col("doc_id"), fpCol.as("fp"))
          .withColumn("m",
            min(col("doc_id")).over(Window.partitionBy(col("fp"))))
          .select(col("doc_id"), (col("doc_id") === col("m")).as("keep1"))
        val s1 = canon.filter(col("keep1")).select(col("doc_id"))
        val removed2 = minhashPairs(s, dir)
          .join(s1.select(col("doc_id").as("i")), Seq("i"), "left_semi")
          .join(s1.select(col("doc_id").as("j")), Seq("j"), "left_semi")
          .select(col("j").as("doc_id")).distinct()
        val g5 = Grams.hashed(s, dir, 5)
        val benchG = g5.filter(col("doc_id") < 10).select("ng").distinct()
        val contaminated = g5.filter(col("doc_id") >= 10)
          .join(broadcast(benchG), "ng").select("doc_id").distinct()
        val labeled = corpus
          .select(col("doc_id"),
            coalesce(size(tokens(col("text"))), lit(0))
              .cast("long").as("tok"))
          .join(canon.select(col("doc_id"), col("keep1")), "doc_id")
          .join(removed2.withColumn("r2", lit(1)), Seq("doc_id"), "left_outer")
          .join(contaminated.withColumn("r3", lit(1)), Seq("doc_id"),
            "left_outer")
          .select(col("tok"),
            when(!col("keep1"), 1L)
              .when(col("r2") === 1, 2L)
              .when(col("r3") === 1, 3L).as("rs"))
        labeled
          .agg(count(lit(1)).as("n0"),
            coalesce(sum(col("tok")), lit(0L)).as("t0"),
            coalesce(sum(when(col("rs") === 1, 1L).otherwise(0L)), lit(0L))
              .as("d1"),
            coalesce(sum(when(col("rs") === 1, col("tok")).otherwise(0L)),
              lit(0L)).as("k1"),
            coalesce(sum(when(col("rs") === 2, 1L).otherwise(0L)), lit(0L))
              .as("d2"),
            coalesce(sum(when(col("rs") === 2, col("tok")).otherwise(0L)),
              lit(0L)).as("k2"),
            coalesce(sum(when(col("rs") === 3, 1L).otherwise(0L)), lit(0L))
              .as("d3"),
            coalesce(sum(when(col("rs") === 3, col("tok")).otherwise(0L)),
              lit(0L)).as("k3"))
          .select(explode(expr("""array(
              struct(CAST(1 AS BIGINT) AS stage, 'exact_dup' AS rule,
                     n0 AS docs_in, t0 AS tokens_in,
                     d1 AS docs_removed, k1 AS tokens_removed),
              struct(CAST(2 AS BIGINT) AS stage, 'minhash_neardup' AS rule,
                     n0 - d1 AS docs_in, t0 - k1 AS tokens_in,
                     d2 AS docs_removed, k2 AS tokens_removed),
              struct(CAST(3 AS BIGINT) AS stage, 'decontamination' AS rule,
                     n0 - d1 - d2 AS docs_in, t0 - k1 - k2 AS tokens_in,
                     d3 AS docs_removed, k3 AS tokens_removed))"""))
            .as("r"))
          .select(col("r.stage"), col("r.rule"), col("r.docs_in"),
            col("r.tokens_in"), col("r.docs_removed"),
            col("r.tokens_removed"),
            (col("r.docs_in") - col("r.docs_removed")).as("docs_out"),
            (col("r.tokens_in") - col("r.tokens_removed")).as("tokens_out"))
      },
      Some(minhashPairsCte + """,
        dd AS (SELECT doc_id,
                      CAST(COALESCE(len(string_split(text, ' ')), 0)
                           AS BIGINT) AS tok
               FROM documents WHERE doc_id >= 10),
        canon AS (
          SELECT doc_id,
                 CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY
                        md5(array_to_string(list_sort(string_split(
                          trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                          ' ')), ' ')))
                      THEN 1 ELSE 0 END AS keep1
          FROM documents WHERE doc_id >= 10),
        s1 AS (SELECT doc_id FROM canon WHERE keep1 = 1),
        r2 AS (SELECT DISTINCT p.j AS doc_id
               FROM mh_pairs p
               JOIN s1 a ON p.i = a.doc_id
               JOIN s1 b ON p.j = b.doc_id),
        g5 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS ng5
               FROM tk, UNNEST(generate_series(1, len(t) - 4)) AS s(i)),
        bench AS (SELECT DISTINCT ng5 FROM g5 WHERE doc_id < 10),
        cont AS (SELECT DISTINCT g5.doc_id FROM g5
                 JOIN bench USING (ng5) WHERE g5.doc_id >= 10),
        lab AS (SELECT dd.tok,
                       CASE WHEN c.keep1 = 0 THEN 1
                            WHEN r2.doc_id IS NOT NULL THEN 2
                            WHEN ct.doc_id IS NOT NULL THEN 3 END AS rs
                FROM dd
                JOIN canon c USING (doc_id)
                LEFT JOIN r2 ON dd.doc_id = r2.doc_id
                LEFT JOIN cont ct ON dd.doc_id = ct.doc_id),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                     CAST(COALESCE(SUM(tok), 0) AS BIGINT) AS t0,
                     CAST(SUM(CASE WHEN rs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                     CAST(SUM(CASE WHEN rs = 1 THEN tok ELSE 0 END) AS BIGINT) AS k1,
                     CAST(SUM(CASE WHEN rs = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
                     CAST(SUM(CASE WHEN rs = 2 THEN tok ELSE 0 END) AS BIGINT) AS k2,
                     CAST(SUM(CASE WHEN rs = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
                     CAST(SUM(CASE WHEN rs = 3 THEN tok ELSE 0 END) AS BIGINT) AS k3
              FROM lab)
        SELECT CAST(1 AS BIGINT) AS stage, 'exact_dup' AS rule,
               n0 AS docs_in, t0 AS tokens_in, d1 AS docs_removed,
               k1 AS tokens_removed, n0 - d1 AS docs_out,
               t0 - k1 AS tokens_out
        FROM a
        UNION ALL
        SELECT 2, 'minhash_neardup', n0 - d1, t0 - k1, d2, k2,
               n0 - d1 - d2, t0 - k1 - k2
        FROM a
        UNION ALL
        SELECT 3, 'decontamination', n0 - d1 - d2, t0 - k1 - k2, d3, k3,
               n0 - d1 - d2 - d3, t0 - k1 - k2 - k3
        FROM a"""),
      "Dedup cascade audit: marginal docs/tokens removed by exact-dup -> " +
        "MinHash near-dup (smaller-surviving-pair rule) -> benchmark " +
        "decontamination, each pass conditioned on the previous one's " +
        "survivors; one labeled-corpus aggregation over already-staged " +
        "arms (pipeline ops brief: know what each cleaning pass was " +
        "worth)."),

    // ------------------------------------------ duplication-cap curation
    Q(
      "q169_dup_cap_curation",
      (s, dir) => {
        // Soft dedup (the RefinedWeb/C4 flavor): instead of collapsing
        // every exact-dup cluster to one canonical doc (q34), KEEP up to
        // MaxCopies copies per normalized fingerprint (doc_id order) —
        // bounded duplication preserves naturally popular content's
        // training weight while capping the pathological tail. Output is
        // the per-source curation accounting a recipe reads.
        //
        // Scale shape: one shuffle on the fingerprint (the window's
        // partition key — dup-cluster-sized groups, same bound as q34's
        // groupBy) carrying (source, tok) through; the per-source rollup
        // is a map-side-combined aggregation to |sources| rows.
        val MaxCopies = 3
        // null-text docs all hash to ONE shared null fingerprint (md5 of
        // null is null, and the window groups nulls together) — so the
        // 4th+ empty/null doc per corpus counts as a dropped duplicate.
        // Deliberate, and consistent with q34's canonical rule (which
        // collapses the same null group to its min doc_id): an empty doc
        // carries no content to distinguish copies by, so the copy cap
        // applies to the class as a whole (q173 documents its null-source
        // rule the same way).
        val fpCol =
          md5(array_join(array_sort(tokens(normText(col("text")))), " "))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        docs(s, dir)
          .select(col("doc_id"), col("source"), fpCol.as("fp"),
            coalesce(size(tokens(col("text"))), lit(0))
              .cast("long").as("tok"))
          .withColumn("keep",
            (row_number().over(w) <= MaxCopies).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("keep")).as("docs_kept"),
            (count(lit(1)) - sum(col("keep"))).as("docs_dropped"),
            sum(col("tok") * col("keep")).as("tokens_kept"),
            sum(col("tok") * (lit(1L) - col("keep"))).as("tokens_dropped"))
      },
      Some("""
        WITH f AS (
          SELECT doc_id, source,
                 CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT)
                   AS tok,
                 md5(array_to_string(list_sort(string_split(
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                   ' ')), ' ')) AS fp
          FROM documents),
        r AS (SELECT source, tok,
                     CASE WHEN row_number() OVER (PARTITION BY fp
                            ORDER BY doc_id) <= 3
                          THEN 1 ELSE 0 END AS keep
              FROM f)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS docs_kept,
               CAST(COUNT(*) - SUM(keep) AS BIGINT) AS docs_dropped,
               CAST(SUM(tok * keep) AS BIGINT) AS tokens_kept,
               CAST(SUM(tok * (1 - keep)) AS BIGINT) AS tokens_dropped
        FROM r GROUP BY source"""),
      "Duplication-cap curation (soft dedup): keep up to 3 copies per " +
        "normalized fingerprint by doc_id order — q34's rule relaxed to " +
        "a copy budget — with per-source kept/dropped docs+tokens; one " +
        "fingerprint-window shuffle + a tiny source rollup (pipeline " +
        "ops brief: cap the dup tail without flattening popularity)."))
}
