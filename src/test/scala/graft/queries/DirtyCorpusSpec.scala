package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Robustness of the documents-table operators on a DIRTY corpus — null
  * text, empty text, whitespace-only, and docs shorter than the gram
  * sizes. The driver fixtures contain none of these, but a real corpus is
  * full of them; an engine that NPEs on a null text column does not
  * survive first contact with 100 TB of crawl data. Asserts every
  * documents-only query executes, plus targeted semantics for the
  * interesting cases (gram-less docs pair with nothing; exact dedup
  * groups the two empty-ish docs; token counts are zero, not negative).
  */
class DirtyCorpusSpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val dir = Files.createTempDirectory("graft_dirty_").toString
    import spark.implicits._
    val rows = Seq(
      (0L, null.asInstanceOf[String], "en", "src0"),
      (1L, "", "en", "src0"),
      (2L, "   ", "de", "src1"),
      (3L, "one", "fr", "src1"),                    // below every gram size
      (4L, "two tokens", null.asInstanceOf[String], "src2"), // null lang
      (5L, "three token doc", "en", null.asInstanceOf[String]), // null source
      (6L, "a normal document with enough tokens to shingle properly " +
        "and a vocabulary of its own", "en", "src2"),
      (7L, "a normal document with enough tokens to shingle properly " +
        "and a vocabulary of its own", "en", "src2")) // exact dup of 6
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        coalesce(length(col("text")), lit(0L)).cast("long"))
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  // every registered query that reads ONLY the documents table
  private val docQueries = Seq(
    "q32_text_stats", "q33_langid", "q34_exact_dedup", "q35_ngram_jaccard",
    "q36_minhash_band_dedup", "q37_simhash", "q48_fuzzy_prefix_match",
    "q52_chunk_fingerprint_dedup", "q57_neardup_cluster",
    "q58_stratified_sample", "q59_pii_redact", "q60_repetition_filter",
    "q61_bpe_pretokenize", "q63_decontamination", "q64_rare_token_ratio",
    "q66_tfidf_keywords", "q78_cluster_representative", "q79_length_deciles",
    "q81_domain_mix", "q87_sequence_packing", "q90_leakage_safe_split",
    "q95_pagerank_neardup", "q96_repeated_ngram_dedup", "q97_triangle_count",
    "q99_temperature_mix", "q102_relative_rank", "q107_weighted_sample",
    "q118_chunk_index", "q119_containment_dedup", "q120_recipe_funnel",
    "q121_dsir_importance", "q122_unigram_surprisal", "q123_padding_waste",
    "q124_lsh_recall_audit", "q125_incremental_dedup", "q126_simhash_neardup",
    "q127_cms_heavy_hitters", "q130_bloom_decontamination",
    "q132_bloom_decon_sized", "q134_linear_counting", "q135_priority_sample",
    "q138_logq_sketch", "q139_kmv_overlap", "q148_source_contamination",
    "q149_dup_span_merge", "q150_token_budget_select",
    "q151_curriculum_schedule", "q152_wav_header_meta",
    "q153_gram_novelty", "q155_dedup_removal_plan",
    "q156_training_export_manifest",
    // rounds 15-16 (q158 is omitted as driver-local-only — it reads no
    // corpus table; this dirty vocabulary still supports q164/q166's 12
    // merge rounds, and the merge-STARVED corpus gets its own fail-loud
    // contract leg below)
    "q157_mp4_header_meta", "q159_paragraph_dedup",
    "q160_quality_threshold_sweep", "q161_vocab_coverage_plan",
    "q162_export_shard_plan", "q163_image_perceptual_neardup",
    "q164_bpe_merge_train", "q165_bigram_surprisal", "q166_bpe_encode",
    "q167_context_length_plan", "q168_dedup_cascade_audit",
    "q169_dup_cap_curation", "q171_tokenizer_fertility",
    "q172_epoch_repeat_plan", "q173_boilerplate_removal",
    "q174_quality_rule_battery", "q175_contamination_sweep",
    // round 17 (q176 on this corpus writes an EMPTY shard tree — every
    // doc_id is bench-side < 10 — which must publish and roll up to
    // zero rows, not fail on schema inference; q177 synthesizes its WAVs
    // from doc_id alone, so dirty text never reaches it — included for
    // the execute-everything contract)
    "q176_export_shard_write", "q177_audio_perceptual_neardup",
    // q179 tolerates a starved vocabulary gracefully (unlike q164's
    // fail-loud contract): prune caps are maxima, and the single-char
    // floor keeps every word segmentable
    "q179_unigram_lm_vocab",
    // round 18: q182 synthesizes its frame payloads from doc_id alone
    // (the q177 rule) — included for the execute-everything contract
    "q182_video_perceptual_neardup")

  test("every documents-only query executes on the dirty corpus") {
    val failures = docQueries.flatMap { name =>
      try { graft.SparkEntry.queries(name)(spark, dirtyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q164/q166 fail LOUD, not silently short, on a merge-starved " +
    "vocabulary (a corpus that cannot support 12 merges)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_starved_").toString
    // one two-char word: round 1 merges (a,b) -> [ab]; round 2 has no
    // pairs left anywhere — the documented IllegalStateException, never
    // a silently short merge table
    Seq((1L, "ab")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    for (q <- Seq("q164_bpe_merge_train", "q166_bpe_encode")) {
      val e = intercept[IllegalStateException] {
        graft.SparkEntry.queries(q)(spark, dir).count()
      }
      assert(e.getMessage.contains("pair statistics exhausted"),
        s"$q: wrong failure mode: ${e.getMessage}")
    }
  }

  test("gram-less and null docs pair with nothing; the exact dup is found") {
    import spark.implicits._
    // near-dup candidates: only the planted exact pair (6,7) can collide
    val pairs = graft.SparkEntry.queries("q36_minhash_band_dedup")(spark, dirtyDir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((6L, 7L)))
    // exact dedup: TWO dup groups — the planted pair (6,7) AND the
    // empty/whitespace docs (1,2), which normalize to the same empty
    // fingerprint (collapsing blank docs is the desired behavior)
    val dups = graft.SparkEntry.queries("q34_exact_dedup")(spark, dirtyDir)
      .filter(col("dup_cnt") === 2)
      .select(col("canonical_id")).collect().map(_.getLong(0)).toSet
    assert(dups == Set(1L, 6L))
    // SimHash near-dup (token-level signatures): the planted pair must
    // surface, the empty and whitespace-only docs are token-identical
    // (both reduce to the empty token) so they may pair with each other —
    // but NO pair may bridge a blank doc (0-2) and a content doc (3-7),
    // and the null-text doc pairs with nothing
    val sh = graft.SparkEntry.queries("q126_simhash_neardup")(spark, dirtyDir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(sh.contains((6L, 7L)))
    assert(!sh.exists { case (i, j) => i <= 2L && j >= 3L })
    assert(!sh.exists { case (i, j) => i == 0L || j == 0L })
  }

  test("token accounting on dirty docs is zero-or-positive, never negative") {
    import spark.implicits._
    // null text propagates null (SQL semantics, matching the DuckDB
    // oracle's len(string_split(NULL))); what must NEVER appear is the
    // legacy size()=-1 sentinel leaking into counts
    val stats = graft.SparkEntry.queries("q32_text_stats")(spark, dirtyDir)
      .select(col("doc_id"), col("n_tokens")).as[(Long, Option[Long])]
      .collect().toMap
    assert(stats.values.forall(_.forall(_ >= 0L)), stats.toString)
    // q87 packs null text as zero tokens rather than crashing the typed
    // prefix sum — its bins must cover all 8 docs
    val packed = graft.SparkEntry.queries("q87_sequence_packing")(spark, dirtyDir)
      .agg(sum(col("n_docs_starting"))).collect()(0).getLong(0)
    assert(packed == 8L)
  }
}
