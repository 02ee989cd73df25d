package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** StreamingMixture ≡ batch q147 (round-11 VERDICT directive #5): an
  * arriving batch updates the per-source surviving-token mixture without a
  * corpus rescan, with exact retraction when a late arrival bridges
  * components.
  */
class StreamingMixtureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private type MixRow = (Option[String], Long, Long, Long, Long, Option[Long])

  private def rowsOf(df: DataFrame): Set[MixRow] =
    df.collect().map(r => (Option(r.getString(0)), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet

  private def q147(dir: String): Set[MixRow] =
    rowsOf(graft.SparkEntry.queries("q147_post_dedup_mixture")(spark, dir))

  private def docsSorted: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def batchesBy(asc: Boolean, n: Int): Seq[DataFrame] = {
    val ids = docsSorted.select("doc_id").collect().map(_.getLong(0)).sorted
    val ordered = if (asc) ids else ids.reverse
    ordered.grouped((ids.length + n - 1) / n).toSeq.map { chunk =>
      docsSorted.filter(col("doc_id").isin(chunk.toSeq: _*))
        .select(col("doc_id"), col("source"), col("text"))
    }
  }

  test("in-order ingest: streamed mixture equals batch q147 after EVERY " +
    "prefix (incremental correctness, not just final agreement)") {
    val st = StreamingMixture.state(spark)
    val batches = batchesBy(asc = true, n = 3)
    val maxIds = batches.map(_.agg(max("doc_id")).head().getLong(0))
    batches.zip(maxIds).zipWithIndex.foreach { case ((b, maxId), i) =>
      st.ingest(b)
      // batch q147 on the same prefix corpus, staged in its own dir
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_mix_prefix_$i").toString
      docsSorted.filter(col("doc_id") <= maxId)
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      assert(rowsOf(st.mixture()) == q147(dir),
        s"prefix ${i + 1}/${batches.size} diverged from batch q147")
    }
  }

  test("adversarial descending ingest: every component's min arrives " +
    "LAST (maximal retraction) — final mixture still equals batch q147") {
    val st = StreamingMixture.state(spark)
    val batches = batchesBy(asc = false, n = 4)
    // survivors after the first batch, by doc — some must FLIP to
    // duplicate later (their component's true min has not arrived yet)
    st.ingest(batches.head)
    val earlySurvivors = st.ledgerFrame
      .filter(col("rep") === col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    batches.tail.foreach(st.ingest)
    assert(rowsOf(st.mixture()) == q147(sfDir))
    val finalSurvivorsOfEarly = st.ledgerFrame
      .filter(col("doc_id").isin(earlySurvivors.toSeq: _*) &&
        col("rep") === col("doc_id"))
      .count()
    // retraction really happened: the corpus has near-dup components that
    // span batches, and under descending arrival their minima arrive after
    // their members — so some early survivor must have been retracted
    assert(finalSurvivorsOfEarly < earlySurvivors.size,
      "no survivor was ever retracted — the adversarial leg exercised " +
        "nothing (corpus drift? batch split too coarse?)")
  }

  test("foreachBatch wiring: the same ingest runs under a real " +
    "StreamingQuery and matches batch q147") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val st = StreamingMixture.state(spark)
    val q = StreamingMixture.attach(
      input.toDS().toDF("doc_id", "source", "text"), st)
    try {
      val rows = docsSorted.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      rows.grouped(200).foreach { b =>
        input.addData(b.toSeq)
        q.processAllAvailable()
      }
      assert(rowsOf(st.mixture()) == q147(sfDir))
    } finally q.stop()
  }

  test("kill-and-resume: a state restored from the two durable stores " +
    "continues ingesting and matches batch q147 (one-scan restart)") {
    val batches = batchesBy(asc = true, n = 4)
    val st1 = StreamingMixture.state(spark)
    batches.take(2).foreach(st1.ingest)
    // "crash": rebuild from the persisted stores (round-trip through
    // parquet, as a deployment's checkpoint would)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mix_resume_").toString
    st1.bandsFrame.write.parquet(s"$dir/bands")
    st1.ledgerFrame.write.parquet(s"$dir/ledger")
    val st2 = StreamingMixture.restore(spark,
      spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/ledger"))
    assert(rowsOf(st2.mixture()) == rowsOf(st1.mixture()),
      "restored aggregates diverge from the live state's")
    batches.drop(2).foreach(st2.ingest)
    assert(rowsOf(st2.mixture()) == q147(sfDir))
  }

  test("zero-surviving-token corpus: mix_ppm is NULL, never a crash — " +
    "q147's zero-guard, shared") {
    import spark.implicits._
    val st = StreamingMixture.state(spark)
    st.ingest(Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "b", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text"))
    val m = st.mixture().collect()
    assert(m.length == 2)
    assert(m.forall(_.isNullAt(5)), "mix_ppm must be NULL at zero tokens")
    assert(m.forall(r => r.getLong(2) == 1L)) // gram-less docs survive
  }
}
