package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.Envelopes
import graft.queries.Dwd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Events-table-shaped fixture row for the log-envelope synthesizer. */
final case class LogEv(
    event_id: Long, user_id: Long, event_type: String, props: String, ts: Timestamp)

/** The DWD-log vertical under real streaming: the D1 split's per-micro-batch
  * output must equal the batch q26 transformation over the same rows
  * (stateless 1:1), and the ST1-repair → keyword-window composition must
  * produce the hand-computed windowed counts.
  */
class DwdLogStreamSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // view k=5 → page + 2 displays; error → err; signup → start;
  // click k=1 → page + 1 action; view k=0 → page only; purchase → page
  private val fixtureBatches: Seq[Seq[LogEv]] = Seq(
    Seq(
      LogEv(1, 10, "view", """{"k":5}""", ts(5)),
      LogEv(2, 10, "error", """{"k":3}""", ts(6)),
      LogEv(3, 11, "signup", """{"k":7}""", ts(7))),
    Seq(
      LogEv(4, 11, "click", """{"k":1}""", ts(15)),
      LogEv(5, 12, "view", """{"k":0}""", ts(16)),
      LogEv(6, 12, "purchase", """{"k":2}""", ts(17))))

  private def parsed(df: DataFrame): DataFrame =
    Envelopes.parseLog(Envelopes.logFromEvents(df))

  test("D1 streaming split equals the batch q26 transformation per micro-batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LogEv]
    val perBatch =
      scala.collection.concurrent.TrieMap.empty[Long, Seq[(String, Long, Long)]]
    val q = DwdLogStream.split(parsed(input.toDF()))
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        perBatch(id) = b.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        ()
      }
      .start()
    try fixtureBatches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    for ((batch, i) <- fixtureBatches.zipWithIndex) {
      val expected = Dwd.logSplit(parsed(batch.toDF()))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(expected.nonEmpty)
      assert(perBatch.getOrElse(i.toLong, Seq.empty).sorted == expected.sorted,
        s"micro-batch $i diverges from the batch split")
    }
    // every one of the five streams was exercised across the fixture
    val streams = perBatch.values.flatten.map(_._1).toSet
    assert(streams == Set("err", "start", "page", "display", "action"))
  }

  test("ST1 repair feeds the keyword window downstream of the split") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LogEv]
    val topo = DwdLogStream.keywordWindow(
      StatefulOps.newVisitorRepair(DwdLogStream.pageViews(parsed(input.toDF()))))
    val q = topo.writeStream
      .format("memory").queryName("dwd_log_kw").outputMode("append").start()
    val wake = Seq(LogEv(99, 99, "view", """{"k":0}""", ts(1000)))
    try (fixtureBatches :+ wake).foreach { b =>
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dwd_log_kw")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // pages tokenize their page_id (= event_type): window [0,10s) holds the
    // first view; [10,20s) holds click/view/purchase; the wake page's own
    // window never finalizes under append mode
    assert(out == Set(
      ("1970-01-01 00:00:00", "view", 1L),
      ("1970-01-01 00:00:10", "click", 1L),
      ("1970-01-01 00:00:10", "view", 1L),
      ("1970-01-01 00:00:10", "purchase", 1L)))
  }
}
