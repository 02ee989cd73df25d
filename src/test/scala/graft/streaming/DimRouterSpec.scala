package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.DimRouter.TableConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Drives the DIM router end-to-end over a streaming Maxwell feed: config
  * routing, column pruning, dirty side sink, auto table creation, and
  * keep-latest upsert across microbatches.
  */
class DimRouterSpec extends SparkSpec {

  private def mkJson(table: String, typ: String, id: Int, name: String, extra: String = ""): String =
    s"""{"database":"gmall","table":"$table","type":"$typ","ts":"0",
       |"data":{"id":"$id","name":"$name","secret":"x"$extra}}""".stripMargin.replace("\n", "")

  test("DimRouter routes, prunes, upserts keep-latest, and side-sinks dirty rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = Files.createTempDirectory("dims").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val cfgs = Seq(
      TableConfig("base_dic", "dim_base_dic", Seq("id", "name")),
      TableConfig("user_info", "dim_user_info", Seq("id")))

    val input = MemoryStream[String]
    val q = DimRouter.run(input.toDF().withColumnRenamed("value", "value_json"),
      () => cfgs, outDir, ckpt)
    try {
      input.addData(Seq(
        mkJson("base_dic", "insert", 1, "cash"),
        mkJson("base_dic", "insert", 2, "card"),
        mkJson("user_info", "insert", 7, "u7"),
        mkJson("ignored_table", "insert", 9, "zz"),     // not configured: dropped
        mkJson("base_dic", "bootstrap-start", 0, "x"),  // P2: marker filtered
        """not even json"""))                           // K6: dirty sink
      q.processAllAvailable()
      input.addData(Seq(
        mkJson("base_dic", "update", 1, "cash_v2"),     // K4: supersedes id=1
        mkJson("base_dic", "insert", 3, "voucher")))
      q.processAllAvailable()
    } finally q.stop()

    val dic = spark.read.parquet(s"$outDir/dim_base_dic")
    assert(dic.columns.toSet == Set("id", "name", "row_op_ts")) // P9: secret pruned
    val byId = dic.select("id", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map("1" -> "cash_v2", "2" -> "card", "3" -> "voucher"))

    val users = spark.read.parquet(s"$outDir/dim_user_info")
    assert(users.columns.toSet == Set("id", "row_op_ts"))
    assert(users.select("id").as[String].collect().toSeq == Seq("7"))

    val dirty = spark.read.parquet(s"$outDir/_dirty")
    assert(dirty.count() == 1)

    // unconfigured table never materialized (K5 creates only on config)
    assert(!new java.io.File(s"$outDir/dim_ignored_table").exists())
  }

  test("configFromDebezium folds c/u/d ops into the live config set") {
    import spark.implicits._
    def dz(op: String, before: String, after: String): String = {
      val b = if (before == null) "null"
        else s"""{"source_table":"$before","sink_table":"dim_$before","sink_columns":"id","sink_pk":"id"}"""
      val a = if (after == null) "null"
        else s"""{"source_table":"$after","sink_table":"dim_$after","sink_columns":"id,name","sink_pk":"id"}"""
      s"""{"before":$b,"after":$a,"op":"$op"}"""
    }
    val feed = Seq(
      dz("r", null, "base_dic"),      // snapshot read
      dz("c", null, "user_info"),     // created
      dz("u", "base_dic", "base_dic"),// updated (columns refreshed)
      dz("c", null, "sku_info"),
      dz("d", "sku_info", null))      // deleted: must drop out
      .toDF("value_json")
    val live = DimRouter.configFromDebezium(feed)
    assert(live.map(_.sourceTable).sorted == Seq("base_dic", "user_info"))
    assert(live.forall(_.sinkColumns == Seq("id", "name")))
    assert(live.forall(_.sinkPk == "id"))
  }
}