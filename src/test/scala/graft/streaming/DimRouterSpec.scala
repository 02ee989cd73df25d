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
    // P9: secret pruned; src_ts/src_seq are the arrival-order stamps, pkb
    // the hash-bucket partition column
    assert(dic.columns.toSet ==
      Set("id", "name", "row_op_ts", "src_ts", "src_seq", "pkb"))
    val byId = dic.select("id", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map("1" -> "cash_v2", "2" -> "card", "3" -> "voucher"))

    val users = spark.read.parquet(s"$outDir/dim_user_info")
    assert(users.columns.toSet ==
      Set("id", "row_op_ts", "src_ts", "src_seq", "pkb"))
    assert(users.select("id").as[String].collect().toSeq == Seq("7"))

    val dirty = spark.read.parquet(s"$outDir/_dirty")
    assert(dirty.count() == 1)

    // unconfigured table never materialized (K5 creates only on config)
    assert(!new java.io.File(s"$outDir/dim_ignored_table").exists())
  }

  test("upsert resolves two versions of a pk in ONE microbatch by stream order") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("dims1b").toString
    val cfgs = Seq(TableConfig("base_dic", "dim_base_dic", Seq("id", "name")))
    // insert then update for id=5 in the same batch: row_op_ts ties (one
    // stamp per microbatch) and the envelope ts also ties — src_seq
    // (ingest arrival order) must pick the update
    val batch = Seq(
      mkJson("base_dic", "insert", 5, "first"),
      mkJson("base_dic", "update", 5, "second")).toDF("value_json")
    DimRouter.routeBatch(batch, cfgs, outDir)
    val rows = spark.read.parquet(s"$outDir/dim_base_dic")
      .select("id", "name").collect().map(r => r.getString(0) -> r.getString(1))
    assert(rows.toSeq == Seq("5" -> "second"))
  }

  test("bucketed upsert rewrites ONLY buckets containing batch keys") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("dims2b").toString
    val cfgs = Seq(TableConfig("base_dic", "dim_base_dic", Seq("id", "name")))
    val ids = 1 to 40
    DimRouter.routeBatch(
      ids.map(i => mkJson("base_dic", "insert", i, s"v$i")).toDF("value_json"),
      cfgs, outDir)
    def partFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(s"$outDir/dim_base_dic")
      root.listFiles().filter(_.getName.startsWith("pkb=")).map { d =>
        d.getName -> d.listFiles().map(f => f.getName + ":" + f.lastModified())
          .toSet
      }.toMap
    }
    val before = partFiles()
    assert(before.size > 1, s"expected multiple buckets, got ${before.keySet}")
    // update a single key: exactly one bucket directory may change
    DimRouter.routeBatch(
      Seq(mkJson("base_dic", "update", 7, "v7b")).toDF("value_json"),
      cfgs, outDir)
    val after = partFiles()
    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Set()))
    assert(changed.size == 1, s"buckets rewritten: $changed")
    // and the merged table is still complete + updated
    val byId = spark.read.parquet(s"$outDir/dim_base_dic")
      .select("id", "name").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId.size == 40 && byId("7") == "v7b" && byId("8") == "v8")
  }

  test("configFromDebezium folds by ts_ms even when row order is scrambled") {
    import spark.implicits._
    def dz(op: String, before: String, after: String, tsMs: Long): String = {
      val b = if (before == null) "null"
        else s"""{"source_table":"$before","sink_table":"dim_$before","sink_columns":"id","sink_pk":"id"}"""
      val a = if (after == null) "null"
        else s"""{"source_table":"$after","sink_table":"dim_$after","sink_columns":"id,name","sink_pk":"id"}"""
      s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$tsMs}"""
    }
    // history: create sku_info (t=1), delete it (t=2), create user_info
    // (t=3). Scrambled across 4 partitions: only ts_ms ordering can tell
    // the delete came after the create.
    val feed = Seq(
      dz("d", "sku_info", null, 2),
      dz("c", null, "user_info", 3),
      dz("c", null, "sku_info", 1))
      .toDF("value_json").repartition(4)
    val live = DimRouter.configFromDebezium(feed)
    assert(live.map(_.sourceTable) == Seq("user_info"),
      s"fold order wrong: ${live.map(_.sourceTable)}")
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