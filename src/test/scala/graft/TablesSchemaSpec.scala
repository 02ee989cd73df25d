package graft

import org.apache.spark.sql.types._

/** Schema-drift canary (round-8 VERDICT directive #3).
  *
  * The driver regenerates /root/testdata between rounds, and the parquet
  * encoding of `events.ts` has already drifted once — TIMESTAMP(NANOS) in
  * rounds 1-7, TIMESTAMP(MICROS, isAdjustedToUTC=false) from round 8 —
  * which surfaced as ten scattered analysis errors instead of one
  * diagnosis. This suite pins the POST-LOADER contract every query relies
  * on: whatever the file says, `Tables(spark, sf, "events")` surfaces `ts`
  * as session-TZ `TimestampType`, and the other envelope columns keep
  * their types. The failure message names the raw parquet type found, so
  * the next silent regeneration fails in ONE named test with the fix
  * location (Tables.apply) in the message.
  */
class TablesSchemaSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def rawTsType(sfDir: String): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
  }

  test("events.ts is TimestampType after the loader, at every sf") {
    sfDirs.foreach { sfDir =>
      val got = Tables(spark, sfDir, "events").schema("ts").dataType
      assert(got == TimestampType,
        s"$sfDir/events.parquet: loader surfaced ts as $got (raw parquet " +
          s"type: ${rawTsType(sfDir)}). The driver likely regenerated " +
          "testdata with a new ts encoding — add a branch in Tables.apply " +
          "normalizing it to TimestampType.")
    }
  }

  test("streaming file source surfaces normalized ts and delivers rows") {
    // The StreamDemo crash mode the round-9 ADVICE flagged: the streamed
    // events schema comes from a batch read, so it drifts with the file
    // encoding exactly like the batch path. fileStream now routes through
    // Tables.normalizeTs — pin the post-source type at analysis AND smoke
    // one micro-batch end-to-end so the read path itself is exercised.
    val sfDir = sfDirs.head
    val src = graft.sources.Sources.fileStream(spark, sfDir, "events",
      maxFilesPerTrigger = Int.MaxValue)
    assert(src.schema("ts").dataType == TimestampType,
      s"fileStream surfaced ts as ${src.schema("ts").dataType} (raw parquet " +
        s"type: ${rawTsType(sfDir)}) — Tables.normalizeTs needs a branch for it")
    val q = src.writeStream.format("memory").queryName("ts_smoke")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val rows = spark.table("ts_smoke").count()
    assert(rows > 0, "streamed events delivered no rows")
    assert(spark.table("ts_smoke").schema("ts").dataType == TimestampType)
  }

  test("events envelope columns keep their contracted types") {
    val expected = Map(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
    sfDirs.foreach { sfDir =>
      val schema = Tables(spark, sfDir, "events").schema
      expected.foreach { case (name, dt) =>
        assert(schema.fieldNames.contains(name),
          s"$sfDir/events.parquet lost column $name (schema: ${schema.simpleString})")
        assert(schema(name).dataType == dt,
          s"$sfDir/events.parquet column $name drifted to " +
            s"${schema(name).dataType} (expected $dt)")
      }
    }
  }

  test("documents and embeddings keep their contracted types") {
    val docExpected = Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    val embExpected = Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    sfDirs.foreach { sfDir =>
      val docs = Tables(spark, sfDir, "documents").schema
      docExpected.foreach { case (name, dt) =>
        assert(docs(name).dataType == dt,
          s"$sfDir/documents.parquet column $name drifted to " +
            s"${docs(name).dataType} (expected $dt)")
      }
      val emb = Tables(spark, sfDir, "embeddings").schema
      embExpected.foreach { case (name, dt) =>
        // containsNull/nullable flags are driver-writer details; compare
        // the element types the queries actually depend on
        val got = emb(name).dataType match {
          case ArrayType(e, _) => ArrayType(e)
          case other => other
        }
        assert(got == dt,
          s"$sfDir/embeddings.parquet column $name drifted to " +
            s"${emb(name).dataType} (expected $dt)")
      }
    }
  }
}
