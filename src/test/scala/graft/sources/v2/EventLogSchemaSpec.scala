package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Schema evolution ([[EventLogSchema]]): ALTER-style additive BIGINT
  * columns — old files read under the new schema with null fill,
  * extended appends round-trip, version-pinned tables keep their own
  * narrower schema, incompatible changes (drop/retype/non-identifier)
  * refuse loudly, and every pipeline (compaction, z-order, merge, the
  * typed CDC feed) carries the added lanes. */
class EventLogSchemaSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private def baseRows = (1 to 6).map(i =>
    (i.toLong, i * 1000L, i.toLong, if (i % 2 == 0) "a" else "b", i * 100L))

  private def store(): String = {
    val dir = Files.createTempDirectory("gelsc").toString
    baseRows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  test("add column → extended append → old files null-fill, new files carry values") {
    val dir = store() // version 1, base wire
    EventLogSchema.addColumn(dir, "flags")
    // the table schema grew
    val schema = spark.read.format("graft-eventlog").load(dir).schema
    assert(schema.fieldNames.toSeq ==
      Seq("event_id", "ts_us", "user_id", "event_type", "cents", "flags"))
    assert(schema("flags").nullable)
    // extended append (one null value in the lane)
    Seq((10L, Day + 1L, 9L, "a", 1L, Some(7L)),
        (11L, Day + 2L, 9L, "b", 2L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    val got = spark.read.format("graft-eventlog").load(dir)
      .select("event_id", "flags")
      .as[(Long, Option[Long])].collect().toMap
    assert((1L to 6L).forall(got(_).isEmpty), "old files must null-fill")
    assert(got(10L).contains(7L) && got(11L).isEmpty)
    // base columns still read exactly through both wire forms
    assert(spark.read.format("graft-eventlog").load(dir)
      .agg(sum("cents")).head.getLong(0) ==
      baseRows.map(_._5).sum + 3L)
    // and a base-only frame still appends (legacy wire, null-filled)
    Seq((20L, 5L, 1L, "a", 9L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 20L).select("flags").head.isNullAt(0))
  }

  // ------------- round 11: DOUBLE and STRING added-column lanes -------------

  test("DOUBLE and STRING columns: extended append, null-fill, typed filters") {
    val dir = store()
    EventLogSchema.addColumn(dir, "score",
      org.apache.spark.sql.types.DoubleType)
    EventLogSchema.addColumn(dir, "tag",
      org.apache.spark.sql.types.StringType)
    Seq((10L, Day + 1L, 9L, "a", 1L, Some(2.5), Some("hot")),
        (11L, Day + 2L, 9L, "b", 2L, None, Some("cold")),
        (12L, Day + 3L, 9L, "a", 3L, Some(-0.25), None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents",
        "score", "tag")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    val df = spark.read.format("graft-eventlog").load(dir)
    assert(df.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.schema("tag").dataType ==
      org.apache.spark.sql.types.StringType)
    val got = df.where(col("event_id") >= 10)
      .select("event_id", "score", "tag")
      .as[(Long, Option[Double], Option[String])].collect().toSet
    assert(got == Set((10L, Some(2.5), Some("hot")),
      (11L, None, Some("cold")), (12L, Some(-0.25), None)), got.toString)
    // old files null-fill both lanes
    assert(df.where(col("event_id") === 1).select("score", "tag")
      .collect().forall(r => r.isNullAt(0) && r.isNullAt(1)))
    // typed predicates evaluate on the decoded lanes
    assert(df.where(col("score") > 0).select("event_id").as[Long]
      .collect().toSeq == Seq(10L))
    assert(df.where(col("tag") === "cold").select("event_id").as[Long]
      .collect().toSeq == Seq(11L))
  }

  test("typed lanes ride compaction, merge (both paths), DV deletes, and the typed CDC feed") {
    def build(): String = {
      val dir = Files.createTempDirectory("gelsc").toString
      baseRows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
      EventLogSchema.addColumn(dir, "score",
        org.apache.spark.sql.types.DoubleType)
      EventLogSchema.addColumn(dir, "tag",
        org.apache.spark.sql.types.StringType)
      Seq((10L, Day + 1L, 9L, "a", 10L, Some(1.5), Some("x")),
          (11L, Day + 2L, 9L, "a", 20L, None, Some("y")))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents",
          "score", "tag")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
      dir
    }
    def lanes(dir: String): Map[Long, (Option[Double], Option[String])] =
      spark.read.format("graft-eventlog").load(dir)
        .select("event_id", "score", "tag")
        .as[(Long, Option[Double], Option[String])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    // merge path parity with typed lanes: update 10's lanes, insert 50
    val upd = Seq((10L, Day + 5L, 9L, "a", 99L, Some(7.75), Some("z")),
      (50L, Day + 9L, 9L, "new", 5L, None, None))
    val cols = Seq("event_id", "ts_us", "user_id", "event_type", "cents",
      "score", "tag")
    val dirB = build(); val dirS = build()
    val stB = EventLogMerge.upsert(spark, dirB, upd.toDF(cols: _*))
    val stS = EventLogMerge.upsertShuffle(spark, dirS, upd.toDF(cols: _*))
    assert(stB.matched == 1 && stB.inserted == 1)
    assert(stS.matched == 1 && stS.inserted == 1)
    val expect = Map(
      10L -> (Some(7.75), Some("z")), 11L -> (None, Some("y")),
      50L -> (None, None)) ++
      baseRows.map(r => r._1 -> (None, None)).toMap
    assert(lanes(dirB) == expect, s"broadcast merge lanes: ${lanes(dirB)}")
    assert(lanes(dirS) == expect, s"shuffle merge lanes: ${lanes(dirS)}")

    // the merge's typed CDC feed carries the typed lane values
    val v = EventLog.currentVersion(dirB)
    val feed = spark.read.format("graft-eventlog")
      .option("cdc.typed", "true")
      .option("changes.from", (v - 1).toString)
      .option("changes.to", v.toString)
      .load(dirB)
      .select("_change_type", "event_id", "score", "tag")
      .as[(String, Long, Option[Double], Option[String])].collect().toSet
    assert(feed.contains(("update_postimage", 10L, Some(7.75), Some("z"))),
      feed.toString)
    assert(feed.contains(("insert", 50L, None, None)), feed.toString)

    // compaction re-encodes dictionaries and double bits exactly
    EventLogCompact.compact(spark, dirB)
    assert(lanes(dirB) == expect, "lanes corrupted by compaction")

    // a DV delete keeps untouched rows' lanes intact
    val t = s"sctyped_${Integer.toHexString(dirB.hashCode)}"
    GraftCatalog.register(spark, t, dirB)
    spark.sql(s"DELETE FROM graft.$t WHERE event_id = 11")
    assert(lanes(dirB) == expect - 11L, "DV delete disturbed typed lanes")
  }

  test("typed refusals: unsupported types, and a frame with the wrong lane type") {
    val dir = store()
    intercept[IllegalArgumentException] {
      EventLogSchema.addColumn(dir, "b",
        org.apache.spark.sql.types.BooleanType)
    }
    EventLogSchema.addColumn(dir, "score",
      org.apache.spark.sql.types.DoubleType)
    // a BIGINT frame column against the DOUBLE registry is a SAFE
    // upcast: Spark's store-assignment coerces it before the writer —
    // the value lands as a double, not a refusal
    Seq((10L, 5L, 9L, "a", 1L, 3L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents",
        "score")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 10).select("score")
      .as[Double].head() == 3.0)
    // an UNSAFE frame type (string → double) refuses at analysis
    val e = intercept[Exception] {
      Seq((11L, 6L, 9L, "a", 1L, "abc"))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents",
          "score")
        .coalesce(1)
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("a truncating overwrite with an extended frame keeps its columns") {
    val dir = store()
    EventLogSchema.addColumn(dir, "flags")
    // the overwrite frame carries the added column — it was validated
    // against the registry, so the columns IT writes must stay visible
    // after the job resets version history (round-11 fix: the commit
    // used to delete the registry, orphaning the lanes it just wrote)
    Seq((50L, 1000L, 3L, "a", 10L, Some(42L)),
        (51L, 2000L, 4L, "b", 20L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    val df = spark.read.format("graft-eventlog").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("event_id", "ts_us", "user_id", "event_type", "cents", "flags"))
    val got = df.select("event_id", "flags")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(50L -> Some(42L), 51L -> None),
      s"added-column values written by the overwrite job were lost: $got")
    // the fresh history sees the column at every version (addedAt = 0)
    assert(EventLogSchema.read(dir) ==
      Seq(EventLogSchema.AddedCol("flags", 0L)))
    // a base-only FRAME overwriting an extended store resolves against
    // the table's extended schema (Spark pads the missing nullable
    // column) — the overwrite is extended with null lanes, so the
    // column survives the reset too, value-null
    Seq((60L, 1000L, 3L, "a", 10L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("overwrite").save(dir)
    val after = spark.read.format("graft-eventlog").load(dir)
    assert(after.schema.fieldNames.toSeq ==
      Seq("event_id", "ts_us", "user_id", "event_type", "cents", "flags"))
    assert(after.select("flags").head.isNullAt(0))
  }

  test("filters and aggregates work across mixed wire forms") {
    val dir = store()
    EventLogSchema.addColumn(dir, "score")
    Seq((10L, 10L, 9L, "a", 100L, Some(5L)), (11L, 20L, 9L, "a", 200L, Some(6L)))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "score")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    val df = spark.read.format("graft-eventlog").load(dir)
    assert(df.where(col("score") > 5).select("event_id")
      .as[Long].collect().toSeq == Seq(11L))
    assert(df.agg(sum("score")).head.getLong(0) == 11L)
    assert(df.where(col("event_type") === "a").count() ==
      baseRows.count(_._4 == "a") + 2)
    // metadata aggregates (no added columns involved) still push
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    df.groupBy("event_type").agg(count(lit(1)).as("n")).collect()
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() == g0 + 1)
  }

  test("a version-pinned table reads its own narrower schema") {
    val dir = store() // version 1
    EventLogSchema.addColumn(dir, "flags") // added AT version 1
    Seq((10L, 5L, 9L, "a", 1L, Some(3L)))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir) // version 2
    val name = s"sc_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    // version 1 predates the column's first value-bearing commit but
    // not the registration: the column was added AT version 1, so it
    // is visible there; a snapshot at version 1 simply has no values
    assert(spark.sql(s"SELECT * FROM graft.$name VERSION AS OF 1").schema
      .fieldNames.contains("flags"))
    // a column added at a LATER version is invisible to older pins
    EventLogSchema.addColumn(dir, "later")
    assert(!spark.sql(s"SELECT * FROM graft.$name VERSION AS OF 1").schema
      .fieldNames.contains("later"))
    assert(spark.read.format("graft-eventlog").load(dir).schema
      .fieldNames.contains("later"))
  }

  test("SQL ALTER TABLE ADD COLUMN rides the registry; drops/retypes refuse") {
    val dir = store()
    val name = s"scsql_${Integer.toHexString(dir.hashCode)}"
    GraftCatalog.register(spark, name, dir)
    spark.sql(s"ALTER TABLE graft.$name ADD COLUMN sql_flag BIGINT")
    assert(spark.table(s"graft.$name").schema.fieldNames
      .contains("sql_flag"))
    assert(EventLogSchema.read(dir).exists(_.name == "sql_flag"))
    // round 11: DOUBLE and STRING adds are now first-class lanes
    spark.sql(s"ALTER TABLE graft.$name ADD COLUMN sql_note STRING")
    spark.sql(s"ALTER TABLE graft.$name ADD COLUMN sql_score DOUBLE")
    assert(EventLogSchema.read(dir).map(c => c.name -> c.dtype).toMap ==
      Map("sql_flag" -> org.apache.spark.sql.types.LongType,
        "sql_note" -> org.apache.spark.sql.types.StringType,
        "sql_score" -> org.apache.spark.sql.types.DoubleType))
    // a type the fixed-width wire cannot carry still refuses
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$name ADD COLUMN b BOOLEAN")
    }
    assert(bad.getMessage.contains("BIGINT"))
    val drop = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$name DROP COLUMN sql_flag")
    }
    assert(drop.getMessage.contains("cannot drop"))
  }

  test("drop, retype, duplicates, and bad names refuse loudly") {
    val dir = store()
    EventLogSchema.addColumn(dir, "flags")
    intercept[UnsupportedOperationException] {
      EventLogSchema.dropColumn(dir, "flags")
    }
    intercept[UnsupportedOperationException] {
      EventLogSchema.retypeColumn(dir, "flags")
    }
    intercept[IllegalArgumentException] {
      EventLogSchema.addColumn(dir, "flags") // duplicate
    }
    intercept[IllegalArgumentException] {
      EventLogSchema.addColumn(dir, "cents") // base collision
    }
    intercept[IllegalArgumentException] {
      EventLogSchema.addColumn(dir, "_sneaky") // metadata space
    }
    intercept[IllegalArgumentException] {
      EventLogSchema.addColumn(dir, "bad name")
    }
    // a frame with a PARTIAL added set: Spark resolves it against the
    // table schema and null-fills the missing nullable column before
    // the builder sees it — the row lands with `more` null
    EventLogSchema.addColumn(dir, "more")
    Seq((10L, 5L, 9L, "a", 1L, Some(3L)))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    val row = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") === 10L)
      .select("flags", "more").head
    assert(row.getLong(0) == 3L && row.isNullAt(1))
  }

  test("merge carries lanes on extended stores; a narrower batch refuses, by contract") {
    val dir = store()
    EventLogSchema.addColumn(dir, "flags")
    // MERGE replaces whole rows: a base-only batch would silently null
    // every matched row's lanes — refused with the contract named
    val m = intercept[IllegalArgumentException] {
      EventLogMerge.upsert(spark, dir, Seq((1L, 1000L, 1L, "b", 0L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents"))
    }
    assert(m.getMessage.contains("flags"))
    // a full-width batch merges: update sets a lane, insert carries one
    val st = EventLogMerge.upsert(spark, dir, Seq(
      (1L, 1000L, 1L, "b", 55L, Some(9L)),
      (100L, 7L, 9L, "new", 1L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags"))
    assert(st.matched == 1 && st.inserted == 1, st.toString)
    val got = spark.read.format("graft-eventlog").load(dir)
      .select("event_id", "cents", "flags")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((55L, Some(9L))), s"merge lost the lane: $got")
    assert(got(100L) == ((1L, None)))
    // the TYPED feed serves the merge commit WITH lanes
    val v = EventLog.currentVersion(dir)
    val typed = spark.read.format("graft-eventlog")
      .option("cdc.typed", "true")
      .option("changes.from", (v - 1).toString)
      .option("changes.to", v.toString)
      .load(dir)
      .select("_change_type", "event_id", "flags")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(typed == Set(("update_preimage", 1L, None),
      ("update_postimage", 1L, Some(9L)), ("insert", 100L, None)))
    // the PLAIN changes feed and time travel still work
    assert(EventLog.changedEntries(dir, 0, v - 1).nonEmpty)
  }

  test("compaction and z-order carry added lanes through the rewrite") {
    val dir = Files.createTempDirectory("gelsc").toString
    // two fragmented extended appends into one day + a pre-add base
    // file: the merged day must preserve every lane value AND the
    // null fill of the base-wire rows
    baseRows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    EventLogSchema.addColumn(dir, "flags")
    Seq((10L, 30L, 9L, "a", 1L, Some(5L)), (11L, 40L, 9L, "b", 2L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    def state() = spark.read.format("graft-eventlog").load(dir)
      .select("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .as[(Long, Long, Long, String, Long, Option[Long])].collect().toSet
    val before = state()
    val st = EventLogCompact.compact(spark, dir)
    assert(st.groupsMerged == 1)
    assert(state() == before, "plain compaction dropped or moved lanes")
    // z-order (in-task AND forced-distributed) preserves lanes too
    val st2 = EventLogCompact.compact(spark, dir, maxRecordsPerFile = 3,
      zorder = true)
    assert(st2.groupsMerged == 1)
    assert(state() == before, "z-order dropped or moved lanes")
    val dir2 = Files.createTempDirectory("gelsc").toString
    // clone the store shape, force the distributed path with a tiny cap
    baseRows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir2)
    EventLogSchema.addColumn(dir2, "flags")
    Seq((10L, 30L, 9L, "a", 1L, Some(5L)), (11L, 40L, 9L, "b", 2L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir2)
    EventLogCompact.compact(spark, dir2, maxRecordsPerFile = 3,
      zorder = true, zorderDayCap = 2)
    val got2 = spark.read.format("graft-eventlog").load(dir2)
      .select("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .as[(Long, Long, Long, String, Long, Option[Long])].collect().toSet
    assert(got2 == before, "distributed z-order dropped or moved lanes")
  }

  test("the streaming SINK lands extended frames with their lanes, exactly-once") {
    val dir = store()
    EventLogSchema.addColumn(dir, "flags")
    // stage an extended frame as parquet, stream it through the sink
    val staging = new java.io.File(
      Files.createTempDirectory("gelsc_stage").toFile, "data").toString
    Seq((50L, Day + 1L, 9L, "a", 5L, Some(11L)),
        (51L, Day + 2L, 9L, "b", 6L, None))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .write.parquet(staging)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        EventLogSchema.schemaOf(dir, EventLog.TimeView.Current)
          .map(_.copy(nullable = true))))
      .parquet(staging)
      .writeStream.format("graft-eventlog")
      .option("checkpointLocation",
        Files.createTempDirectory("gelsc_sck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") >= 50L)
      .select("event_id", "flags")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(50L -> Some(11L), 51L -> None),
      s"the sink dropped or moved lanes: $got")
    // the pre-existing base rows still null-fill
    assert(spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") <= 6L && col("flags").isNull)
      .count() == baseRows.size)
  }

  test("the streaming SINK lands TYPED lanes (double bits + string dictionaries) per epoch") {
    val dir = store()
    EventLogSchema.addColumn(dir, "score",
      org.apache.spark.sql.types.DoubleType)
    EventLogSchema.addColumn(dir, "tag",
      org.apache.spark.sql.types.StringType)
    val staging = new java.io.File(
      Files.createTempDirectory("gelsc_stage").toFile, "data").toString
    // values chosen to stress the bit round-trip: a subnormal-ish
    // magnitude, an exact binary fraction, and a shortest-repr decimal
    Seq((60L, Day + 1L, 9L, "a", 5L, Some(0.1), Some("hot")),
        (61L, Day + 2L, 9L, "b", 6L, Some(1.0e-300), None),
        (62L, Day + 3L, 9L, "a", 7L, None, Some("hot")))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents",
        "score", "tag")
      .write.parquet(staging)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        EventLogSchema.schemaOf(dir, EventLog.TimeView.Current)
          .map(_.copy(nullable = true))))
      .parquet(staging)
      .writeStream.format("graft-eventlog")
      .option("checkpointLocation",
        Files.createTempDirectory("gelsc_sck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir)
    q.awaitTermination()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_id") >= 60L)
      .select("event_id", "score", "tag")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      60L -> ((Some(0.1), Some("hot"))),
      61L -> ((Some(1.0e-300), None)),
      62L -> ((None, Some("hot")))),
      s"typed lanes corrupted through the sink: $got")
  }

  test("extended wire survives the streaming FILE tail (base projection)") {
    val dir = store()
    EventLogSchema.addColumn(dir, "flags")
    Seq((10L, Day + 5L, 9L, "a", 1L, Some(3L)))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents", "flags")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("graft-eventlog").load(dir)
      .select("event_id")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        n.addAndGet(df.count()); ()
      })
      .option("checkpointLocation",
        Files.createTempDirectory("gelsc_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(n.get() == baseRows.size + 1)
  }
}
