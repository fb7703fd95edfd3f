package graft.sources

import java.nio.file.Files

import graft.sources.v2.{EventLog, EventLogStatsScan}
import org.apache.spark.sql.functions._

/** The graft-eventlog DataSource V2, both directions: the task-commit
  * V2 write (one zone-mapped file per UTC day, temp-and-rename, loud
  * schema/null refusal), wire round-trip, zone-map file skipping under
  * pushed ts/type predicates (counted at planning time), pruned
  * fixed-width decode, and the residual re-filter that makes skipping
  * a pure optimization. */
class EventLogSourceSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L // one UTC day in micros

  // three UTC days: day 0 has types a+b, day 1 only b, day 2 only c
  private val rows = Seq(
    (1L, 10L * 3600 * 1000000L, 100L, "a", 500L),
    (2L, 11L * 3600 * 1000000L, 101L, "b", -250L),
    (3L, Day + 1000L, 102L, "b", 125L),
    (4L, Day + 2000L, 103L, "b", 9999L),
    (5L, 2 * Day + 5000L, 104L, "c", 1L))

  /** V2 write: day-repartitioned so each day lands as one file. */
  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("gel").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .sortWithinPartitions("ts_us", "event_id")
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    dir
  }

  test("V2 write + read round-trip preserves every row and value") {
    val dir = writeFixture()
    assert(EventLog.listFiles(dir).size == 3) // one file per day
    // the task-commit protocol left no in-progress temp files behind —
    // only data files and the commit-time manifest log
    assert(new java.io.File(dir).listFiles()
      .forall(f => f.getName.endsWith(".gel") ||
        EventLog.isManifestFile(f.getName)))
    val got = spark.read.format("graft-eventlog").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.toSet)
  }

  test("a second append adds files — never clobbers a previous job's output") {
    val dir = writeFixture()
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.listFiles(dir).size == 6) // 3 + 3, none replaced
    // append semantics: every row now present exactly twice
    val counts = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.toSet == Set(2L) && counts.size == rows.size)
  }

  test("job-level abort deletes files its committed tasks renamed into place") {
    val dir = writeFixture()
    val before = EventLog.listFiles(dir).map(_.getName)
    new graft.sources.v2.EventLogBatchWrite(dir).abort(
      Array(graft.sources.v2.EventLogCommit(Seq(EventLog.ManifestEntry(
        before.head, 0, 0L, 0L, Nil, Nil))), null))
    assert(EventLog.listFiles(dir).map(_.getName) == before.tail)
  }

  test("write refuses a wrong schema and null fields loudly") {
    val dir = Files.createTempDirectory("gel").toString
    val wrong = intercept[Exception] {
      Seq((1L, "x")).toDF("event_id", "event_type")
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    // Spark's V2 analyzer rejects the mismatch against Table.schema()
    // before the WriteBuilder's own require can — either refusal is loud
    assert(wrong.getMessage.contains("graft-eventlog writes need schema") ||
      wrong.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE"),
      wrong.getMessage)
    val withNull = intercept[Exception] {
      Seq((1L, Some(5L), 2L, "a", 3L), (2L, None, 2L, "a", 3L))
        .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
        .write.format("graft-eventlog").mode("append").save(dir)
    }
    // the table schema declares every field non-null, so Spark's own
    // AssertNotNull fires before the writer's guard — loud either way
    assert(withNull.getMessage.contains("no null lane") ||
      withNull.getMessage.contains("NOT_NULL_ASSERT_VIOLATION"),
      withNull.toString)
  }

  test("ts range predicate skips whole files at planning time") {
    val dir = writeFixture()
    val skip0 = EventLog.skippedFiles.get()
    val plan0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day) // day 0's file must never be opened
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.filter(_._2 >= Day).toSet)
    assert(EventLog.skippedFiles.get() - skip0 == 1)
    assert(EventLog.plannedFiles.get() - plan0 == 2)
  }

  test("event_type equality skips files whose dictionary lacks the type") {
    val dir = writeFixture()
    val skip0 = EventLog.skippedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("event_type") === "c")
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(5L))
    assert(EventLog.skippedFiles.get() - skip0 == 2) // days 0 and 1
  }

  test("residual re-filter: a cutoff inside a surviving file still drops rows") {
    val dir = writeFixture()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day + 1500L) // file day-1 survives, row 3 must go
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
  }

  test("global count/min/max answer from headers alone — zero record IO") {
    val dir = writeFixture()
    val before = EventLogStatsScan.headerOnlyFiles.get()
    val df = spark.read.format("graft-eventlog").load(dir)
      .agg(count(col("event_id")).as("n"), min("ts_us").as("mn"),
        max("ts_us").as("mx"))
    assert(df.as[(Long, Long, Long)].collect().head ==
      ((5L, rows.map(_._2).min, rows.map(_._2).max)))
    assert(EventLogStatsScan.headerOnlyFiles.get() - before == 3)
  }

  test("global SUM(cents) joins the header-stats pushdown via manifest sums") {
    val dir = writeFixture()
    val before = EventLogStatsScan.headerOnlyFiles.get()
    val p0 = EventLog.plannedFiles.get()
    val (n, s) = spark.read.format("graft-eventlog").load(dir)
      .agg(count(col("event_id")).as("n"), sum("cents").as("s"))
      .as[(Long, Long)].collect().head
    assert((n, s) == ((5L, rows.map(_._5).sum)))
    assert(EventLogStatsScan.headerOnlyFiles.get() - before == 3 &&
      EventLog.plannedFiles.get() == p0,
      "global count+sum should answer from metadata, zero record IO")
    // sums-less entries (the legacy shape) refuse the SUM push but the
    // record scan stays exact
    val legacy = EventLog.readManifest(dir).values.toSeq
      .map(_.copy(typeSums = None))
    EventLog.deleteManifest(dir)
    EventLog.appendManifest(dir, legacy)
    val before2 = EventLogStatsScan.headerOnlyFiles.get()
    val s2 = spark.read.format("graft-eventlog").load(dir)
      .agg(sum("cents")).as[Long].collect().head
    assert(s2 == rows.map(_._5).sum)
    assert(EventLogStatsScan.headerOnlyFiles.get() == before2,
      "metadata answered SUM(cents) with no sums recorded")
  }

  test("an empty store aggregates to count 0 — pushdown refused, never NULL") {
    // partial pushdown rewrites the final COUNT to a SUM over the stats
    // rows; zero files would make that NULL where the plain scan says 0
    val dir = Files.createTempDirectory("gel_empty").toString
    val n = spark.read.format("graft-eventlog").load(dir)
      .agg(count(col("event_id"))).as[Long].collect().head
    assert(n == 0L)
  }

  test("aggregate pushdown is refused when a filter survives — record scan runs") {
    val dir = writeFixture()
    val before = EventLogStatsScan.headerOnlyFiles.get()
    val df = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day)
      .agg(count(col("event_id")).as("n"), min("ts_us").as("mn"))
    assert(df.as[(Long, Long)].collect().head == ((3L, Day + 1000L)))
    assert(EventLogStatsScan.headerOnlyFiles.get() == before,
      "header stats answered a filtered aggregate — zone maps cannot do that")
  }

  test("a pushed LIMIT plans only enough files to cover it — and caps the decode") {
    val dir = writeFixture() // per-day counts: 2, 2, 1
    val lp0 = EventLog.limitPrunedFiles.get()
    val p0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir).limit(2).collect()
    assert(got.length == 2)
    assert(EventLog.plannedFiles.get() - p0 == 1,
      "limit(2) should plan exactly the first 2-row file")
    assert(EventLog.limitPrunedFiles.get() - lp0 == 2)
    // under a filter the push refuses (admitted counts are unknowable
    // from metadata): every surviving file plans, results stay exact
    val p1 = EventLog.plannedFiles.get()
    val f = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day).limit(1).collect()
    assert(f.length == 1)
    assert(EventLog.plannedFiles.get() - p1 == 2,
      "a filtered limit must not prune files by raw header counts")
    // a limit above the store size still reads everything exactly once
    assert(spark.read.format("graft-eventlog").load(dir)
      .limit(100).collect().length == rows.size)
  }

  test("batch scans take the vectorized path: ColumnarToRow above the scan") {
    val dir = writeFixture()
    val df = spark.read.format("graft-eventlog").load(dir)
      .select("event_id", "cents")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(df.as[(Long, Long)].collect().toSet ==
      rows.map(r => (r._1, r._5)).toSet)
  }

  test("the row-based fallback reader decodes identically to the columnar path") {
    val dir = writeFixture()
    val day0 = EventLog.listFiles(dir).head // sorted: the day-0 file
    val rdr = new graft.sources.v2.EventLogReaderFactory(
        Array("event_id", "event_type"))
      .createReader(graft.sources.v2.EventLogPartition(day0.getAbsolutePath))
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    while (rdr.next()) {
      val r = rdr.get()
      got += ((r.getLong(0), r.getUTF8String(1).toString))
    }
    rdr.close()
    assert(got == rows.filter(_._2 < Day).map(r => (r._1, r._4)).toSet)
  }

  test("job commit writes a header manifest covering every committed file") {
    val dir = writeFixture()
    val man = EventLog.readManifest(dir)
    assert(man.keySet == EventLog.listFiles(dir).map(_.getName).toSet)
    // entries replicate the headers exactly, plus per-type counts
    val day0 = EventLog.listFiles(dir).head
    val h = EventLog.readHeaderOf(day0)
    val e = man(day0.getName)
    assert((e.count, e.minTs, e.maxTs, e.types) ==
      ((h.count, h.minTs, h.maxTs, h.types)))
    assert(e.types.zip(e.typeCounts).toMap == Map("a" -> 1L, "b" -> 1L))
  }

  test("a manifested store plans with ZERO per-file header opens") {
    val dir = writeFixture()
    val h0 = EventLog.headerReads.get()
    val skip0 = EventLog.skippedFiles.get()
    // zone-map skipping must still work — driven by manifest entries
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == rows.filter(_._2 >= Day).toSet)
    assert(EventLog.skippedFiles.get() - skip0 == 1)
    assert(EventLog.headerReads.get() == h0,
      "planning opened file headers despite a complete manifest")
  }

  test("unmanifested files fall back to per-file header reads; a new commit re-covers only its own") {
    val dir = writeFixture()
    EventLog.deleteManifest(dir)
    // second append: its commit writes a manifest naming ONLY its 3 new
    // files — the first job's files must plan via header fallback
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .withColumn("__day", expr("ts_us div 86400000000"))
      .repartition(col("__day"))
      .drop("__day")
      .write.format("graft-eventlog").mode("append").save(dir)
    assert(EventLog.readManifest(dir).size == 3)
    val h0 = EventLog.headerReads.get()
    val n = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day).count()
    assert(n == 2 * rows.count(_._2 >= Day))
    assert(EventLog.headerReads.get() - h0 == 3,
      "expected header fallback for exactly the 3 unmanifested files")
  }

  test("grouped count by event_type answers from the manifest alone") {
    val dir = writeFixture()
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val h0 = EventLog.headerReads.get()
    val p0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() > g0,
      "grouped aggregate was not answered by the manifest scan")
    assert(EventLog.headerReads.get() == h0 &&
      EventLog.plannedFiles.get() == p0,
      "manifest-only grouped counts must open no file at all")
  }

  test("grouped count + sum(cents) by event_type answer from the manifest alone") {
    val dir = writeFixture()
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val h0 = EventLog.headerReads.get()
    val p0 = EventLog.plannedFiles.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (t, n, s) => t -> ((n, s)) }.toMap
    assert(got == Map("a" -> ((1L, 500L)), "b" -> ((3L, 9874L)),
      "c" -> ((1L, 1L))))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() > g0,
      "grouped count+sum was not answered by the manifest scan")
    assert(EventLog.headerReads.get() == h0 &&
      EventLog.plannedFiles.get() == p0,
      "manifest-only grouped sums must open no file at all")
  }

  test("a pure GROUP BY (zero agg exprs — distinct/count-over-groups plans) still emits every type") {
    val dir = writeFixture()
    // count() over a grouped aggregate prunes the agg columns away and
    // pushes GROUP BY event_type with NO aggregate expressions — the
    // manifest scan must answer with one row per type, never zero rows
    val n = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n")).count()
    assert(n == 3L)
    val d = spark.read.format("graft-eventlog").load(dir)
      .select("event_type").distinct().count()
    assert(d == 3L)
  }

  test("grouped SUM refuses when any entry predates the sums lane; COUNT still pushes") {
    val dir = writeFixture()
    // strip the sums lane from every entry — the legacy-manifest shape
    val legacy = EventLog.readManifest(dir).values.toSeq
      .map(_.copy(typeSums = None))
    EventLog.deleteManifest(dir)
    EventLog.appendManifest(dir, legacy)
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val sums = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type").agg(sum("cents").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums == Map("a" -> 500L, "b" -> 9874L, "c" -> 1L))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() == g0,
      "metadata answered SUM(cents) with no per-type sums recorded")
    // counts alone still answer manifest-only on the same store
    val counts = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() > g0)
  }

  test("grouped pushdown refused when a filter survives — record scan keeps semantics") {
    val dir = writeFixture()
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= Day)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("b" -> 2L, "c" -> 1L))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() == g0,
      "manifest counts answered a FILTERED grouped aggregate — they cannot")
  }

  test("grouped pushdown refused on an unmanifested store — still correct via scan") {
    val dir = writeFixture()
    EventLog.deleteManifest(dir)
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val got = spark.read.format("graft-eventlog").load(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
    assert(EventLogStatsScan.manifestOnlyGroupScans.get() == g0,
      "per-type counts live only in the manifest; without it the push must refuse")
  }

  test("option predicates skip files AND re-filter rows — exact source scoping") {
    val dir = writeFixture()
    val skip0 = EventLog.skippedFiles.get()
    // ts.min lands INSIDE day-1's file: the file survives the zone map,
    // so only the row-level re-filter can drop row 3
    val got = spark.read.format("graft-eventlog")
      .option("ts.min", (Day + 1500L).toString).load(dir)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
    assert(EventLog.skippedFiles.get() - skip0 == 1) // day-0 zone-skipped
    val tGot = spark.read.format("graft-eventlog")
      .option("event.type", "b").load(dir)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(tGot == rows.filter(_._4 == "b").toSet)
  }

  test("aggregates under option predicates refuse metadata pushdown and stay exact") {
    val dir = writeFixture()
    val s0 = EventLogStatsScan.headerOnlyFiles.get()
    val g0 = EventLogStatsScan.manifestOnlyGroupScans.get()
    val (n, mn) = spark.read.format("graft-eventlog")
      .option("ts.min", Day.toString).load(dir)
      .agg(count(col("event_id")).as("n"), min("ts_us").as("mn"))
      .as[(Long, Long)].collect().head
    assert((n, mn) == ((3L, Day + 1000L)))
    val byType = spark.read.format("graft-eventlog")
      .option("ts.min", Day.toString).load(dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byType == Map("b" -> 2L, "c" -> 1L))
    assert(EventLogStatsScan.headerOnlyFiles.get() == s0 &&
      EventLogStatsScan.manifestOnlyGroupScans.get() == g0,
      "metadata answered an option-scoped aggregate — options are row-level")
  }

  test("manifest stats reach Catalyst: exact rows/bytes, shrunk by pushed filters") {
    val dir = writeFixture()
    val full = spark.read.format("graft-eventlog").load(dir)
    val fullStats = full.queryExecution.optimizedPlan.stats
    assert(fullStats.rowCount.contains(BigInt(5)), fullStats.toString)
    val cut = spark.read.format("graft-eventlog").load(dir)
      .where(col("ts_us") >= 2 * Day) // only day 2's file survives
    val cutStats = cut.queryExecution.optimizedPlan.stats
    assert(cutStats.sizeInBytes < fullStats.sizeInBytes,
      s"pushed-filter skipping did not shrink reported stats: $cutStats vs $fullStats")
  }

  test("a selective join delivers runtime filters that skip files (DSv2 dynamic pruning)") {
    val dir = writeFixture()
    // the dim must be a real SCAN with a surviving Filter node: a local
    // Seq constant-folds to a LocalRelation and DPP sees no selective
    // side to build its pruning subquery from
    val dimDir = Files.createTempDirectory("gel_dim").toString
    Seq(("c", "keep"), ("z", "drop")).toDF("event_type", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val rf0 = EventLog.runtimeFilterCalls.get()
    val skip0 = EventLog.skippedFiles.get()
    val prev = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val joined = spark.read.format("graft-eventlog").load(dir)
        .join(broadcast(dim.where(col("tag") === "keep")), "event_type")
        .select("event_id")
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(joined.as[Long].collect().toSet == Set(5L)) // only type c rows
      assert(EventLog.runtimeFilterCalls.get() > rf0,
        "no runtime filter reached the scan — dynamic pruning never fired:\n" +
          opt.take(1500))
      // days 0 and 1 hold no 'c' in their dictionaries: skipped at
      // runtime — exactly, because a re-plan rolls back the pre-filter
      // pass's counter contribution before counting the final plan
      assert(EventLog.skippedFiles.get() - skip0 == 2,
        "runtime filter did not prune the files whose dictionary lacks the key")
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", v)
      case None => spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    }
  }

  test("reported stats drive the STATIC broadcast decision — no AQE rescue needed") {
    // without SupportsReportStatistics a V2 relation defaults to
    // defaultSizeInBytes (huge) and the initial plan sort-merge-joins;
    // AQE would fix it at runtime, so turn AQE off to prove the static
    // planner already sees the filtered eventlog's true (tiny) size
    val dir = writeFixture()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = spark.range(100000L).select(col("id").as("event_id"),
        (col("id") % 97).as("w"))
      val joined = big.join(
        spark.read.format("graft-eventlog").load(dir)
          .where(col("ts_us") >= 2 * Day) // one surviving 1-row file
          .select("event_id", "cents"),
        "event_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "filtered eventlog side was not broadcast under exact stats:\n" +
          plan.take(1200))
      assert(joined.count() == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("a truncated data file fails LOUDLY on decode — never a silent partial read") {
    val dir = writeFixture()
    val f = EventLog.listFiles(dir).last // day-2: 1 record
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.dropRight(8)) // chop mid-record
    val e = intercept[Exception] {
      // project a field so records actually decode (a bare count would
      // be answered from metadata, which by design trusts the commit
      // path exactly like parquet trusts footers)
      spark.read.format("graft-eventlog").load(dir)
        .select("cents").as[Long].collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[java.io.EOFException] ||
      String.valueOf(c.getMessage).toLowerCase.contains("eof")), e.toString)
  }

  test("column pruning reaches the reader: 2-column projection decodes 2 fields") {
    val dir = writeFixture()
    val df = spark.read.format("graft-eventlog").load(dir)
      .select("event_type", "cents")
    val got = df.as[(String, Long)].collect().toSet
    assert(got == rows.map(r => (r._4, r._5)).toSet)
    assert(EventLog.lastDecodedFields.get() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-eventlog"), plan)
  }
}
