package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The on-disk prunable dedup index: equivalence with the in-memory
  * incremental path, and proof that history probes actually partition-
  * prune — the property that keeps per-batch cost proportional to the
  * batch, not to accumulated history. */
class PrunedIndexSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("pruned probe admits exactly the in-memory incremental survivor set") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    val evenIdx = index.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    val oddIdx = index.where(col("doc_id") % 2 === 1)

    val store = Files.createTempDirectory("lane_index").toString
    Dedup.writeLaneIndex(evenIdx, "doc_id", store)

    val pruned = Dedup.incrementalMinhashKeepPruned(store, odd,
        "doc_id", "text", incomingIndex = Some(oddIdx))
      .select("doc_id").as[Long].collect().toSet
    val reference = Dedup.incrementalMinhashKeep(evenIdx, odd,
        "doc_id", "text", incomingIndex = Some(oddIdx))
      .select("doc_id").as[Long].collect().toSet
    assert(pruned == reference,
      s"pruned-store admission diverged: ${pruned.diff(reference)} / ${reference.diff(pruned)}")
  }

  test("bucketed-toks probe admits the same survivors, with a pruned fetch") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    val evenIdx = index.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    val oddIdx = index.where(col("doc_id") % 2 === 1)

    val store = Files.createTempDirectory("lane_index_bkt").toString
    Dedup.writeLaneIndexBucketed(evenIdx, "doc_id", store, "toks_spec_store")

    val bucketed = Dedup.incrementalMinhashKeepBucketed(store,
        "toks_spec_store", odd, "doc_id", "text", incomingIndex = Some(oddIdx))
      .select("doc_id").as[Long].collect().toSet
    val reference = Dedup.incrementalMinhashKeep(evenIdx, odd,
        "doc_id", "text", incomingIndex = Some(oddIdx))
      .select("doc_id").as[Long].collect().toSet
    assert(bucketed == reference,
      s"bucketed-store admission diverged: ${bucketed.diff(reference)} / ${reference.diff(bucketed)}")

    // the pointed fetch the path uses must actually prune bucket files:
    // the fetch materializes under a scoped conf, so the pruned scan is
    // the CACHED plan (the session default would plan it unpruned)
    val fetch = Dedup.pointedToks(spark, "toks_spec_store", "doc_id",
      Seq(2L, 4L, 8L))
    val cachedPlan = fetch.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }.getOrElse(fail("pointed fetch did not materialize through the cache"))
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val m = sel.findFirstMatchIn(cachedPlan).getOrElse(
      fail("no bucket pruning in pointed fetch plan:\n" + cachedPlan.take(800)))
    assert(m.group(1).toInt < m.group(2).toInt,
      s"fetch read all ${m.group(2)} buckets")
    assert(fetch.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 8L))
  }

  test("scoped bucketed probe releases every internal cache on exit") {
    val docs = graft.sources.Tables.documents(spark, dir).limit(200)
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    val evenIdx = index.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)

    val store = Files.createTempDirectory("lane_index_scoped").toString
    Dedup.writeLaneIndexBucketed(evenIdx, "doc_id", store, "toks_scoped_store")

    spark.catalog.clearCache()
    // scope the leak check to THIS probe: suites sharing the session
    // legitimately hold lineage-cut localCheckpoint RDDs (q70/q169 CC),
    // so assert no NEW persistent RDD survives the probe, not that the
    // global map is empty
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val admitted = Dedup.incrementalMinhashKeepBucketedScoped(store,
      "toks_scoped_store", odd, "doc_id", "text") { adm =>
      adm.count() // consume inside the scope, as a probe loop would
    }
    assert(admitted > 0)
    // probe-forever contract: nothing the scope persisted stays behind —
    // cached Datasets hold persistent RDDs once computed, so no new
    // surviving entry proves the release
    val leaked = spark.sparkContext.getPersistentRDDs -- before
    assert(leaked.isEmpty,
      s"leaked caches: ${leaked.values.map(_.name).toList}")
  }

  test("history lane scan reads only the batch's (band, prefix) partitions") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val index = Dedup.minhashIndex(docs, "doc_id", "text")
    val store = Files.createTempDirectory("lane_index_prune").toString
    Dedup.writeLaneIndex(index.where(col("doc_id") >= 10), "doc_id", store)

    // a tiny batch touches few (band, prefix) combos of the 8×16 space
    val batchIdx = index.where(col("doc_id") < 3)
    val lanes = Dedup.laneView(batchIdx, "doc_id", bands = 8)
    val scan = Dedup.prunedLaneScan(spark, store, lanes)

    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__pfx"),
      "probe predicate did not land as a partition filter:\n" + plan.take(600))

    // files actually touched ⊂ the store, and only from matched dirs
    val touched = scan.select(input_file_name()).distinct()
      .as[String].collect().toSet
    val allParts = {
      def dirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten.filter(_.isDirectory)
      dirs(new java.io.File(s"$store/lanes"))
        .flatMap(dirs).map(_.getName).toSet // __pfx=* level
    }
    val probes = lanes.select("__band", "__pfx").distinct().count()
    assert(probes < 128, "fixture batch should not cover the whole space")
    val touchedParts = touched.map { f =>
      f.split("/").filter(_.startsWith("__pfx=")).last
    }
    assert(touched.nonEmpty && touchedParts.subsetOf(allParts))
    // the scan must skip at least the never-probed partitions
    val probedPairs = lanes.select("__band", "__pfx").distinct()
      .as[(Int, String)].collect().toSet
    val touchedPairs = touched.map { f =>
      val band = f.split("/").filter(_.startsWith("__band=")).last
        .stripPrefix("__band=").toInt
      val pfx = f.split("/").filter(_.startsWith("__pfx=")).last
        .stripPrefix("__pfx=")
      (band, pfx)
    }
    assert(touchedPairs.subsetOf(probedPairs),
      s"scan touched unprobed partitions: ${touchedPairs.diff(probedPairs)}")
  }
}
