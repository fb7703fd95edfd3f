package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import BottomKSample.{Item, SampleRow}

/** The determinism/mergeability contract: the streamed bottom-k after any
  * batch split equals the batch bottom-k over the union, bit for bit. */
class BottomKSampleSpec extends SparkTestBase {
  import spark.implicits._

  private val items = (1L to 40L).map(i => Item(if (i % 2 == 0) "a" else "b", i))

  /** Batch reference: same salted-md5 rank the q102 query uses. */
  private def batchSample(rows: Seq[Item], k: Int): Set[(String, Long, Int)] = {
    val h = conv(substring(md5(concat(lit("bk:"),
      col("item").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy("group").orderBy(col("__h"), col("item"))
    rows.toDF("group", "item")
      .withColumn("__h", h)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("group"), col("item"), col("rank").cast("int"))
      .as[(String, Long, Int)].collect().toSet
  }

  test("streamed sample across 3 batches equals the batch sample of the union") {
    val input = MemoryStream[Item](spark)
    val name = s"bk_${System.nanoTime()}"
    val q = BottomKSample.sample(input.toDS(), k = 8)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("bk").toString)
      .start()
    try {
      items.grouped(15).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // The update-mode memory sink appends every emission, in no reliable
    // order. Reconstruct the FINAL sample order-independently: an item in
    // the final bottom-k was in the bottom-k of every prefix since its
    // arrival (smaller hashes only ever evict larger), so it was emitted;
    // the final sample is therefore the k smallest-hash items per group
    // among all distinct emitted items.
    val emitted = spark.table(name).as[SampleRow].collect()
      .map(r => (r.group, r.item)).distinct.toSeq
    val reconstructed = emitted.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(_._2).sortBy(i => (BottomKSample.hash60(i), i)).take(8)
        .zipWithIndex.map { case (item, i) => (g, item, i + 1) }
    }.toSet
    assert(reconstructed == batchSample(items, 8))
  }

  test("streamed WEIGHTED sample across batches equals the q126 batch query") {
    // items with 100x-spread weights; docs give the batch query the same
    // weights via their token counts
    val witems = (1L to 40L).map { i =>
      WeightedBottomK.WItem(if (i % 2 == 0) "a" else "b",
        i, if (i % 7 == 0) 300L else 5L)
    }
    val docs = witems.map(w =>
        (w.item, w.group, (1 to w.weight.toInt).map(j => s"t${w.item}x$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val expected = graft.queries.ScalePipeline.q126WeightedSampleOn(docs)
      .select("source", "doc_id", "w_tokens", "rank")
      .as[(String, Long, Long, Int)].collect().toSet

    val input = MemoryStream[WeightedBottomK.WItem](spark)
    val name = s"wbk_${System.nanoTime()}"
    val q = WeightedBottomK.sample(input.toDS(), k = 8)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("wbk").toString)
      .start()
    try {
      witems.grouped(15).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // reconstruct the final sample order-independently (smaller keys
    // only ever evict larger — same argument as the unweighted test)
    val emitted = spark.table(name).as[WeightedBottomK.WRow].collect()
      .map(r => (r.group, r.item, r.weight)).distinct.toSeq
    val reconstructed = emitted.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (WeightedBottomK.key(r._2, r._3), r._2)).take(8)
        .zipWithIndex.map { case ((_, item, w), i) => (g, item, w, i + 1) }
    }.toSet
    assert(reconstructed == expected)
  }

  test("scala-side weighted key matches the SQL key expression") {
    val sqlKey = Seq((42L, 17L)).toDF("item", "w")
      .select((-round(log(
          (conv(substring(md5(concat(lit("ws:"), col("item").cast("string"))), 1, 13),
            16, 10).cast("long") + lit(1L)).cast("double") / lit(4503599627370496.0))
          * 1e6, 0).cast("long")).cast("double") / col("w"))
      .as[Double].head()
    assert(WeightedBottomK.key(42L, 17L) == sqlKey)
  }

  test("scala-side hash matches the SQL md5-prefix hash") {
    val sqlHash = Seq(Tuple1(42L)).toDF("item")
      .select(conv(substring(md5(concat(lit("bk:"),
        col("item").cast("string"))), 1, 15), 16, 10).cast("long"))
      .as[Long].head()
    assert(BottomKSample.hash60(42L) == sqlHash)
  }

  test("scala-side priority matches the q228 batch expression") {
    val batch = graft.queries.ScalePipeline
      .prioritySampleOn(Seq((42L, 1234L)).toDF("doc_id", "w"), 1)
      .select("pr").as[Long].head()
    assert(PrioritySampleStream.priority(42L, 1234L) == batch)
  }

  test("streamed priority sample + tau across batches equals the batch q228") {
    import PrioritySampleStream.{PItem, PRow}
    val k = 4
    val pitems = (1L to 30L).map(i =>
      PItem(if (i % 2 == 0) "a" else "b", i, i * 3))
    // batch reference PER GROUP via the q228 operator on that group's rows
    val expected = pitems.groupBy(_.group).toSeq.flatMap { case (g, rs) =>
      graft.queries.ScalePipeline
        .prioritySampleOn(rs.map(r => (r.item, r.weight))
          .toDF("doc_id", "w"), k)
        .collect()
        .sortBy(r => -r.getLong(2))
        .zipWithIndex
        .map { case (r, i) => (g, r.getLong(0), r.getLong(1), i + 1,
          r.getLong(3)) }
    }.toSet
    val input = MemoryStream[PItem](spark)
    val name = s"ps_${System.nanoTime()}"
    val q = PrioritySampleStream.sample(input.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ps").toString)
      .start()
    try {
      pitems.grouped(11).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // the FINAL emission of each group must appear verbatim in the sink
    val emitted = spark.table(name).as[PRow].collect()
      .map(r => (r.group, r.item, r.weight, r.rank, r.wHat)).toSet
    assert(expected.subsetOf(emitted),
      s"missing: ${expected.diff(emitted)}")
  }

  test("re-streamed item with an updated weight occupies ONE slot, not two") {
    // priority sampler: item 7 arrives at weight 10, then again at
    // weight 1000 — the state must hold one entry for it (max priority,
    // i.e. the higher weight), never two of the k slots
    val input = MemoryStream[PrioritySampleStream.PItem](spark)
    val name = s"pr_upd_${System.nanoTime()}"
    val q = PrioritySampleStream.sample(input.toDS(), k = 4)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("prupd").toString)
      .start()
    try {
      input.addData(Seq(PrioritySampleStream.PItem("g", 7L, 10L),
        PrioritySampleStream.PItem("g", 8L, 10L)))
      q.processAllAvailable()
      input.addData(Seq(PrioritySampleStream.PItem("g", 7L, 1000L)))
      q.processAllAvailable()
    } finally q.stop()
    // last emission per item: the final sample holds item 7 once, at
    // its updated weight
    val finalRows = spark.table(name)
      .as[PrioritySampleStream.PRow].collect()
      .groupBy(_.item).map { case (_, rs) => rs.last }.toSeq
    assert(finalRows.count(_.item == 7L) == 1)
    assert(finalRows.find(_.item == 7L).get.weight == 1000L)
    // weighted bottom-k: same contract (best key wins, one entry)
    val winput = MemoryStream[WeightedBottomK.WItem](spark)
    val wname = s"ws_upd_${System.nanoTime()}"
    val wq = WeightedBottomK.sample(winput.toDS(), k = 4)
      .writeStream.format("memory").queryName(wname).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("wsupd").toString)
      .start()
    try {
      winput.addData(Seq(WeightedBottomK.WItem("g", 7L, 10L)))
      wq.processAllAvailable()
      winput.addData(Seq(WeightedBottomK.WItem("g", 7L, 1000L)))
      wq.processAllAvailable()
    } finally wq.stop()
    val wlast = spark.table(wname).as[WeightedBottomK.WRow].collect().last
    assert(wlast.item == 7L && wlast.weight == 1000L && wlast.rank == 1)
  }

  test("same-item duplicates WITHIN one batch resolve deterministically (best key)") {
    // Spark guarantees no row order inside a trigger, so "last write"
    // is undefined within a batch: the merge must pick the best-key
    // entry regardless of arrival order — both orderings one result
    def run(weights: Seq[Long]): Seq[WeightedBottomK.WRow] = {
      val input = MemoryStream[WeightedBottomK.WItem](spark)
      val name = s"ws_dup_${System.nanoTime()}"
      val q = WeightedBottomK.sample(input.toDS(), k = 4)
        .writeStream.format("memory").queryName(name).outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("wsdup").toString)
        .start()
      try {
        input.addData(weights.map(w => WeightedBottomK.WItem("g", 7L, w)))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[WeightedBottomK.WRow].collect().toSeq
    }
    val a = run(Seq(2L, 9L))
    val b = run(Seq(9L, 2L))
    assert(a == b, s"order-dependent within-batch merge: $a vs $b")
    assert(a.count(_.item == 7L) == 1)
    // the E-S key is -ln(u)/w: the LARGER weight gives the smaller key
    assert(a.find(_.item == 7L).get.weight == 9L)
  }
}
