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

  test("scala-side hash matches the SQL md5-prefix hash") {
    val sqlHash = Seq(Tuple1(42L)).toDF("item")
      .select(conv(substring(md5(concat(lit("bk:"),
        col("item").cast("string"))), 1, 15), 16, 10).cast("long"))
      .as[Long].head()
    assert(BottomKSample.hash60(42L) == sqlHash)
  }
}
