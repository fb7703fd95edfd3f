package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import TopKMonitor.{Entry, TopRow}

/** The mergeability contract of the streaming top-k: after any batch
  * split the streamed leaderboard equals the batch [[graft.functions
  * .TopKAgg]] aggregate over the union, bit for bit. */
class TopKMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 4

  // adversarial: interleaved groups, score ties, later batches both
  // improving and not improving the leaderboard
  private val entries = (1L to 48L).map { i =>
    Entry(if (i % 3 == 0) "a" else "b", (i * 37) % 11, i)
  }

  private def batchTop(rows: Seq[Entry]): Set[(String, Int, Long, Long)] = {
    val topk = udaf(new graft.functions.TopKAgg(K),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    rows.toDF("group", "score", "payload")
      .groupBy("group").agg(topk($"score", $"payload").as("top"))
      .select($"group", posexplode($"top"))
      .select($"group", ($"pos" + 1).cast("int").as("rank"),
        $"col._1".as("score"), $"col._2".as("payload"))
      .as[(String, Int, Long, Long)].collect().toSet
  }

  test("streamed top-k across 4 batches equals the batch aggregate of the union") {
    val input = MemoryStream[Entry](spark)
    val name = s"tk_${System.nanoTime()}"
    val q = TopKMonitor.top(input.toDS(), k = K)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("tk").toString)
      .start()
    try {
      entries.grouped(13).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // Update-mode memory sink appends every emission; the final
    // leaderboard is reconstructible order-independently because scores
    // only ever improve: a pair in the final top-k was emitted (it
    // entered the board on arrival and was never evicted), so the final
    // board is the k best distinct emitted pairs per group.
    val emitted = spark.table(name).as[TopRow].collect()
      .map(r => (r.group, r.score, r.payload)).distinct.toSeq
    val reconstructed = emitted.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy(e => (-e._1, -e._2)).take(K)
        .zipWithIndex.map { case ((s, p), i) => (g, i + 1, s, p) }
    }.toSet
    assert(reconstructed == batchTop(entries))
  }

  test("re-streamed duplicate pairs are idempotent") {
    val input = MemoryStream[Entry](spark)
    val name = s"tk_${System.nanoTime()}"
    val q = TopKMonitor.top(input.toDS(), k = 2)
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("tk").toString)
      .start()
    try {
      input.addData(Seq(Entry("g", 9, 1), Entry("g", 7, 2)))
      q.processAllAvailable()
      input.addData(Seq(Entry("g", 9, 1))) // exact duplicate
      q.processAllAvailable()
    } finally q.stop()
    // last emission for the group still holds exactly {(9,1),(7,2)}
    val last = spark.table(name).as[TopRow].collect()
      .map(r => (r.rank, r.score, r.payload)).distinct.toSet
    assert(last == Set((1, 9L, 1L), (2, 7L, 2L)))
  }
}
