package graft.streaming

import java.nio.file.Files

import graft.operators.AnnIndexStore
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VecRow(vec_id: Long, embedding: Array[Float])

class VectorIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed vectors match the batch assignment and become searchable; replay is idempotent") {
    val root = Files.createTempDirectory("vec_ingest").toString
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    AnnIndexStore.write(spark, e, "vec_id", "embedding", s"$root/index", nLists = 16)
    val centers = AnnIndexStore.loadCenters(spark, s"$root/index")

    // stream twins of vectors 7 and 8 under new ids across two epochs
    val twins = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(7L, 8L))
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
      .as[VecRow].collect()
    val input = MemoryStream[VecRow](spark)
    val q = VectorIngest.start(input.toDF(), "vec_id", "embedding",
      s"$root/index", s"$root/stream_cells", s"$root/ckpt")
    try {
      input.addData(Seq(twins(0)))
      q.processAllAvailable()
      input.addData(Seq(twins(1)))
      q.processAllAvailable()
    } finally q.stop()

    // stream assignment == batch assignment (same frozen centroids)
    val streamed = spark.read.parquet(s"$root/stream_cells")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val batch = VectorIngest.assign(
        twins.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding", centers)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")

    // searching base + stream finds each twin at cosine 1.0
    val queries = Tables.embeddings(spark, dir)
      .where(col("vec_id").isin(7L, 8L))
      .select(col("vec_id").as("__qid"), col("embedding").as("qv"))
    val top = VectorIngest.searchAll(spark, s"$root/index",
        s"$root/stream_cells", queries, "qv", "vec_id", "embedding",
        k = 3, nProbe = 2)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    for (qid <- Seq(7L, 8L))
      assert(top.exists(r => r._1 == qid && r._2 == qid + 10000L && r._3 == 1.0),
        s"streamed twin of $qid not searchable: ${top.toSeq}")

    // crash-replay: epoch 0 rewritten from a fresh checkpoint — vectors
    // must not double (epoch overwrite, not blind append)
    val input2 = MemoryStream[VecRow](spark)
    val q2 = VectorIngest.start(input2.toDF(), "vec_id", "embedding",
      s"$root/index", s"$root/stream_cells", s"$root/ckpt2")
    try { input2.addData(Seq(twins(0))); q2.processAllAvailable() }
    finally q2.stop()
    val ids = spark.read.parquet(s"$root/stream_cells")
      .select("vec_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(10007L, 10008L)),
      s"replay duplicated or lost vectors: ${ids.toSeq}")
  }
}
