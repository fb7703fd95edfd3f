package graft.streaming

import graft.operators.SketchStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SketchIngestSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("streamed per-batch sketches union to an accurate estimate") {
    val dir = java.nio.file.Files.createTempDirectory("sketchingest").toString
    val all = (0 until 4000).map(v => ("u" + (v % 3), v.toLong))
    val input = MemoryStream[(String, Long)](spark)
    val q = SketchIngest.start(input.toDF().toDF("k", "v"), Seq("k"), "v",
      s"$dir/store", s"$dir/ckpt", compactEvery = 2)
    try {
      all.grouped(1500).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val streamed = SketchStore.estimate(spark, s"$dir/store", Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // exact distinct per key: v is unique per row, keys cycle mod 3
    val exact = all.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    assert(streamed.keySet == exact.keySet)
    for ((k, est) <- streamed)
      assert(math.abs(est - exact(k)).toDouble / exact(k) <= 0.05,
        s"key $k streamed estimate $est vs exact ${exact(k)}")
  }
}
