package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "an image stand-in payload"),
    (2L, "another payload")).toDF("doc_id", "text")

  test("binary payload plumbing preserves ids and byte lengths") {
    val media = Multimodal.attachBinary(docs)
    val out = media.as[Multimodal.MediaRecord].collect()
    assert(out.map(_.doc_id).toSet == Set(1L, 2L))
    assert(out.forall(r => r.payload.length == r.n_bytes))
  }

  test("feature extraction is deterministic, batched, and 4-dimensional") {
    val run1 = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    val run2 = Multimodal.pipeline(spark, docs).orderBy("doc_id").collect()
    assert(run1.sameElements(run2))
    assert(run1.forall { r =>
      Seq("f0", "f1", "f2", "f3").forall { c =>
        val v = r.getAs[Double](c); v >= 0.0 && v < 1.0
      }
    })
  }
}

class FrameSampleSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("frame sampling emits every 2nd fixed-size window per doc") {
    val docs = Seq((1L, "x" * 300)).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(docs).as[Multimodal.MediaRecord]
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 2)
      .collect()
    // 300 bytes -> frames 0..4 (sizes 64,64,64,64,44); every 2nd -> 0,2,4
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.features.length == 4))
  }
}
