package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` payload column plus a typed metadata struct; decode /
  * feature-extraction runs batched per partition (the Scala analog of
  * `mapInPandas` — one iterator per partition, no per-row UDF dispatch).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake featurizer over the raw bytes. The
  * Spark-side plumbing (schema, partitioning, batch iteration, typed
  * output) is real and is what matters at 100 TB: payloads never pass
  * through a shuffle (feature extraction is a narrow map), and only the
  * small feature vectors flow downstream.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String,
      n_bytes: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** Attach a binary payload + metadata to a documents-shaped frame.
    * (Test fixture: the UTF-8 bytes of `text` stand in for media bytes.) */
  def attachBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"),
      length(col("text")).as("n_bytes"))

  /** STUB media decode: a real deployment would decode the image/audio here
    * (e.g. JPEG → pixels → embedding). Offline-deterministic fake: MD5 of
    * the payload, folded into 4 floats in [0,1). */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val d = MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(4) { i =>
      val x = ((d(4 * i) & 0xff) << 8) | (d(4 * i + 1) & 0xff)
      x.toFloat / 65536.0f
    }
  }

  /** Batched per-partition feature extraction (mapInPandas analog). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => MediaFeatures(r.doc_id, r.n_bytes, decodeStub(r.payload)))
    }
  }

  /** STUB frame sampling: a real deployment would decode video/audio and
    * sample every k-th frame; here the payload is cut into fixed-size byte
    * windows. Emits one row per sampled frame — the explode happens AFTER
    * the narrow per-partition pass, so full payloads never shuffle. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64,
      everyNth: Int = 2): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (frame, idx) =>
          FrameFeatures(r.doc_id, idx, decodeStub(frame))
        }
    }
  }

  case class FrameFeatures(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** End-to-end: documents → binary payload → batched featurize. */
  def pipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = attachBinary(documents).as[MediaRecord]
    extractFeatures(media)
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 5).as("f0"),
        round(element_at(col("features"), 2).cast("double"), 5).as("f1"),
        round(element_at(col("features"), 3).cast("double"), 5).as("f2"),
        round(element_at(col("features"), 4).cast("double"), 5).as("f3"))
  }
}
