package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The full continuous curation pipeline, composed from the three
  * streaming stages this package ships — crawl stream in, training
  * shards out, each stage restartable and replay-safe on its own
  * checkpoint:
  *
  *   crawl → [[CurationGate]] (quality + span-dup admission)
  *         → [[PrunedDedupIngest]] (near-dup dedup, partition-pruned
  *           history probes)
  *         → [[ShardedIngest]] (hash-sharded trainer layout + manifest)
  *
  * Stages hand off through the parquet epoch layout each already
  * writes: the downstream stage `readStream`s the upstream's output
  * directory (file-source streaming). That coupling is exactly what
  * makes the composition robust — the file source tracks files by NAME,
  * so an upstream crash-replay that overwrites its own epoch partition
  * is invisible downstream (already-seen files are not re-emitted):
  * at-least-once upstream becomes effectively-once across the chain
  * with no coordination between checkpoints.
  *
  * At scale each stage is an independent job with its own resources;
  * nothing here is local-mode-specific.
  */
object CrawlPipeline {

  /** The three running queries; drain/stop in topological order. */
  case class Handles(gate: StreamingQuery, dedup: StreamingQuery,
      shards: StreamingQuery) {
    /** Drain the whole chain: each stage finishes before the next looks
      * for its files (file sources discover asynchronously otherwise). */
    def processAllAvailable(): Unit = {
      gate.processAllAvailable()
      dedup.processAllAvailable()
      shards.processAllAvailable()
    }
    def stopAll(): Unit = { shards.stop(); dedup.stop(); gate.stop() }
  }

  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** `docs`: streaming (doc_id: long, text: string). Everything lands
    * under `root`. */
  def start(docs: DataFrame, root: String,
      rules: CurationGate.Rules = CurationGate.Rules(),
      compactEvery: Int = 0): Handles = {
    val spark = docs.sparkSession
    // file-source streams need their input dir to EXIST at start; the
    // upstream stage creates it on first epoch, which is too late
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("decisions", "survivors").foreach(d => fs.mkdirs(new Path(root, d)))

    val gate = CurationGate.start(docs, "doc_id", "text",
      s"$root/spans", s"$root/decisions", s"$root/ckpt_gate", rules,
      compactEvery = compactEvery)

    // decisions carry the full verdict; only accepted docs move on.
    // __batch is the upstream epoch dir — a partition column here.
    val decisionsSchema = DocSchema
      .add("known_span_ratio", DoubleType)
      .add("reason", StringType)
      .add("accepted", BooleanType)
      .add("__batch", LongType)
    val accepted = spark.readStream.schema(decisionsSchema)
      .parquet(s"$root/decisions")
      .where(col("accepted"))
      .select("doc_id", "text")
    val dedup = PrunedDedupIngest.start(accepted, "doc_id", "text",
      s"$root/dedup_store", s"$root/survivors", s"$root/ckpt_dedup",
      compactEvery = compactEvery)

    val survivorsSchema = DocSchema.add("__batch", LongType)
    val survivors = spark.readStream.schema(survivorsSchema)
      .parquet(s"$root/survivors")
      .select("doc_id", "text")
    val shards = ShardedIngest.start(survivors,
      s"$root/shards", s"$root/manifest", s"$root/ckpt_shards",
      compactEvery = compactEvery)

    Handles(gate, dedup, shards)
  }
}
