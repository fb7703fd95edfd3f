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
  * directory (file-source streaming). Upstream crash-replays are NOT
  * invisible downstream — an epoch overwrite writes new part-file
  * names, so the file source re-emits the replayed epoch's rows.
  * Each hop neutralizes that its own way:
  *
  *   - gate → dedup: a re-emitted accepted doc probes the dedup store,
  *     finds its own earlier index rows, verifies Jaccard 1.0 against
  *     itself, and is dropped — dedup semantics absorb the replay;
  *   - dedup → shards: [[ShardedIngest]] has no such semantics, so the
  *     survivor stream passes a streaming `dropDuplicates` on the id
  *     first. State is the id set alone (bytes per doc, no payloads) —
  *     the standard price of exactly-once across independent
  *     checkpoints without a transactional sink.
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
      // replay guard (see scaladoc): an upstream epoch overwrite
      // re-emits its rows under fresh file names; id-keyed streaming
      // dedup keeps the shards append-only layout exactly-once
      .dropDuplicates("doc_id")
    val shards = ShardedIngest.start(survivors,
      s"$root/shards", s"$root/manifest", s"$root/ckpt_shards",
      compactEvery = compactEvery)

    Handles(gate, dedup, shards)
  }
}
