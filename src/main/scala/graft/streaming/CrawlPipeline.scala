package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The full continuous curation pipeline, composed from the streaming
  * stages this package ships — crawl stream in, training shards out,
  * each stage restartable and replay-safe on its own checkpoint:
  *
  *   crawl → [[CurationGate]] (quality + span-dup admission)
  *         → [[PrunedDedupIngest]] (near-dup dedup, partition-pruned
  *           history probes)
  *         → [[LmRouter]] (OPTIONAL: frozen-model perplexity lanes;
  *           only `trainerLanes` move on, the tail stays queryable in
  *           the routed store)
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

  /** The running queries; drain/stop in topological order. */
  case class Handles(gate: StreamingQuery, dedup: StreamingQuery,
      router: Option[StreamingQuery], shards: StreamingQuery,
      release: () => Unit = () => ()) {
    /** Drain the whole chain: each stage finishes before the next looks
      * for its files (file sources discover asynchronously otherwise). */
    def processAllAvailable(): Unit = {
      gate.processAllAvailable()
      dedup.processAllAvailable()
      router.foreach(_.processAllAvailable())
      shards.processAllAvailable()
    }
    /** Stops every query AND releases the cached LM model (restart loops
      * must not accumulate one cached model copy per start). */
    def stopAll(): Unit = {
      shards.stop(); router.foreach(_.stop()); dedup.stop(); gate.stop()
      release()
    }
  }

  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** `docs`: streaming (doc_id: long, text: string). Everything lands
    * under `root`.
    *
    * `lmModel`: when set — (modelPath, headCut, tailCut), a model
    * written by [[LmRouter.train]] — survivors are scored against the
    * frozen LM and only `trainerLanes` docs reach the shards; every
    * lane (tail included) stays queryable under `root/routed`. */
  def start(docs: DataFrame, root: String,
      rules: CurationGate.Rules = CurationGate.Rules(),
      compactEvery: Int = 0,
      lmModel: Option[(String, Double, Double)] = None,
      trainerLanes: Seq[String] = Seq("head", "middle")): Handles = {
    val spark = docs.sparkSession
    // file-source streams need their input dir to EXIST at start; the
    // upstream stage creates it on first epoch, which is too late
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (Seq("decisions", "survivors") ++ lmModel.map(_ => "routed"))
      .foreach(d => fs.mkdirs(new Path(root, d)))

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

    val (router, shardInput, release) = lmModel match {
      case None => (None, survivors, () => ())
      case Some((modelPath, headCut, tailCut)) =>
        val m = LmRouter.load(spark, modelPath)
        // the routed store is advertised as queryable, so the hop INTO
        // it needs its own replay guard (see scaladoc): without the
        // id-keyed dedup, a dedup-stage epoch replay would double every
        // doc in root/routed even though the shards stayed exactly-once
        val r = LmRouter.start(survivors.dropDuplicates("doc_id"),
          "doc_id", "text", m, s"$root/routed", s"$root/ckpt_router",
          headCut, tailCut, compactEvery, Trigger.ProcessingTime(0L))
        val routedSchema = DocSchema
          .add("n_bigrams", LongType)
          .add("sum_lp_micro", LongType)
          .add("avg_lp_micro", DoubleType)
          .add("__batch", LongType)
          .add("lane", StringType)
        val kept = spark.readStream.schema(routedSchema)
          .parquet(s"$root/routed")
          .where(col("lane").isin(trainerLanes: _*))
          .select("doc_id", "text")
        (Some(r), kept,
          () => { m.c12.unpersist(); m.c1.unpersist(); () })
    }

    val shards = ShardedIngest.start(
      // replay guard (see scaladoc): an upstream epoch overwrite
      // re-emits its rows under fresh file names; id-keyed streaming
      // dedup keeps the shards append-only layout exactly-once
      shardInput.dropDuplicates("doc_id"),
      s"$root/shards", s"$root/manifest", s"$root/ckpt_shards",
      compactEvery = compactEvery)

    Handles(gate, dedup, router, shards, release)
  }
}
