package graft.streaming

import graft.queries.Curation
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Continuous curation gate: the streaming twin of the batch curation
  * operators (q63 PII, q65 repetition, q105 span dedup) — a crawl stream
  * is admitted doc-by-doc under quality rules, with cross-batch
  * substring-span dedup against a PERSISTED span index (only 32-byte
  * digests are ever stored or probed; history text is never re-read).
  *
  * Per micro-batch (foreachBatch is serial, so index read-append is
  * race-free):
  *   1. score each doc: token count, repetition ratio, PII hits, and the
  *      fraction of its [[Curation.SpanK]]-token spans already present in
  *      the span index (known-span ratio);
  *   2. the FIRST failing rule (short → pii → repetitive → dup) decides
  *      `reason`; docs with none are accepted;
  *   3. the decision log (every doc + reason) and the ACCEPTED docs'
  *      distinct span digests append partition-per-epoch — the same
  *      idempotent at-least-once layout as [[DedupIngest]], and the probe
  *      excludes the batch's own epoch partition so a crash-replay scores
  *      the identical batch against the identical index view.
  *
  * Rejected docs contribute no spans: unlike min-id dedup (where a
  * dropped doc must veto its own later near-dups), span admission is
  * ratio-based — indexing rejected docs would let one spammy doc poison
  * every later doc that legitimately shares a few spans.
  */
object CurationGate {

  case class Rules(minTokens: Int = 5, maxRepRatio: Double = 0.5,
      maxPii: Int = 0, maxKnownSpanRatio: Double = 0.5)

  /** Decision columns for one batch of (`idCol`, `textCol`) docs given a
    * (possibly empty) frame of known span digests (`__h`). Exposed for
    * the spec; [[start]] wires it per micro-batch. */
  def decide(batch: DataFrame, idCol: String, textCol: String,
      knownSpans: DataFrame, rules: Rules): DataFrame = {
    val t = split(col(textCol), " ")
    val scored = batch.select(col(idCol),
      explode_outer(Curation.spanHashArr(col(textCol))).as("__h"))
    // known-span ratio; docs shorter than SpanK carry one whole-text
    // span, so exact re-crawls of short docs still trip the dup rule.
    // The index is a SET: a digest present in several epoch partitions
    // (re-indexed spans, compaction crash leftovers) must count once, or
    // the left join would multiply both counts and skew the ratio.
    val spanStats = scored
      .join(knownSpans.select(col("__h")).distinct()
        .withColumn("__known", lit(1)), Seq("__h"), "left")
      .groupBy(idCol)
      .agg(count(col("__h")).as("__n_spans"),
        count(col("__known")).as("__n_known"))
    val pii = Curation.q63PiiRedactionOn(
        batch.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .select(col("doc_id").as(idCol),
        (col("n_email") + col("n_phone") + col("n_ip")).as("__pii"))
    val rep = Curation.q65RepetitionOn(
        batch.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .select(col("doc_id").as(idCol), col("rep_ratio").as("__rep"))
    batch
      // null text must fail too_short, not null-propagate through every
      // rule and fall out at otherwise("ok")
      .withColumn("__n_tok", coalesce(size(t), lit(0)))
      .join(spanStats, Seq(idCol), "left")
      .join(pii, Seq(idCol), "left")
      .join(rep, Seq(idCol), "left") // absent for <3-token docs → null
      .withColumn("known_span_ratio",
        when(col("__n_spans") > 0,
          col("__n_known").cast("double") / col("__n_spans")).otherwise(0.0))
      .withColumn("reason",
        when(col("__n_tok") < rules.minTokens, "too_short")
          .when(col("__pii") > rules.maxPii, "pii")
          .when(coalesce(col("__rep"), lit(0.0)) > rules.maxRepRatio, "repetitive")
          .when(col("known_span_ratio") > rules.maxKnownSpanRatio, "dup")
          .otherwise("ok"))
      .withColumn("accepted", col("reason") === "ok")
      .drop("__n_tok", "__n_spans", "__n_known", "__pii", "__rep")
  }

  /** `docs` must be a STREAMING frame of (`idCol`: long, `textCol`:
    * string). Decisions land under `decisionsPath/__batch=<id>`, accepted
    * docs' span digests under `spanIndexPath/__batch=<id>`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      spanIndexPath: String, decisionsPath: String, checkpointDir: String,
      rules: Rules = Rules(), compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // fold committed span epochs below this batch (see EpochStore)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(spark, spanIndexPath, cutoff = batchId)
        // Store-absent vs store-unreadable are DIFFERENT conditions
        // ([[StoreGuard]]): the old broad `catch AnalysisException →
        // empty` silently degraded the known-spans index to empty on
        // schema drift — the gate forgot every committed span and
        // re-admitted every dup. Writer-derived schema (the exact frame
        // shape this stage writes below), loud footer-drift gate.
        val spanSchema = batch
          .select(explode(Curation.spanHashArr(col(textCol))).as("__h"))
          .schema.add("__batch", org.apache.spark.sql.types.LongType)
        val known =
          if (StoreGuard.exists(spark, spanIndexPath)) {
            StoreGuard.verifyStoreSchema(spark, spanIndexPath, spanSchema,
              Seq("__h"))
            spark.read.schema(spanSchema).parquet(spanIndexPath)
              // crash-replay safety: the batch's own epoch partition may
              // already be on disk; excluding it restores the pre-crash
              // index view so the replay decides identically
              .where(col("__batch") =!= batchId)
              .select("__h")
          } else
            spark.emptyDataFrame.select(lit("").as("__h")).limit(0)
        val decisions = decide(batch, idCol, textCol, known, rules).cache()
        decisions.write.mode(SaveMode.Overwrite)
          .parquet(s"$decisionsPath/__batch=$batchId")
        decisions.where(col("accepted"))
          .select(explode(Curation.spanHashArr(col(textCol))).as("__h"))
          .distinct()
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$spanIndexPath/__batch=$batchId")
        decisions.unpersist()
        ()
      }
      .start()
}
