package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Frozen-reference LM scoring + lane routing: the continuous twin of
  * the batch q106 (LM score) / q132 (CCNet bucketing) pair.
  *
  * The batch pair scores a corpus against ITSELF; a crawl stream instead
  * scores each arriving doc against a reference model trained once on a
  * trusted corpus and then FROZEN — the CCNet production shape (Wenzek
  * et al. 2020): a document's lane must not drift as unrelated crawl
  * volume accumulates, and re-fitting per micro-batch would be both
  * wrong (self-reinforcing) and a full-history scan. Routing cuts are
  * absolute micro-nat thresholds chosen offline from the reference
  * score distribution, not batch-relative terciles, for the same reason.
  *
  * Scale shape: the model's bigram table can be huge (web-scale vocab²),
  * so it is NOT broadcast — [[load]] repartitions it by its join keys
  * and caches, so every micro-batch join reuses the model's partitioning
  * and shuffles ONLY the (small) batch side. Unseen bigrams back off via
  * add-1 smoothing with count 0 — scoring is total on any input.
  *
  * Lanes land under `routedPath/__batch=<epoch>/lane=<head|middle|tail>`
  * — the [[ShardedIngest]] layout: epoch outside for idempotent
  * at-least-once replay, lane inside so a trainer reading one lane
  * partition-prunes the rest.
  */
object LmRouter {

  /** A single space can never be a token of `split(text, " ")`, so this
    * bigram matches no model entry: docs with <2 tokens score as one
    * unseen bigram instead of vanishing. */
  private val Sentinel = " "

  /** Train and freeze the reference model from a batch corpus: bigram
    * counts, left-context totals, and the unigram vocab size, persisted
    * as three parquet tables under `modelPath`. One pass, two shuffles
    * (bigram agg + its w1 roll-up) — the q106 aggregation without the
    * self-join back onto the corpus. */
  def train(docs: DataFrame, textCol: String, modelPath: String): Unit = {
    val spark = docs.sparkSession
    val t = split(col(textCol), " ")
    val bg = docs.where(size(t) >= 2)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(t.as("__t"))
      // the ONE bigram construction (graft.queries.Curation.bigramStructs):
      // train, score and the batch q106/q132 pair must tokenize identically
      .select(explode(graft.queries.Curation.bigramStructs(col("__t"))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    c12.write.mode(SaveMode.Overwrite).parquet(s"$modelPath/c12.parquet")
    val c12Back = spark.read.parquet(s"$modelPath/c12.parquet")
    c12Back.groupBy("w1").agg(sum("c12").as("c1"))
      .write.mode(SaveMode.Overwrite).parquet(s"$modelPath/c1.parquet")
    docs.select(explode(t).as("__tok"))
      .agg(count_distinct(col("__tok")).as("v"))
      .write.mode(SaveMode.Overwrite).parquet(s"$modelPath/meta.parquet")
  }

  /** A loaded (and cached) frozen model. `v` is collected once at load —
    * a 1-row table, never per batch. */
  case class Model(c12: DataFrame, c1: DataFrame, v: Long)

  /** Load the frozen model, co-partitioned on its join keys and cached:
    * successive micro-batch joins reuse this partitioning, so only the
    * batch side of each join shuffles. */
  def load(spark: SparkSession, modelPath: String): Model = {
    val n = spark.sessionState.conf.numShufflePartitions
    val c12 = spark.read.parquet(s"$modelPath/c12.parquet")
      .repartition(n, col("w1"), col("w2")).cache()
    val c1 = spark.read.parquet(s"$modelPath/c1.parquet")
      .repartition(n, col("w1")).cache()
    c12.count(); c1.count()
    val v = spark.read.parquet(s"$modelPath/meta.parquet")
      .head().getLong(0)
    Model(c12, c1, v)
  }

  /** Score (`idCol`, `textCol`) docs against the frozen model:
    * (id, n_bigrams, sum_lp_micro, avg_lp_micro). Docs with fewer than
    * two tokens (no bigrams) score as one unseen bigram, so short junk
    * still routes (to the tail) instead of vanishing. */
  def score(docs: DataFrame, idCol: String, textCol: String, m: Model): DataFrame = {
    val t = split(col(textCol), " ")
    val bg = docs
      .select(col(idCol),
        when(size(t) >= 2, graft.queries.Curation.bigramStructs(t))
          .otherwise(array(struct(
            lit(Sentinel).as("w1"), lit(Sentinel).as("w2"))))
          .as("__bg"))
      .select(col(idCol), explode(col("__bg")).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    bg
      .join(m.c12, Seq("w1", "w2"), "left")
      .join(m.c1, Seq("w1"), "left")
      .select(col(idCol),
        graft.queries.Curation.lpMicroExpr(
          coalesce(col("c12"), lit(0L)), coalesce(col("c1"), lit(0L)),
          lit(m.v.toDouble)).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("__lp").as("sum_lp_micro"))
      .withColumn("avg_lp_micro",
        round(col("sum_lp_micro").cast("double") / col("n_bigrams"), 6))
  }

  /** Lane for an `avg_lp_micro` column under absolute micro-nat cuts. */
  def lane(avgLpMicro: org.apache.spark.sql.Column, headCut: Double,
      tailCut: Double): org.apache.spark.sql.Column =
    when(avgLpMicro >= headCut, "head")
      .when(avgLpMicro < tailCut, "tail")
      .otherwise("middle")

  /** `docs` must be a STREAMING frame of (`idCol`: long, `textCol`:
    * string). Scored docs land under `routedPath/__batch=<epoch>/lane=`.
    * The model is loaded (and cached) ONCE at start, not per batch — it
    * stays cached for the session; callers that restart routers should
    * [[load]] once themselves, use the [[Model]] overload, and unpersist
    * on teardown (the [[CrawlPipeline]] pattern). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      modelPath: String, routedPath: String, checkpointDir: String,
      headCut: Double, tailCut: Double, compactEvery: Int = 0,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    start(docs, idCol, textCol, load(docs.sparkSession, modelPath),
      routedPath, checkpointDir, headCut, tailCut, compactEvery, trigger)

  /** [[start]] with a caller-managed (pre-loaded, caller-released)
    * model. */
  def start(docs: DataFrame, idCol: String, textCol: String, m: Model,
      routedPath: String, checkpointDir: String,
      headCut: Double, tailCut: Double, compactEvery: Int,
      trigger: Trigger): StreamingQuery = {
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          EpochStore.compact(spark, routedPath, cutoff = batchId,
            subPartitionBy = Seq("lane"))
        batch
          .join(score(batch, idCol, textCol, m), Seq(idCol))
          .withColumn("lane", lane(col("avg_lp_micro"), headCut, tailCut))
          .repartition(col("lane"))
          .write.partitionBy("lane").mode(SaveMode.Overwrite)
          .parquet(s"$routedPath/__batch=$batchId")
        ()
      }
      .start()
  }
}
