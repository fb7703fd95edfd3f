package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch sinks (SURVEY §2.2). */
object Sinks {

  /** JDBC append (SURVEY K2; reference Main.scala:101-108 semantics). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val base = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
      .mode(SaveMode.Append)
      .save()
  }

  /** The Kafka-write serialization contract, exposed broker-free: all
    * columns folded into ONE JSON `value` column — the exact payload
    * shape [[graft.streaming.Ingest.parseJson]] unmarshals on the read
    * side, so write → read round-trips (KafkaContractSpec). */
  def kafkaJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Kafka batch write: all columns re-serialized as one JSON value
    * (SURVEY K3; reference spark_main.py:90-98 semantics). */
  def kafkaJson(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    kafkaJsonValue(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** Single-file CSV export (SURVEY K4). `coalesce(1)` is for small result
    * exports only — never for data-scale output (single-writer bottleneck);
    * use [[parquet]] for that. */
  def csvSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("header", "true")
      .mode(SaveMode.Overwrite)
      .csv(path)

  /** Partitioned parquet — the default landing zone at scale (SURVEY K5).
    * Partition columns turn downstream date/region predicates into
    * partition pruning instead of full scans. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Partitioned ORC — the [[parquet]] contract for ORC-standardized
    * lakes (same pruning semantics, same append layout). */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** JSON-lines export — for interchange with non-columnar consumers
    * (crawl tooling, queues). Text formats lose types; keep this for
    * edges, not for the landing zone. */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed managed-table write: pre-shuffles ONCE at write time so
    * every later join or aggregation on `key` between co-bucketed tables
    * runs with ZERO exchanges (the scan's output partitioning already
    * satisfies the join's required distribution — BucketedJoinSpec
    * asserts the exchange-free plan). This is the storage-layout answer
    * to the "same fact table joined on the same key every day" pattern:
    * at 100 TB you pay the shuffle once per ingest, not once per query.
    * `sortBy` additionally pre-orders within buckets so sort-merge joins
    * skip their sort. Bucket count should be sized so one bucket ≈ one
    * task's worth of data at the target scale. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
