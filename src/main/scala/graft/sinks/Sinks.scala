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

  /** Kafka batch write: all columns re-serialized as one JSON value
    * (SURVEY K3; reference spark_main.py:90-98 semantics). */
  def kafkaJson(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
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
}
