package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source readers (SURVEY §2.1). Explicit schemas preferred over
  * inference — at 100 TB an inferSchema pass is a full extra scan. */
object Sources {

  /** CSV batch scan (SURVEY S3; reference notebook cell 1 semantics:
    * header, '#' comments). Pass a schema to skip the inference scan;
    * fall back to inference only when none is given. */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None)
      : DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("comment", "#")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV scan with malformed-row AUDIT instead of silent null-out: rows
    * that fail the schema land intact in `corruptCol` (PERMISSIVE +
    * columnNameOfCorruptRecord), so a 100 TB ingest can split the feed
    * into clean rows and a quarantine sink in one pass — no second scan,
    * no dropped data. `where(col(corruptCol).isNull)` is the clean side;
    * `.isNotNull` is the quarantine. */
  def csvAudited(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("header", "true")
      .option("comment", "#")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .csv(path)

  /** ORC batch scan — same columnar pushdown/pruning contract as
    * parquet (predicate pushdown, column pruning, partition-dir
    * pruning), for lakes standardized on ORC. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines batch scan. Schema is REQUIRED: on a 100 TB crawl dump
    * an inference pass is a full extra scan, and inferred types drift
    * with the sample. Rows that fail the schema land intact in
    * `_corrupt_record` (PERMISSIVE), the [[csvAudited]] quarantine
    * contract. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .json(path)

  /** JDBC batch scan (SURVEY S2). The reference reads the full history
    * table through a SINGLE connection (Main.scala:131-137); at scale the
    * scan must be split — pass a numeric `partitionColumn` with bounds and
    * Spark issues `numPartitions` range-bounded queries in parallel.
    * Predicates on the result are pushed into the remote WHERE clause by
    * JDBCRelation. */
  def jdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = props.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
    partitionColumn.fold(withProps) { case (colName, lower, upper, n) =>
      withProps
        .option("partitionColumn", colName)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
    }.load()
  }
}
