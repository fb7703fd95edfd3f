package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * All loaders are plain `spark.read.parquet` scans so Catalyst keeps full
  * control of column pruning and predicate pushdown — callers `.select`/
  * `.filter` and the filters reach the parquet reader (verify with
  * `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Engine bootstrap: install the native vector expressions on whatever
    // session is in use (idempotent; also available via GraftExtensions).
    graft.plans.VectorExpressions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses by default. Read nanos as long and floor-convert to
    * microsecond TimestampType (all downstream use is ≥ second granularity).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // set-once (session config mutation per call would thrash the plan
    // cache and surprise concurrent readers of the same session)
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
