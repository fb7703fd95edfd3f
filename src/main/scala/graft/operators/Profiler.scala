package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic one-pass column profiler — the data-quality snapshot a
  * curation run takes before choosing filters: per column, null counts,
  * cardinality, and min/max rendered as strings (schema-agnostic long
  * format, one row per column).
  *
  * Scale shape: ALL columns profile in ONE aggregation job (no
  * per-column scans). `exact = false` (the default, and the 100 TB
  * path) estimates cardinality with approx_count_distinct — a single
  * mergeable HLL pass, no row expansion. `exact = true` uses true
  * COUNT(DISTINCT), which Catalyst plans via Expand (one row copy per
  * distinct aggregate) — affordable on dimension-sized inputs and
  * required for cross-engine oracle checks, quadratic-ish waste at
  * petabyte scale. Callers pick; the default is the scalable one.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val distinctOf: String => Column =
      if (exact) c => count_distinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      distinctOf(c).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val row = df.agg(allAggs.head, allAggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `__n_$c`, `__d_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS (col_name, n_non_null, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("n_rows"), col("n_non_null"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
