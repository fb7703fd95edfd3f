package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic one-pass column profiler — the data-quality snapshot a
  * curation run takes before choosing filters: per column, null counts,
  * cardinality, and min/max rendered as strings (schema-agnostic long
  * format, one row per column).
  *
  * Scale shape: with `exact = false` (the default, and the 100 TB path)
  * ALL columns profile in ONE aggregation pass — cardinality comes from
  * approx_count_distinct, a mergeable HLL, so there is no row
  * expansion and no per-column scan. `exact = true` (true
  * COUNT(DISTINCT), required for cross-engine oracle checks) instead
  * unions one aggregation branch per column: a single multi-distinct
  * aggregate would Expand the input ×(k+1), while per-column branches
  * each column-prune their scan to exactly one column — far cheaper on
  * columnar inputs, and the branches run inside one job.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    if (exact) {
      cols.map { c =>
        df.agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_non_null"),
            count_distinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_s"),
            max(col(c)).cast("string").as("max_s"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_non_null"),
            (col("n_rows") - col("n_non_null")).as("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      }.reduce(_ unionByName _)
    } else {
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c)).as(s"__d_$c"),
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
}
