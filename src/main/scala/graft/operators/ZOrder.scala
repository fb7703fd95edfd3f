package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional data skipping.
  *
  * Sorting a table by ONE column gives tight per-file min/max ranges for
  * that column only; filters on any other column read every file.
  * Interleaving the bits of two (or more) key columns and range-writing
  * by the interleaved value gives every file a tight range on EVERY
  * interleaved dimension — parquet footer min/max then prunes files for
  * filters on any of them. This is the standard layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed as plain Spark:
  * pure column math + `repartitionByRange` + `sortWithinPartitions`.
  *
  * At 100 TB the write is one range shuffle (sampled bounds, AQE-sized
  * output files); reads pay nothing — skipping happens in the scan from
  * footer stats.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`.
    * Pure codegen-friendly shift/mask expressions — no UDF. */
  def interleave(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** Rank-normalize a column to dense [0, 2^bits) so arbitrary skewed /
    * wide domains interleave evenly: percent_rank scaled to the bit
    * budget. The cumulative count runs over the distinct-value histogram
    * (the exact-quantile compression trick) via [[DistCumSum]] — bucketed
    * and parallel, never a single-partition global window. */
  def rankNormalize(df: DataFrame, c: String, bits: Int = 16): DataFrame = {
    val hist = df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
    val n = df.count()
    val ranked = DistCumSum.overDomain(hist, c, "__c", "__cum")
      .select(col(c).as("__zk"),
        least(floor((col("__cum") - col("__c")) * (1L << bits) / n),
          lit((1L << bits) - 1)).as(s"__z_$c"))
    // Null-safe left join: groupBy gives NULL keys their own histogram
    // row (nulls-first window order → lowest rank), and `<=>` matches it
    // back, so nullable key columns never lose rows. The coalesce-to-0
    // is a belt-and-braces sentinel only.
    df.join(ranked, col(c) <=> col("__zk"), "left")
      .drop("__zk")
      .withColumn(s"__z_$c", coalesce(col(s"__z_$c"), lit(0L)))
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `path` as `numFiles`
    * parquet files. Both columns are rank-normalized first, so any
    * orderable domain works (numeric, string, date — see
    * [[DistCumSum.overDomain]]'s cut-point strategies). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val normalized = rankNormalize(rankNormalize(df, colA, bits), colB, bits)
      .withColumn("__z", interleave(col(s"__z_$colA"), col(s"__z_$colB"), bits))
    normalized
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", s"__z_$colA", s"__z_$colB")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) span of `c` after a layout — the data-skipping
    * effectiveness measure: the fraction of files a point/range filter on
    * `c` must read is proportional to the mean normalized span. */
  def fileSpans(readBack: DataFrame, c: String): DataFrame =
    readBack
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
}
