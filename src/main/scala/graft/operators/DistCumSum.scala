package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cumulative sum over an ordered numeric domain.
  *
  * `sum(c).over(Window.orderBy(k))` moves the WHOLE frame to one
  * partition (Spark warns exactly that) — fine for a 10-row histogram,
  * a scale-killer when the distinct-value domain is wide. This is the
  * classic two-level scan instead:
  *
  *   1. split the key domain into P contiguous buckets at quantile cut
  *      points computed once on the driver — bucket assignment is a pure
  *      function of the VALUE, so every downstream action re-derives the
  *      identical partitioning (no cache needed, unlike
  *      `repartitionByRange`, whose sampled bounds can differ between
  *      the offsets action and the final join action);
  *   2. per-bucket running sum (a PARTITIONED window — parallel);
  *   3. per-bucket totals (≤ P rows) become exclusive offsets on the
  *      driver and broadcast-join back.
  *
  * The driver-side step touches P rows — bounded by the cluster, not
  * the data — and the result is the exact global running sum regardless
  * of where the (approximate) cuts fall.
  */
object DistCumSum {

  /** Adds `outCol` = running sum of `cntCol` in ascending (nulls-first)
    * `keyCol` order. `df`'s keys must be distinct (a histogram) and
    * numeric (castable to double, order-preserving). */
  def overDomain(df: DataFrame, keyCol: String, cntCol: String,
      outCol: String = "cum"): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val key = col(keyCol)
    // quantile cut points over the key domain; relativeError trades cut
    // evenness (load balance) for speed, never correctness
    val cuts = df.stat.approxQuantile(
      keyCol, (1 until p).map(_.toDouble / p).toArray, 0.01)
    // bucket = #cuts strictly below key; pure value function. Nulls sort
    // first → their own bucket below every cut.
    val bucket: Column =
      when(key.isNull, lit(-1))
        .otherwise(cuts.distinct.sorted
          .foldLeft(lit(0)) { (acc, c) => acc + when(key > lit(c), 1).otherwise(0) })
    val bucketed = df.withColumn("__bk", bucket)
    val w = Window.partitionBy("__bk")
      .orderBy(key.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local", sum(col(cntCol)).over(w))
    // per-bucket totals: ≤ P+1 rows — driver-safe by construction
    val totals = bucketed.groupBy("__bk")
      .agg(sum(col(cntCol)).cast("long").as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (bk, tot) =>
      val off = acc; acc += tot; (bk, off)
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__bk", "__off")
    local.join(broadcast(offDf), Seq("__bk"), "left")
      .withColumn(outCol, col("__local") + coalesce(col("__off"), lit(0L)))
      .drop("__bk", "__local", "__off")
  }
}
