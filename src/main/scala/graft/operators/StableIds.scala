package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed stable row numbering — `row_number() OVER (ORDER BY
  * key)` without the single-partition global window (the classic
  * 100 TB scale-killer: Spark warns "Moving all data to a single
  * partition" and then OOMs the one executor the whole corpus lands
  * on). The standard two-pass trick, expressed in pure DataFrame ops:
  *
  *   1. `repartitionByRange(key)` — ranges are disjoint and ascending
  *      with partition id, so global order = (partition id, in-
  *      partition order);
  *   2. a window partitioned by `spark_partition_id()` assigns LOCAL
  *      ranks (each partition sorts independently — bounded memory);
  *   3. per-partition counts (a ≤-#partitions-row aggregate) turn
  *      into exclusive prefix offsets via a window over that tiny
  *      frame, broadcast back, and `id = offset + local_rank`.
  *
  * The result is EXACTLY the global rank — independent of where the
  * sampled range boundaries fall — whenever `key` is unique (ties
  * would be split across range partitions arbitrarily; pass a
  * tiebreaking composite key instead).
  */
object StableIds {

  /** Append `stable_id` (1-based dense rank order of `key`) to `df`.
    * `key` must be unique per row. */
  def withStableIds(df: DataFrame, key: Column): DataFrame = {
    val parted = df.repartitionByRange(key).withColumn("__pid",
      spark_partition_id())
    val local = parted.withColumn("__rn",
      row_number().over(Window.partitionBy("__pid").orderBy(key)))
    // <= #partitions rows: the offset spine is driver-tiny by design
    val offsets = parted.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__offset",
        coalesce(sum("__c").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .withColumn("stable_id", col("__offset") + col("__rn"))
      .drop("__pid", "__rn", "__offset")
  }
}
