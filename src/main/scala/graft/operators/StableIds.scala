package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed stable row numbering — `row_number() OVER (ORDER BY
  * key)` without the single-partition global window (the classic
  * 100 TB scale-killer: Spark warns "Moving all data to a single
  * partition" and then OOMs the one executor the whole corpus lands
  * on). The `RDD.zipWithIndex` two-job pattern, applied to a
  * range-partitioned frame:
  *
  *   1. `repartitionByRange(key).sortWithinPartitions(key)` — ONE
  *      shuffle; ranges are disjoint and ascending with partition id,
  *      so global order = (partition id, in-partition order);
  *   2. job 1 counts each partition (reads the shuffle files, not the
  *      source — shuffle outputs are reused across jobs in a session);
  *      the ≤-#partitions counts fold into exclusive prefix offsets
  *      on the driver (bounded by design) and broadcast back;
  *   3. job 2 re-reads the same shuffle files and streams each
  *      partition once, emitting `offset(pid) + local position`.
  *
  * This is one of the few operators where dropping to the RDD is the
  * RIGHT call, not a fallback: the DataFrame formulation (window over
  * `spark_partition_id()` + a count aggregate) plans a second full
  * exchange of the corpus and — measured on this build — re-scans the
  * source for the counts branch because the two range exchanges fail
  * to canonicalize equal; the RDD two-job form shuffles the corpus
  * exactly once and touches no parquet twice.
  *
  * The result is EXACTLY the global rank — independent of where the
  * sampled range boundaries fall — whenever `key` is unique (ties
  * would be split across range partitions arbitrarily; pass a
  * tiebreaking composite key instead).
  */
object StableIds {

  /** Append `stable_id` (1-based rank in `key` order) to `df`.
    * `key` must be unique per row. */
  def withStableIds(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(key).sortWithinPartitions(key)
    val rdd = parted.rdd // shuffle files written once, read by 2 jobs
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2) // <= #partitions longs: bounded
    val offsets = counts.scanLeft(0L)(_ + _).dropRight(1)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = bc.value(i)
      it.map { row => n += 1; Row.fromSeq(row.toSeq :+ n) }
    }
    spark.createDataFrame(out,
      StructType(parted.schema.fields :+
        StructField("stable_id", LongType, nullable = false)))
  }
}
