package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Distributed cumulative sum over an ordered domain.
  *
  * `sum(c).over(Window.orderBy(k))` moves the WHOLE frame to one
  * partition (Spark warns exactly that) — fine for a 10-row histogram,
  * a scale-killer when the distinct-value domain is wide. This is the
  * classic two-level scan instead:
  *
  *   1. split the key domain into ≤ P contiguous buckets at cut points
  *      computed once on the driver — bucket assignment is a pure
  *      function of the VALUE, so every downstream action re-derives the
  *      identical partitioning (no `repartitionByRange`, whose sampled
  *      bounds can differ between the offsets action and the final join
  *      action);
  *   2. per-bucket running sum (a PARTITIONED window — parallel);
  *   3. per-bucket totals (≤ P+1 rows) become exclusive offsets on the
  *      driver and broadcast-join back.
  *
  * Cut points: quantiles for numeric keys; for any other orderable type,
  * a deterministic hash-sample of the keys (a uniform sample's order
  * statistics approximate quantiles). Cuts only balance load — bucket =
  * "#cuts strictly below key" is monotone in the key for ANY cut set, so
  * exactness never depends on where they fall. The bucket expression is
  * one `filter` over a literal array (constant depth — a P-deep
  * when-chain would break codegen at production partition counts).
  *
  * The input is evaluated by three actions (cuts, totals, the caller's);
  * it is cached across the two internal ones and released before
  * returning — the caller's action recomputes the histogram once, and
  * no cached frame outlives the call.
  */
object DistCumSum {

  /** ≤ `p−1` cut points over `keyCol`'s value domain: quantiles for
    * numeric keys, a deterministic hash-sample otherwise. Cuts only
    * balance load — [[bucketExpr]] stays monotone for ANY cut set.
    * Shared with [[Skyline]], which runs the same two-level scan with a
    * max instead of a sum. */
  private[operators] def domainCuts(hist: DataFrame, keyCol: String,
      p: Int): Array[Any] = {
    val key = col(keyCol)
    if (hist.schema(keyCol).dataType.isInstanceOf[NumericType])
      hist.stat.approxQuantile(
        keyCol, (1 until p).map(_.toDouble / p).toArray, 0.01)
        .distinct.map(_.asInstanceOf[Any])
    else
      // deterministic pseudo-random sample ≈ uniform quantiles; works
      // for any orderable type (string, date, …)
      hist.where(key.isNotNull)
        .orderBy(xxhash64(lit("cumsum:"), key)).limit(p - 1)
        .select(key).collect().map(_.get(0)).distinct
  }

  /** Bucket = #cuts strictly below key (monotone for any cut set; a
    * duplicate or unsorted cut only shifts bucket ids, never order).
    * Nulls sort first → their own bucket below every cut. A pure value
    * function, so every downstream action re-derives the identical
    * partitioning. */
  private[operators] def bucketExpr(key: Column, cuts: Array[Any]): Column =
    if (cuts.isEmpty) when(key.isNull, lit(-1)).otherwise(lit(0))
    else when(key.isNull, lit(-1))
      .otherwise(size(filter(array(cuts.toIndexedSeq.map(c => lit(c)): _*), c => key > c)))

  /** Adds `outCol` = running sum of `cntCol` in ascending (nulls-first)
    * `keyCol` order. `df`'s keys must be distinct (a histogram). */
  def overDomain(df: DataFrame, keyCol: String, cntCol: String,
      outCol: String = "cum"): DataFrame =
    overDomainAll(df, keyCol, Seq(cntCol -> outCol))

  /** [[overDomain]] for several counter columns at once — ONE cut
    * computation, one partitioned window pass, and one totals action
    * shared across all of them, instead of re-running the whole
    * two-level scan per column. `cols` maps each counter column to its
    * running-sum output column. */
  def overDomainAll(df: DataFrame, keyCol: String,
      cols: Seq[(String, String)]): DataFrame = {
    require(cols.nonEmpty, "at least one (cntCol, outCol) required")
    require(cols.map(_._2).distinct.size == cols.size,
      s"duplicate output columns in ${cols.map(_._2)}")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val key = col(keyCol)
    val hist = df.cache()
    val cuts = domainCuts(hist, keyCol, p)
    val bucketed = hist.withColumn("__bk", bucketExpr(key, cuts))
    val w = Window.partitionBy("__bk")
      .orderBy(key.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.foldLeft(bucketed) { case (d, (cnt, out)) =>
      d.withColumn(s"__local_$out", sum(col(cnt)).over(w))
    }
    // per-bucket totals: ≤ P+1 rows — driver-safe by construction
    val totals = bucketed.groupBy("__bk")
      .agg(sum(col(cols.head._1)).cast("long").as(s"__tot_${cols.head._2}"),
        cols.tail.map { case (cnt, out) =>
          sum(col(cnt)).cast("long").as(s"__tot_$out")
        }: _*)
      .collect().map(r => (r.getInt(0),
        cols.indices.map(i => r.getLong(i + 1)))).sortBy(_._1)
    // the two internal actions (cuts + totals) are done with the cache;
    // release it rather than leak one cached frame per call for the
    // session lifetime — the caller's action recomputes the histogram
    // once, which is the floor without handing the caller a cleanup duty
    hist.unpersist()
    val acc = Array.fill(cols.size)(0L)
    val offsets = totals.map { case (bk, tots) =>
      val offs = acc.toSeq
      tots.zipWithIndex.foreach { case (t, i) => acc(i) += t }
      (bk, offs)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__bk", "__offs")
    val joined = local.join(broadcast(offDf), Seq("__bk"), "left")
    val withOut = cols.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__local_$out") +
          coalesce(element_at(col("__offs"), i + 1), lit(0L)))
    }
    withOut.drop("__bk" +: "__offs" +: cols.map(c => s"__local_${c._2}"): _*)
  }
}
