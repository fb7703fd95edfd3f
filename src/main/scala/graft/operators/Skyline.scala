package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2D skyline (Pareto frontier): the rows not dominated
  * under (minimize `xCol`, maximize `yCol`) — `a` dominates `b` iff
  * `a.x ≤ b.x ∧ a.y ≥ b.y` with at least one strict. The classic OLAP
  * "best trade-offs" operator (Börzsönyi et al., ICDE 2001).
  *
  * The naive formulation is a quadratic dominance self-join. In 2D it
  * collapses to a cumulative max: a point survives iff its `y` is the
  * best at its `x` AND strictly above every `y` at strictly lower `x`.
  * That makes the whole operator three combinable passes, none of which
  * ever compares pairs:
  *
  *   1. distinct-`x` reduction — `groupBy(x).agg(max(y))` (partial aggs
  *      map-side, one shuffle on `x`);
  *   2. EXCLUSIVE prefix max of `ymax` over ascending `x` — the
  *      [[DistCumSum]] two-level scan (per-bucket partitioned window +
  *      ≤ P driver-side bucket maxima broadcast back), never a
  *      single-partition global window;
  *   3. a join back on `x` filtering `y = ymax(x) ∧ prefixMax(x) < y`.
  *
  * Ties are exact: equal points never dominate each other (both kept
  * when frontier-best at their `x`); a same-`x` point with smaller `y`
  * is dominated by step 3's `y = ymax` test; the prefix max is over
  * STRICTLY smaller `x`, so equal-`x` points never prune each other
  * through step 2. `y` is compared as double internally — exact for
  * integral `y` up to 2^53.
  *
  * Rows with a null `x` or `y` are incomparable and EXCLUDED. Note this
  * is stricter than a naive SQL `NOT EXISTS` dominance oracle, where
  * null comparisons make such rows undominated frontier members — a
  * caller pairing this operator with a `NOT EXISTS` oracle on nullable
  * columns must filter nulls on both sides.
  */
object Skyline {

  /** The frontier rows of `df` (original columns, un-renamed). */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val x = col(xCol)
    val y = col(yCol)
    val pts = df.where(x.isNotNull && y.isNotNull)
    val g = pts.groupBy(x.as("__x"))
      .agg(max(y).cast("double").as("__ymax")).cache()
    val cuts = DistCumSum.domainCuts(g, "__x", p)
    val bucketed = g.withColumn("__bk", DistCumSum.bucketExpr(col("__x"), cuts))
    // within-bucket exclusive running max; null on each bucket's first row
    val w = Window.partitionBy("__bk").orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__lmax", max(col("__ymax")).over(w))
    // per-bucket maxima (≤ P+1 rows — driver-safe by construction) →
    // exclusive prefix maxima, broadcast back; −∞ = "nothing before"
    val totals = bucketed.groupBy("__bk").agg(max(col("__ymax")).as("__m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    g.unpersist()
    var acc = Double.NegativeInfinity
    val offsets = totals.map { case (bk, m) =>
      val off = acc; acc = math.max(acc, m); (bk, off)
    }.toSeq
    val offDf = offsets.toDF("__bk", "__off")
    val prefix = local.join(broadcast(offDf), Seq("__bk"), "left")
      .withColumn("__pmax",
        greatest(coalesce(col("__lmax"), lit(Double.NegativeInfinity)), col("__off")))
      .select(col("__x"), col("__ymax"), col("__pmax"))
    pts.join(prefix, x === col("__x"))
      .where(y.cast("double") === col("__ymax") && col("__pmax") < col("__ymax"))
      .drop("__x", "__ymax", "__pmax")
  }
}
