package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.sources.Tables

/** Uncertainty quantification at corpus scale: q199 bootstraps a
  * confidence interval for a mean WITHOUT resampling the corpus (Bag of
  * Little Bootstraps, Kleiner et al. 2014 — the only bootstrap that
  * distributes), and q200 runs the A/B-test read-out with CUPED
  * variance reduction (Deng et al. 2013 — the pre-period covariate
  * adjustment every experimentation platform applies before calling a
  * winner). Point estimates without error bars are how 100 TB
  * pipelines ship regressions: a 0.3% quality-score drop is noise at
  * n=10⁴ and a five-sigma alarm at n=10⁹, and only these two
  * operators can tell which.
  *
  * Determinism: "randomness" is md5-keyed (the q122/q98 hash-split
  * discipline) — subset assignment, bootstrap replicate weights, and
  * arm assignment all derive from `md5(salt ‖ key)`, so both engines
  * materialize the identical pseudo-sample. Poisson(1) bootstrap
  * weights come from comparing the 32-bit hash against PRECOMPUTED
  * integer CDF thresholds (the constants are generated once in Scala
  * and pasted verbatim into both engines' expressions — no runtime
  * `exp`/factorial whose libm could disagree).
  */
object Uncertainty {

  /** BLB subset count (s): each subset is an independent little
    * bootstrap; the final CI averages their endpoints. */
  val BlbSubsets = 8

  /** Bootstrap replicates per subset (r). */
  val BlbReplicates = 20

  /** Rank-based percentile indexes into the r sorted replicate means:
    * type-1 quantiles ⌈0.1r⌉ and ⌈0.9r⌉ — an 80% interval. */
  val BlbLoRank: Int = math.ceil(0.1 * BlbReplicates).toInt
  val BlbHiRank: Int = math.ceil(0.9 * BlbReplicates).toInt

  /** Cumulative Poisson(1) CDF × 2³², floored to integer thresholds;
    * a 32-bit hash u draws weight w = #{thresholds ≤ u}. Computed once
    * here (driver-side, exact to the double CDF) and embedded as
    * LITERALS in both engines' CASE expressions. Tail capped at
    * w = 6 (P ≈ 1 − 5.9e-5 covered; the cap is part of the operator's
    * definition, identically on both sides). */
  val PoissonThresholds: Seq[Long] = {
    val cdf = Iterator.iterate((0, 1.0 / math.E, 1.0 / math.E)) {
      case (k, pk, cum) =>
        val p = pk / (k + 1); (k + 1, p, cum + p)
    }.take(6).map(_._3).toSeq
    cdf.map(c => math.floor(c * 4294967296.0).toLong)
  }

  /** `CASE` expression drawing the Poisson(1) weight from hash column
    * `u32` — identical literal thresholds in both engines. */
  private def poissonCase: String =
    PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN u32 < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonThresholds.size} END")

  // ---------------------------------------------------------------- q199

  /** q199 — Bag-of-Little-Bootstraps 80% CI for mean order value. The
    * classic bootstrap is undistributable (every replicate resamples
    * the FULL corpus); BLB splits the corpus into s hash-subsets, runs
    * r multiplier-bootstrap replicates inside each (Poisson(1) weights
    * — never materializing a resample, just weighting the one pass),
    * and averages the s interval endpoints. Error bars for any
    * corpus-mean metric (quality score, toxicity rate, label balance)
    * at one scan's cost.
    *
    * Scale shape: orders × r rows exist only INSIDE the map-side
    * combine of one groupBy((subset, replicate)) — ~s·r aggregate rows
    * come out. The replicate spine is a broadcast constant; windows
    * order r = 20 rows per subset. Everything after the first
    * aggregation is driver-scale. Integer cents, integral divisions;
    * replicate means are exact longs. */
  def q199BlbBootstrap(s: SparkSession, dir: String): DataFrame =
    blbOn(Tables.orders(s, dir).select(
      col("o_orderkey").as("k"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
      T.hashMod("blb-s:", col("o_orderkey"), BlbSubsets).as("subset")))

  /** [[q199BlbBootstrap]] over any (`k` unique key, `cents` metric,
    * `subset`) frame — exposed for the planted spec. */
  def blbOn(base: DataFrame): DataFrame = {
    val reps = base.sparkSession.range(BlbReplicates)
      .select(col("id").as("rep"))
    val weighted = base.crossJoin(broadcast(reps))
      .withColumn("u32", expr(
        "cast(conv(substring(md5(concat('blb-r:', rep, ':', k)), 1, 8), 16, 10) as bigint)"))
      .withColumn("w", expr(poissonCase))
    val repMeans = weighted.groupBy("subset", "rep")
      .agg(sum(expr("w * cents").cast("decimal(38,0)")).as("swx"),
        sum("w").as("sw"))
      .where(col("sw") > 0L)
      .select(col("subset"), col("rep"),
        expr("cast(swx div sw as bigint)").as("mean_cents"))
    val byMean = Window.partitionBy("subset")
      .orderBy(col("mean_cents"), col("rep"))
    val ends = repMeans.withColumn("rk", row_number().over(byMean))
      .groupBy("subset")
      .agg(max(when(col("rk") === BlbLoRank, col("mean_cents"))).as("lo_cents"),
        max(when(col("rk") === BlbHiRank, col("mean_cents"))).as("hi_cents"))
    val subsetStats = base.groupBy("subset")
      .agg(count(lit(1)).as("n_orders"),
        expr("cast(sum(cast(cents as decimal(38,0))) div count(1) as bigint)")
          .as("mean_cents"))
    val global = ends.agg(
      expr(s"cast(sum(cast(lo_cents as decimal(38,0))) div count(1) as bigint)")
        .as("ci_lo_cents"),
      expr(s"cast(sum(cast(hi_cents as decimal(38,0))) div count(1) as bigint)")
        .as("ci_hi_cents"))
    subsetStats.join(ends, "subset")
      .crossJoin(broadcast(global))
      .select(col("subset"), col("n_orders"), col("mean_cents"),
        col("lo_cents"), col("hi_cents"), col("ci_lo_cents"), col("ci_hi_cents"))
  }

  // ---------------------------------------------------------------- q200

  /** Pre/post split day for [[q200CupedAbTest]]: days 0‥14 of the
    * observation window are the pre-period, 15+ the experiment. */
  val CupedSplitDay = 15

  /** q200 — A/B read-out with CUPED variance reduction on events:
    * users hash-split into two arms, per-user post-period value is
    * adjusted by the pooled pre-period regression
    * (ŷ = y − θ(x − x̄), θ = cov(x,y)/var(x)), and the arm contrast is
    * reported with its z-statistic and the variance-reduction factor.
    * Pre-period behavior predicts post-period behavior, so subtracting
    * the predictable part shrinks the error bar at identical sample
    * size — the difference between "need 4 more weeks" and "ship".
    *
    * Integer discipline: per-user sums in cents; θ in ppm from
    * decimal(38,0) sufficient statistics (n·Σxy − ΣxΣy over
    * n·Σx² − (Σx)²); adjusted values in cents via one integral
    * division; per-arm variances from decimal sufficient stats. The
    * single `sqrt` for the z-stat is IEEE-correctly-rounded in both
    * engines (unlike `ln` — sqrt is exact-rounded by spec), applied to
    * identical integer-derived doubles, then milli-snapped.
    *
    * Scale shape: one groupBy(user) over the corpus, then single-row
    * pooled statistics broadcast back onto the per-user frame, a
    * 2-group aggregate, and a 2-row output. */
  def q200CupedAbTest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("user_id"), to_date(col("ts")).as("d"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
    val withMin = e.crossJoin(broadcast(e.agg(min("d").as("d0"))))
    val perUser = withMin
      .withColumn("day", datediff(col("d"), col("d0")))
      .groupBy("user_id")
      .agg(sum(when(col("day") < CupedSplitDay, col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("day") >= CupedSplitDay, col("cents")).otherwise(0L))
          .as("y"))
      .withColumn("arm", T.hashMod("exp:", col("user_id"), 2))
    cupedOn(perUser)
  }

  /** [[q200CupedAbTest]] over any (`x` pre-period cents, `y`
    * post-period cents, `arm` 0/1) per-unit frame — exposed for the
    * hand-computed spec. */
  def cupedOn(perUser: DataFrame): DataFrame = {
    val pooled = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
    val theta = pooled.select(
      expr("cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) as bigint)")
        .as("theta_ppm"),
      expr("cast(sx div n as bigint)").as("xbar_cents"))
    val adj = perUser.crossJoin(broadcast(theta))
      .withColumn("a",
        expr("y - cast(theta_ppm * (x - xbar_cents) div 1000000 as bigint)"))
    val perArm = adj.groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("y").cast("decimal(38,0)")).as("say"),
        sum(col("a").cast("decimal(38,0)")).as("sa"),
        sum(col("a").cast("decimal(38,0)") * col("a")).as("saa"),
        max("theta_ppm").as("theta_ppm"),
        max("xbar_cents").as("xbar_cents"))
      .select(col("arm"), col("n_users"), col("theta_ppm"), col("xbar_cents"),
        expr("cast(say div n_users as bigint)").as("mean_post_cents"),
        expr("cast(sa div n_users as bigint)").as("mean_adj_cents"),
        expr("cast((n_users * saa - sa * sa) div (n_users * (n_users - 1)) as bigint)")
          .as("var_adj_cents2"))
    // pooled variance-reduction factor: 1 − Var(adj)/Var(y), in ppm
    val vr = adj.agg(
        count(lit(1)).as("n"),
        sum(col("a").cast("decimal(38,0)")).as("sa"),
        sum(col("a").cast("decimal(38,0)") * col("a")).as("saa"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(expr(
        "cast(1000000 - (n * saa - sa * sa) * 1000000 div (n * syy - sy * sy) as bigint)")
        .as("var_reduction_ppm"))
    val contrast = perArm
      .groupBy()
      .agg(
        max(when(col("arm") === 1, col("mean_adj_cents"))).as("m1"),
        max(when(col("arm") === 0, col("mean_adj_cents"))).as("m0"),
        max(when(col("arm") === 1, col("var_adj_cents2"))).as("v1"),
        max(when(col("arm") === 0, col("var_adj_cents2"))).as("v0"),
        max(when(col("arm") === 1, col("n_users"))).as("n1"),
        max(when(col("arm") === 0, col("n_users"))).as("n0"))
      .select((col("m1") - col("m0")).as("effect_cents"),
        round(col("m1").minus(col("m0")).cast("double") /
          sqrt(col("v1").cast("double") / col("n1") +
            col("v0").cast("double") / col("n0")) * 1000, 0)
          .cast("long").as("z_milli"))
    perArm.crossJoin(broadcast(contrast))
      .crossJoin(broadcast(vr))
      .select(col("arm"), col("n_users"), col("mean_post_cents"),
        col("mean_adj_cents"), col("var_adj_cents2"), col("theta_ppm"),
        col("xbar_cents"), col("effect_cents"), col("z_milli"),
        col("var_reduction_ppm"))
  }

  // ---------------------------------------------------------------- q205

  /** q205 — split (Mondrian) conformal prediction intervals for event
    * value, grouped by event type: the train split fits the predictor
    * (the per-type integer mean), the calibration split's
    * nonconformity scores |y − ŷ| pick the ⌈0.9(n+1)⌉-th order
    * statistic q̂ (Vovk's split-conformal rank — the ONLY interval
    * recipe whose ≥90% coverage holds with NO distributional
    * assumption, finite-sample, per group), and the held-out test
    * split reports the realized coverage. q199 gives the error bar ON
    * A MEAN; q205 gives the error bar on EVERY PREDICTION — the gate a
    * model-based imputer or value forecast must pass before its output
    * is treated as a range rather than a point.
    *
    * Integer discipline: the split is the q98 md5-hash discipline
    * (train/train/calib/test on h mod 4), ŷ is an integral-division
    * mean in cents, q̂ is a RANK statistic (no interpolation — exact
    * under any engine), and the rank index ⌈0.9(n+1)⌉ is computed as
    * `(9(n+1) + 9) div 10` — pure integers, immune to the 0.9·10 ≠ 9
    * binary-float trap.
    *
    * Scale shape: three groupBy(event_type) passes over the corpus
    * (bounded alphabet); the quantile never sorts calibration rows —
    * it runs on the (type, residual) spine via a per-type cumulative
    * over the bounded residual alphabet, so no corpus-scale window and
    * no per-type skew partition. */
  def q205ConformalInterval(s: SparkSession, dir: String): DataFrame =
    conformalOn(Tables.events(s, dir).select(
      col("event_type"),
      expr("cast(round(value * 100) as bigint)").as("cents"),
      T.hashMod("conf:", col("event_id"), 4).as("split")))

  /** [[q205ConformalInterval]] over any (`event_type`, `cents`,
    * `split` 0-3) frame — exposed for the hand-computed planted spec.
    * Splits 0/1 train, 2 calibrate, 3 test. */
  def conformalOn(rows: DataFrame): DataFrame = {
    val train = rows.where(col("split") < 2).groupBy("event_type")
      .agg(count(lit(1)).as("n_train"),
        expr("cast(sum(cast(cents as decimal(38,0))) div count(1) as bigint)")
          .as("yhat_cents"))
    val calib = rows.where(col("split") === 2)
      .join(broadcast(train), "event_type")
      .select(col("event_type"), abs(col("cents") - col("yhat_cents")).as("r"))
    // residual spine: groupBy (type, r) bounds every later window
    val spine = calib.groupBy("event_type", "r").agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nCalib = calib.groupBy("event_type").agg(count(lit(1)).as("n_calib"))
    val qhat = spine.withColumn("cum", sum("c").over(byType))
      .join(broadcast(nCalib), "event_type")
      .withColumn("k", expr("least((9 * (n_calib + 1) + 9) div 10, n_calib)"))
      .where(col("cum") >= col("k"))
      .groupBy("event_type")
      .agg(min("r").as("qhat_cents"), max("n_calib").as("n_calib"))
    val test = rows.where(col("split") === 3)
      .join(broadcast(train), "event_type")
      .join(broadcast(qhat), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("cents") - col("yhat_cents")) <= col("qhat_cents"),
          1L).otherwise(0L)).as("covered"))
    train.join(qhat, "event_type").join(test, "event_type")
      .select(col("event_type"), col("n_train"), col("n_calib"),
        col("n_test"), col("yhat_cents"), col("qhat_cents"), col("covered"),
        expr("covered * 1000000 div n_test").as("coverage_ppm"))
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_blb_bootstrap" -> (q199BlbBootstrap _),
    "q200_cuped_abtest" -> (q200CupedAbTest _),
    "q205_conformal_interval" -> (q205ConformalInterval _))

  private def hashModSql(salt: String, key: String, m: Int): String =
    s"('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 8))::BIGINT % $m"

  val oracles: Map[String, String] = Map(
    "q199_blb_bootstrap" ->
      s"""WITH base AS (
         | SELECT o_orderkey AS k,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |  ${hashModSql("blb-s:", "o_orderkey", BlbSubsets)} AS subset
         | FROM orders),
         |reps AS (SELECT CAST(range AS BIGINT) AS rep FROM range($BlbReplicates)),
         |weighted AS (
         | SELECT b.subset, r.rep, b.cents,
         |  $poissonCaseSql AS w
         | FROM base b CROSS JOIN reps r),
         |rep_means AS (
         | SELECT subset, rep,
         |  CAST(sum(CAST(w * cents AS HUGEINT)) // sum(w) AS BIGINT) AS mean_cents
         | FROM weighted GROUP BY subset, rep
         | HAVING sum(w) > 0),
         |ranked AS (
         | SELECT subset, rep, mean_cents,
         |  row_number() OVER (PARTITION BY subset
         |    ORDER BY mean_cents, rep) AS rk
         | FROM rep_means),
         |ends AS (
         | SELECT subset,
         |  max(CASE WHEN rk = $BlbLoRank THEN mean_cents END) AS lo_cents,
         |  max(CASE WHEN rk = $BlbHiRank THEN mean_cents END) AS hi_cents
         | FROM ranked GROUP BY subset),
         |stats AS (
         | SELECT subset, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(CAST(cents AS HUGEINT)) // count(*) AS BIGINT) AS mean_cents
         | FROM base GROUP BY subset),
         |gl AS (
         | SELECT CAST(sum(CAST(lo_cents AS HUGEINT)) // count(*) AS BIGINT) AS ci_lo_cents,
         |  CAST(sum(CAST(hi_cents AS HUGEINT)) // count(*) AS BIGINT) AS ci_hi_cents
         | FROM ends)
         |SELECT s.subset, s.n_orders, s.mean_cents, e.lo_cents, e.hi_cents,
         | g.ci_lo_cents, g.ci_hi_cents
         |FROM stats s JOIN ends e ON s.subset = e.subset CROSS JOIN gl g""".stripMargin,
    "q205_conformal_interval" ->
      s"""WITH rows0 AS (
         | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         |  ${hashModSql("conf:", "event_id", 4)} AS split
         | FROM events),
         |train AS (
         | SELECT event_type, CAST(count(*) AS BIGINT) AS n_train,
         |  CAST(sum(CAST(cents AS HUGEINT)) // count(*) AS BIGINT) AS yhat_cents
         | FROM rows0 WHERE split < 2 GROUP BY event_type),
         |calib AS (
         | SELECT r.event_type, abs(r.cents - t.yhat_cents) AS res
         | FROM rows0 r JOIN train t USING (event_type) WHERE r.split = 2),
         |spine AS (
         | SELECT event_type, res, CAST(count(*) AS BIGINT) AS c
         | FROM calib GROUP BY 1, 2),
         |nc AS (
         | SELECT event_type, CAST(count(*) AS BIGINT) AS n_calib
         | FROM calib GROUP BY 1),
         |cum AS (
         | SELECT s.event_type, s.res, n.n_calib,
         |  sum(s.c) OVER (PARTITION BY s.event_type ORDER BY s.res
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  least((9 * (n.n_calib + 1) + 9) // 10, n.n_calib) AS k
         | FROM spine s JOIN nc n USING (event_type)),
         |qhat AS (
         | SELECT event_type, min(res) AS qhat_cents, max(n_calib) AS n_calib
         | FROM cum WHERE cum >= k GROUP BY event_type),
         |test AS (
         | SELECT r.event_type, CAST(count(*) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN abs(r.cents - t.yhat_cents) <= q.qhat_cents
         |    THEN 1 ELSE 0 END) AS BIGINT) AS covered
         | FROM rows0 r JOIN train t USING (event_type)
         | JOIN qhat q USING (event_type)
         | WHERE r.split = 3 GROUP BY 1)
         |SELECT t.event_type, t.n_train, q.n_calib, e.n_test, t.yhat_cents,
         | q.qhat_cents, e.covered,
         | CAST(e.covered * 1000000 // e.n_test AS BIGINT) AS coverage_ppm
         |FROM train t JOIN qhat q USING (event_type)
         |JOIN test e USING (event_type)""".stripMargin,
    "q200_cuped_abtest" ->
      s"""WITH e AS (
         | SELECT user_id, CAST(ts AS DATE) AS d,
         |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |d0 AS (SELECT min(d) AS d0 FROM e),
         |per_user AS (
         | SELECT user_id,
         |  CAST(sum(CASE WHEN date_diff('day', d0, d) < $CupedSplitDay
         |    THEN cents ELSE 0 END) AS BIGINT) AS x,
         |  CAST(sum(CASE WHEN date_diff('day', d0, d) >= $CupedSplitDay
         |    THEN cents ELSE 0 END) AS BIGINT) AS y,
         |  ${hashModSql("exp:", "user_id", 2)} AS arm
         | FROM e CROSS JOIN d0 GROUP BY user_id),
         |pooled AS (
         | SELECT CAST(count(*) AS HUGEINT) AS n,
         |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |  sum(CAST(x AS HUGEINT) * x) AS sxx,
         |  sum(CAST(x AS HUGEINT) * y) AS sxy
         | FROM per_user),
         |theta AS (
         | SELECT CAST((n * sxy - sx * sy) * 1000000
         |    // (n * sxx - sx * sx) AS BIGINT) AS theta_ppm,
         |  CAST(sx // n AS BIGINT) AS xbar_cents
         | FROM pooled),
         |adj AS (
         | SELECT u.arm, u.y,
         |  u.y - CAST(CAST(t.theta_ppm AS HUGEINT) * (u.x - t.xbar_cents)
         |    // 1000000 AS BIGINT) AS a,
         |  t.theta_ppm, t.xbar_cents
         | FROM per_user u CROSS JOIN theta t),
         |per_arm AS (
         | SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(y AS HUGEINT)) // count(*) AS BIGINT) AS mean_post_cents,
         |  CAST(sum(CAST(a AS HUGEINT)) // count(*) AS BIGINT) AS mean_adj_cents,
         |  CAST((CAST(count(*) AS HUGEINT) * sum(CAST(a AS HUGEINT) * a)
         |     - sum(CAST(a AS HUGEINT)) * sum(CAST(a AS HUGEINT)))
         |    // (CAST(count(*) AS HUGEINT) * (count(*) - 1)) AS BIGINT)
         |   AS var_adj_cents2
         | FROM adj GROUP BY arm),
         |vr AS (
         | SELECT CAST(1000000 - (CAST(count(*) AS HUGEINT)
         |     * sum(CAST(a AS HUGEINT) * a)
         |     - sum(CAST(a AS HUGEINT)) * sum(CAST(a AS HUGEINT))) * 1000000
         |    // (CAST(count(*) AS HUGEINT) * sum(CAST(y AS HUGEINT) * y)
         |     - sum(CAST(y AS HUGEINT)) * sum(CAST(y AS HUGEINT))) AS BIGINT)
         |   AS var_reduction_ppm
         | FROM adj),
         |contrast AS (
         | SELECT
         |  max(CASE WHEN arm = 1 THEN mean_adj_cents END)
         |   - max(CASE WHEN arm = 0 THEN mean_adj_cents END) AS effect_cents,
         |  CAST(round((max(CASE WHEN arm = 1 THEN mean_adj_cents END)
         |     - max(CASE WHEN arm = 0 THEN mean_adj_cents END))
         |    / sqrt(CAST(max(CASE WHEN arm = 1 THEN var_adj_cents2 END) AS DOUBLE)
         |       / max(CASE WHEN arm = 1 THEN n_users END)
         |      + CAST(max(CASE WHEN arm = 0 THEN var_adj_cents2 END) AS DOUBLE)
         |       / max(CASE WHEN arm = 0 THEN n_users END)) * 1000, 0) AS BIGINT)
         |   AS z_milli
         | FROM per_arm),
         |th AS (SELECT theta_ppm, xbar_cents FROM adj LIMIT 1)
         |SELECT p.arm, p.n_users, p.mean_post_cents, p.mean_adj_cents,
         | p.var_adj_cents2, th.theta_ppm, th.xbar_cents,
         | c.effect_cents, c.z_milli, v.var_reduction_ppm
         |FROM per_arm p CROSS JOIN th CROSS JOIN contrast c CROSS JOIN vr v""".stripMargin)

  /** [[poissonCase]] with DuckDB hex-int syntax for the u32 draw
    * (inline, since DuckDB lacks `conv`): thresholds are the SAME
    * literals. */
  private def poissonCaseSql: String = {
    val u = "('0x' || substr(md5('blb-r:' || CAST(r.rep AS VARCHAR) || ':' || CAST(b.k AS VARCHAR)), 1, 8))::BIGINT"
    PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonThresholds.size} END")
  }
}
