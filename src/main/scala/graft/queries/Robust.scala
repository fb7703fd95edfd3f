package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-decisioning analytics: density-based point labeling (DBSCAN
  * core/border/noise on the grid-blocked candidate join), empirical-
  * Bayes rate shrinkage, the salted skew-join, Wald's sequential
  * probability ratio test, and corpus readability. All integer-exact
  * (the micro-unit discipline), all DuckDB-oracled.
  */
object Robust {

  // ---------------------------------------------------------------- q269

  /** Neighbor threshold (within eps, self excluded) for a DBSCAN core
    * point in [[q269DbscanLabels]]. */
  val DbscanMinPts = 3L
  /** Coordinate range (mdeg, both axes) of the q269 point cloud — a
    * metro-scale draw, denser than q266's continent-scale one, so the
    * three density regimes all materialize at oracle SF (sf0.01:
    * 114 core / 24 border / 12 noise). */
  val DbscanRangeMdeg = 6000

  /** q269 — DBSCAN point labeling (core / border / noise) over a
    * [[DbscanRangeMdeg]]-range synthetic point cloud (q266's md5 draw,
    * metro-scale), eps = the Chebyshev co-location radius:
    * core = ≥ [[DbscanMinPts]] neighbors within eps, border = non-core
    * adjacent to a core, noise = the rest. The density triage DBSCAN
    * runs before any cluster exists — and the part that is exactly
    * SQL-oracle-able (full cluster ASSIGNMENT is q202's linkage/CC
    * machinery; the label pass is what decides which points ever enter
    * it, and which get dropped as noise — the outlier-removal step of
    * an embedding-dedup pipeline).
    *
    * Scale shape: neighbors come from [[Structure.gridPairsOn]]'s
    * EQUI-join on 3×3 cell keys (cell edge ≥ eps ⇒ no pair missed) —
    * an all-pairs distance join never exists; degrees are one groupBy
    * over pair stubs; the border pass is one hash semi-join of stubs
    * against the core set; the read-out is three broadcast scalars. */
  def q269DbscanLabels(s: SparkSession, dir: String): DataFrame = {
    val T = graft.functions.TextFunctions
    dbscanCountsOn(Tables.events(s, dir).select(col("user_id")).distinct()
      .select(col("user_id"),
        T.hashMod("lat:", col("user_id"), DbscanRangeMdeg).as("lat"),
        T.hashMod("lon:", col("user_id"), DbscanRangeMdeg).as("lon"))
      .withColumn("cx", expr(s"lat div ${Structure.GridCellMdeg}"))
      .withColumn("cy", expr(s"lon div ${Structure.GridCellMdeg}")))
  }

  /** [[q269DbscanLabels]] over any (user_id, lat, lon, cx, cy) point
    * frame — exposed for the spec's constructed geometries. */
  def dbscanCountsOn(pts0: DataFrame): DataFrame = {
    val pts = pts0.cache()
    val pairs = Structure.gridPairsOn(pts).cache()
    val stubs = pairs.select(col("ua").as("u"), col("ub").as("v"))
      .unionByName(pairs.select(col("ub").as("u"), col("ua").as("v")))
    val core = stubs.groupBy("u").agg(count(lit(1)).as("nbrs"))
      .where(col("nbrs") >= DbscanMinPts).select(col("u")).cache()
    val border = stubs.join(core.withColumnRenamed("u", "v"), "v")
      .select(col("u")).distinct()
      .join(core, Seq("u"), "left_anti")
    graft.operators.SmallResult.materialize(
      pts.agg(count(lit(1)).as("n_points"))
        .crossJoin(broadcast(core.agg(count(lit(1)).as("n_core"))))
        .crossJoin(broadcast(border.agg(count(lit(1)).as("n_border"))))
        .select(col("n_points"), col("n_core"), col("n_border"),
          (col("n_points") - col("n_core") - col("n_border")).as("n_noise")),
      pts, pairs, core)
  }

  // ---------------------------------------------------------------- q270

  /** Prior pseudo-count (documents) for [[q270EbShrinkage]]. */
  val EbPriorStrength = 200L
  /** Short-document cut (chars) for the shrunk rate. */
  val EbShortChars = 500L

  /** q270 — empirical-Bayes shrinkage of the per-source short-document
    * rate toward the corpus rate with [[EbPriorStrength]] pseudo-
    * documents: shrunk = (k + M·K/N) / (n + M), computed as ONE exact
    * integral division (k·N + M·K)·10⁶ div (N·(n + M)). A 3-document
    * source no longer reads 0% or 100%: small sources pull to the
    * corpus mean, big sources keep their own rate — the ranking any
    * per-source quality gate (q130's rules, q127's drift) should use
    * instead of the raw rate whenever source sizes span decades.
    *
    * Scale shape: one combinable per-source aggregate; the corpus
    * totals are one broadcast scalar row; no second corpus pass. */
  def q270EbShrinkage(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir).where(col("text").isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < EbShortChars, 1L).otherwise(0L))
          .as("k_short"))
    val glob = per.agg(sum("n_docs").as("nn"), sum("k_short").as("kk"))
    per.crossJoin(broadcast(glob))
      .select(col("source"), col("n_docs"), col("k_short"),
        expr("cast(k_short * 1000000 div n_docs as bigint)").as("raw_ppm"),
        expr(s"""cast((cast(k_short as decimal(38,0)) * nn
               | + $EbPriorStrength * kk) * 1000000
               | div (cast(nn as decimal(38,0))
               |   * (n_docs + $EbPriorStrength)) as bigint)""".stripMargin)
          .as("shrunk_ppm"))
  }

  // ---------------------------------------------------------------- q271

  /** Salt fan-out for [[q271SaltedJoin]]'s skewed key. */
  val SaltFactor = 16L

  /** q271 — the salted skew-join: events ⋈ per-type dimension on a key
    * with ~|types| distinct values — the textbook pathological shuffle
    * key (every row of a hot type lands on ONE reducer). The dimension
    * side replicates [[SaltFactor]]× with an explicit salt column, the
    * fact side computes `salt = event_id mod SaltFactor`, and the join
    * keys on (type, salt) — the hot key's rows spread over SaltFactor
    * reducers, restoring parallelism with zero semantic change (the
    * oracle is the UNSALTED join). Joined per-type read-out: events
    * above their type's exact mean cents.
    *
    * The shuffle_hash hint keeps the demonstration honest on the test
    * dims (Catalyst would broadcast a 5-row dimension and no shuffle
    * would exist to salt); at 100 TB the dimension that needs this —
    * per-entity stats with millions of entities and power-law fact
    * skew — exceeds the broadcast threshold and the salted exchange is
    * the real plan. AQE's skew-split covers sort-merge joins after the
    * fact; the salt is the PLANNED form that also fixes the
    * aggregation-free hash join and pre-AQE engines.
    *
    * Scale shape: one combinable per-type aggregate builds the dim;
    * the salted dim is |types|·SaltFactor rows; one equi-join on the
    * widened key; one combinable final aggregate. */
  def q271SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sc"))
      .select(col("event_type"), expr("sc div n").as("mean_c"))
    val salted = dim.select(col("event_type"), col("mean_c"),
      explode(typedLit((0L until SaltFactor).toList)).as("salt"))
    ev.withColumn("salt", pmod(col("event_id"), lit(SaltFactor)))
      .join(salted.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("cents") > col("mean_c"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("event_type"), col("n_events"), col("n_above"),
        expr("cast(n_above * 1000000 div n_events as bigint)")
          .as("above_ppm"))
  }

  // ---------------------------------------------------------------- q272

  /** SPRT null conversion rate (ppm). */
  val SprtP0Ppm = 180000L
  /** SPRT alternative conversion rate (ppm). */
  val SprtP1Ppm = 220000L
  /** ln(p1/p0) in micro-nats — the per-success LLR increment. */
  val SprtLaMicro: Long =
    math.round(math.log(SprtP1Ppm.toDouble / SprtP0Ppm) * 1e6)
  /** ln((1−p1)/(1−p0)) in micro-nats — the per-failure increment. */
  val SprtLbMicro: Long = math.round(math.log(
    (1000000.0 - SprtP1Ppm) / (1000000.0 - SprtP0Ppm)) * 1e6)
  /** ln((1−β)/α) at α = β = 0.05 — the symmetric decision bound. */
  val SprtBoundMicro: Long = math.round(math.log(0.95 / 0.05) * 1e6)

  /** q272 — Wald's sequential probability ratio test on the daily
    * purchase rate: is the conversion probability [[SprtP1Ppm]] (H1)
    * or [[SprtP0Ppm]] (H0)? Per Bernoulli observation the LLR moves by
    * ln(p1/p0) on success, ln((1−p1)/(1−p0)) on failure — both
    * FROZEN micro-nat constants (quantized once in Scala, interpolated
    * into the oracle as literals, so both engines walk the identical
    * integer lattice) — and the test concludes the first day the
    * cumulative LLR leaves ±[[SprtBoundMicro]]. The batch read-out is
    * the full trajectory with each day's standing decision: exactly
    * the always-on experiment monitor (peeking is FREE under SPRT,
    * unlike the fixed-horizon q200/q223 tests, which is the point).
    *
    * Scale shape: one combinable per-day aggregate collapses the
    * corpus to the |days| spine; the cumulative window runs on that
    * bounded spine (single tiny partition by construction, the q79/
    * q241 discipline); constants ride the expression, no join. */
  def q272Sprt(s: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
      .groupBy("d").agg(count(lit(1)).as("n"), sum("x").as("k"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_cum", sum("n").over(w))
      .withColumn("k_cum", sum("k").over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("n_cum"), col("k_cum"),
        (col("k_cum") * SprtLaMicro +
          (col("n_cum") - col("k_cum")) * SprtLbMicro).as("llr_micro"))
      .withColumn("decision",
        when(col("llr_micro") >= SprtBoundMicro, "accept_h1")
          .when(col("llr_micro") <= -SprtBoundMicro, "accept_h0")
          .otherwise("continue"))
  }

  // ---------------------------------------------------------------- q273

  /** q273 — Flesch reading ease per source, in milli-points, from
    * three exact counts aggregated corpus-wide: whitespace tokens,
    * sentence breaks (runs of `.!?`, min 1/doc), and syllable proxies
    * (vowel-group runs, the standard cheap estimator). F_milli =
    * 206835 − 1015·W div S − 84600·Y div W — integral divisions on
    * corpus totals, so the score is the length-weighted corpus rate
    * (not a mean of per-doc ratios), bit-identical cross-engine. The
    * readability axis of the quality suite: q24's stats are structural,
    * q106's LM score is distributional; Flesch is the interpretable
    * "how hard is this prose" number data cards quote.
    *
    * Scale shape: one narrow projection (three ints per doc) + one
    * combinable per-source aggregate; nothing else. */
  def q273Readability(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).where(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("w"),
        greatest(lit(1L),
          expr("regexp_count(text, '[.!?]+')").cast("long")).as("sn"),
        greatest(lit(1L),
          expr("regexp_count(lower(text), '[aeiouy]+')").cast("long"))
          .as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("w").as("words"), sum("sn").as("sentences"),
        sum("y").as("syllables"))
      .select(col("source"), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        expr("""cast(206835 - 1015 * words div sentences
               | - 84600 * syllables div words as bigint)""".stripMargin)
          .as("flesch_milli"))

  // ---------------------------------------------------------------- q274

  /** q274 — the NATIVE as-of join ([[graft.plans.AsOfJoinExec]]):
    * every click attributed to the same user's most recent purchase
    * at-or-before it, written as the marker-join surface
    * (`c_user = p_user AND graft_asof(c_us, p_us)`, left outer) and
    * executed by the custom merge-walk operator — the whole-operator
    * Catalyst extension (marker → rewrite rule → strategy → exec),
    * against q75 which COMPOSES the same semantics from one window.
    * Same answer, different plan: q75 shuffles the unioned corpus into
    * one exchange and buffers the window; the exec co-partitions the
    * two sides and streams with O(1) state. Oracled by DuckDB's native
    * ASOF LEFT JOIN — engine-vs-engine on the operator itself.
    *
    * Scale shape: one hash exchange per side (clicks, purchases — each
    * already filtered at the scan), in-partition sort, linear merge;
    * never the O(clicks × purchases) inequality-join blow-up. */
  def q274AsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
        col("value").as("p_value"))
    clicks
      .join(purch, expr("c_user = p_user AND graft_asof(c_us, p_us)"), "left")
      .select(col("event_id"), col("c_user").as("user_id"), col("c_us"),
        col("p_us"),
        when(col("p_us").isNotNull, col("c_us") - col("p_us")).as("delta_us"),
        expr("cast(round(p_value * 100) as bigint)").as("purchase_cents"))
  }

  // ---------------------------------------------------------------- q275

  /** q275 — the FORWARD native as-of join (`graft_asof_fwd` →
    * [[graft.plans.AsOfJoinExec]] in forward mode): every click
    * attributed to the same user's NEXT purchase at-or-after it — the
    * conversion-attribution direction q274's backward join cannot
    * express (and the window composition needs a `first` over a
    * FOLLOWING frame for). Forward mode is the cheaper walk: pure
    * lookahead, zero candidate copies. Oracled by DuckDB's native
    * forward ASOF (`ON c_us <= p_us`).
    *
    * Scale shape: identical to q274 — one filtered hash exchange per
    * side, in-partition sort, linear merge. */
  def q275AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
        col("value").as("p_value"))
    clicks
      .join(purch, expr("c_user = p_user AND graft_asof_fwd(c_us, p_us)"),
        "left")
      .select(col("event_id"), col("c_user").as("user_id"), col("c_us"),
        col("p_us"),
        when(col("p_us").isNotNull, col("p_us") - col("c_us")).as("lead_us"),
        expr("cast(round(p_value * 100) as bigint)").as("purchase_cents"))
  }

  // -----------------------------------------------------------------

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q274_asof_native" -> (q274AsofNative _),
    "q275_asof_forward" -> (q275AsofForward _),
    "q269_dbscan_labels" -> (q269DbscanLabels _),
    "q270_eb_shrinkage" -> (q270EbShrinkage _),
    "q271_salted_join" -> (q271SaltedJoin _),
    "q272_sprt" -> (q272Sprt _),
    "q273_readability" -> (q273Readability _))

  val oracles: Map[String, String] = Map(
    "q274_asof_native" ->
      """WITH ev AS (
        | SELECT event_id, user_id, event_type, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |c AS (SELECT event_id, user_id AS c_user, us AS c_us FROM ev
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, us AS p_us, value AS p_value FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT c.event_id, c.c_user AS user_id, c.c_us, p.p_us,
        | CASE WHEN p.p_us IS NOT NULL THEN c.c_us - p.p_us END AS delta_us,
        | CAST(round(p.p_value * 100) AS BIGINT) AS purchase_cents
        |FROM c ASOF LEFT JOIN p
        | ON c.c_user = p.p_user AND c.c_us >= p.p_us""".stripMargin,
    "q275_asof_forward" ->
      """WITH ev AS (
        | SELECT event_id, user_id, event_type, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |c AS (SELECT event_id, user_id AS c_user, us AS c_us FROM ev
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, us AS p_us, value AS p_value FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT c.event_id, c.c_user AS user_id, c.c_us, p.p_us,
        | CASE WHEN p.p_us IS NOT NULL THEN p.p_us - c.c_us END AS lead_us,
        | CAST(round(p.p_value * 100) AS BIGINT) AS purchase_cents
        |FROM c ASOF LEFT JOIN p
        | ON c.c_user = p.p_user AND c.c_us <= p.p_us""".stripMargin,
    "q269_dbscan_labels" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        |p AS (
        | SELECT user_id,
        |  ('0x' || substr(md5('lat:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % $DbscanRangeMdeg AS lat,
        |  ('0x' || substr(md5('lon:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % $DbscanRangeMdeg AS lon
        | FROM u),
        |pairs AS (
        | SELECT a.user_id AS ua, b.user_id AS ub
        | FROM p a JOIN p b ON a.user_id < b.user_id
        |  AND abs(a.lat - b.lat) <= ${Structure.GridDistMdeg}
        |  AND abs(a.lon - b.lon) <= ${Structure.GridDistMdeg}),
        |stubs AS (SELECT ua AS u, ub AS v FROM pairs
        |          UNION ALL SELECT ub, ua FROM pairs),
        |core AS (
        | SELECT u FROM (SELECT u, count(*) AS nbrs FROM stubs GROUP BY 1)
        | WHERE nbrs >= $DbscanMinPts),
        |border AS (
        | SELECT DISTINCT s.u FROM stubs s JOIN core c ON s.v = c.u
        | WHERE s.u NOT IN (SELECT u FROM core))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_points,
        | (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
        | (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
        | CAST((SELECT count(*) FROM p) - (SELECT count(*) FROM core)
        |  - (SELECT count(*) FROM border) AS BIGINT) AS n_noise""".stripMargin,
    "q270_eb_shrinkage" ->
      s"""WITH per AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_chars < $EbShortChars THEN 1 ELSE 0 END)
        |   AS BIGINT) AS k_short
        | FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS nn,
        |       CAST(sum(k_short) AS HUGEINT) AS kk FROM per)
        |SELECT source, n_docs, k_short,
        | CAST(CAST(k_short AS HUGEINT) * 1000000 // n_docs AS BIGINT)
        |  AS raw_ppm,
        | CAST((CAST(k_short AS HUGEINT) * nn + $EbPriorStrength * kk)
        |   * 1000000 // (nn * (n_docs + $EbPriorStrength)) AS BIGINT)
        |  AS shrunk_ppm
        |FROM per, g""".stripMargin,
    "q271_salted_join" ->
      """WITH ev AS (
        | SELECT event_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |dim AS (
        | SELECT event_type,
        |  CAST(sum(CAST(cents AS HUGEINT)) // count(*) AS BIGINT) AS mean_c
        | FROM ev GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN e.cents > d.mean_c THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_above,
        | CAST(CAST(sum(CASE WHEN e.cents > d.mean_c THEN 1 ELSE 0 END)
        |   AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS above_ppm
        |FROM ev e JOIN dim d USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q272_sprt" ->
      s"""WITH byday AS (
        | SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS k
        | FROM events GROUP BY 1),
        |cum AS (
        | SELECT d,
        |  CAST(sum(n) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS n_cum,
        |  CAST(sum(k) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS k_cum
        | FROM byday)
        |SELECT strftime(d, '%Y-%m-%d') AS d, n_cum, k_cum,
        | CAST(k_cum * $SprtLaMicro
        |  + (n_cum - k_cum) * $SprtLbMicro AS BIGINT) AS llr_micro,
        | CASE
        |  WHEN k_cum * $SprtLaMicro + (n_cum - k_cum) * $SprtLbMicro
        |    >= $SprtBoundMicro THEN 'accept_h1'
        |  WHEN k_cum * $SprtLaMicro + (n_cum - k_cum) * $SprtLbMicro
        |    <= -$SprtBoundMicro THEN 'accept_h0'
        |  ELSE 'continue' END AS decision
        |FROM cum""".stripMargin,
    "q273_readability" ->
      """WITH d AS (
        | SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |  greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |   AS BIGINT)) AS sn,
        |  greatest(1, CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |   AS BIGINT)) AS y
        | FROM documents WHERE text IS NOT NULL)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(w) AS BIGINT) AS words,
        | CAST(sum(sn) AS BIGINT) AS sentences,
        | CAST(sum(y) AS BIGINT) AS syllables,
        | CAST(206835 - 1015 * CAST(sum(w) AS HUGEINT) // sum(sn)
        |  - 84600 * CAST(sum(y) AS HUGEINT) // sum(w) AS BIGINT)
        |  AS flesch_milli
        |FROM d GROUP BY 1""".stripMargin)
}
