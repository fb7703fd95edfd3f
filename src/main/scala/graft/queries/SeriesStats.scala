package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DistCumSum
import graft.sources.Tables

/** Series/distribution statistics the monitoring families consume as
  * inputs: the autocorrelation function (q203) — the diagnostic that
  * says WHICH seasonal period q181's Holt–Winters should be configured
  * with and whether q146's Holt trend is even identifiable — and the
  * equi-depth histogram (q204), the distribution summary query
  * optimizers and drift monitors (q127/q177) actually want (equi-WIDTH
  * bins, q66, put 99% of a skewed corpus in one bin; equi-DEPTH bins
  * adapt their boundaries to the mass).
  *
  * Both queries follow the bounded-spine discipline (q194): the corpus
  * scan collapses to a value/day spine in one map-side-combining
  * aggregation, and every ordered window runs over that spine, never
  * over corpus rows.
  */
object SeriesStats {

  /** ACF lag budget — a week of daily lags (the 30-day window caps
    * useful lags well below this anyway; n_pairs shrinks by one per
    * lag). */
  val MaxLag = 7

  // ---------------------------------------------------------------- q203

  /** q203 — autocorrelation of the daily event-count series at lags
    * 1‥[[MaxLag]], Pearson r over the lag-aligned day pairs. The
    * spectral fingerprint of the series: r(7) spiking says weekly
    * seasonality (feed period=7 to q181), all-lags-flat says the series
    * is noise and trend monitors will chase ghosts.
    *
    * Integer discipline: daily counts are exact longs; per-lag
    * sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate in
    * decimal(38,0) (the q144 overflow lesson — day counts are ~10⁹ at
    * 100 TB, their squares 10¹⁸, a Long sum dies in 10 days); the
    * derived cov/var terms land back in exact longs, and the single
    * non-integer step — r = cov/√(vx·vy) — is one IEEE-exact-rounded
    * `sqrt` + divide on identical integer-derived doubles in both
    * engines, snapped to milli (the q200 z_milli discipline).
    *
    * Scale shape: ONE corpus scan → groupBy(day) (spine = observation
    * days, ~30 rows here, bounded by calendar not volume); the lag
    * alignment is a self-join of that spine against itself per lag —
    * spine², not corpus², and the lag spine is a broadcast constant.
    * Nothing after the first aggregation touches corpus rows. Day gaps
    * align by day-INDEX arithmetic (datediff from the series start),
    * not row adjacency, so a missing day drops its pairs instead of
    * silently shifting every later lag. */
  def q203Acf(s: SparkSession, dir: String): DataFrame =
    acfOn(Tables.events(s, dir).select(to_date(col("ts")).as("d")), MaxLag)

  /** [[q203Acf]] over any single-column (`d` date) frame — exposed for
    * the hand-computed planted-series spec. */
  def acfOn(days: DataFrame, maxLag: Int): DataFrame = {
    val byDay = days.groupBy("d").agg(count(lit(1)).as("cnt"))
    val idx = byDay.crossJoin(broadcast(byDay.agg(min("d").as("d0"))))
      .select(datediff(col("d"), col("d0")).cast("long").as("day_idx"),
        col("cnt"))
    val lags = days.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = idx.select(col("day_idx"), col("cnt").as("x"))
      .crossJoin(broadcast(lags))
      .join(idx.select(col("day_idx").as("y_idx"), col("cnt").as("y")),
        col("y_idx") === col("day_idx") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        expr("cast(n_pairs * sxy - sx * sy as bigint)").as("cov_n"),
        expr("cast(n_pairs * sxx - sx * sx as bigint)").as("vx_n"),
        expr("cast(n_pairs * syy - sy * sy as bigint)").as("vy_n"))
      .withColumn("r_milli",
        when(col("vx_n") > 0L && col("vy_n") > 0L,
          round(col("cov_n").cast("double") /
            sqrt(col("vx_n").cast("double") * col("vy_n").cast("double"))
            * 1000, 0).cast("long")))
      .select("lag", "n_pairs", "cov_n", "vx_n", "vy_n", "r_milli")
  }

  // ---------------------------------------------------------------- q204

  /** Equi-depth bucket count for [[q204EquidepthHist]]. */
  val HistBuckets = 16

  /** q204 — equi-depth histogram of order value: [[HistBuckets]]
    * buckets of ~equal ROW mass, each reporting its value range, row
    * count, and mean. Boundaries fall only BETWEEN distinct values —
    * a value's full tie group stays in one bucket (the property a
    * selectivity estimator needs: a boundary inside a tie group makes
    * both adjacent buckets lie about that value). Bucket of a value
    * group = `rows_before · B div n` — the bucket its FIRST row would
    * get under exact row-ntile.
    *
    * Scale shape: one corpus scan → groupBy(value) spine (bounded by
    * the cents alphabet, not row count), then the cumulative rank runs
    * as [[DistCumSum]]'s two-level scan — a GLOBAL `Window.orderBy`
    * over a wide spine would move the whole spine to one partition,
    * exactly the bottleneck this operator exists to avoid at 100 TB.
    * The final bucket aggregation is ≤ B rows. */
  def q204EquidepthHist(s: SparkSession, dir: String): DataFrame =
    equidepthOn(Tables.orders(s, dir).select(
      expr("cast(round(o_totalprice * 100) as bigint)").as("v")), HistBuckets)

  /** [[q204EquidepthHist]] over any single-column (`v` long) frame —
    * exposed for the planted-distribution spec. */
  def equidepthOn(vals: DataFrame, buckets: Int): DataFrame = {
    val spine = vals.groupBy("v").agg(count(lit(1)).as("c"))
    val cum = DistCumSum.overDomain(spine, "v", "c") // inclusive running sum
    cum.crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
      .withColumn("bucket", expr(s"(cum - c) * $buckets div n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_values"), sum("c").as("n_rows"),
        min("v").as("lo_cents"), max("v").as("hi_cents"),
        expr("cast(sum(cast(v as decimal(38,0)) * c) div sum(c) as bigint)")
          .as("mean_cents"))
  }

  // ---------------------------------------------------------------- q212

  /** q212 — grouped EXACT quartiles (p25/p50/p75 of event value per
    * type) as rank statistics on the (group, value) spine. q45's
    * `percentile()` aggregate buffers every group member in the agg
    * buffer — fine at toy scale, an executor-OOM at 10⁹ rows per group;
    * this is the scale path: one map-side-combining groupBy collapses
    * the corpus to the value spine, a per-group cumulative walks it,
    * and the quantile is the smallest value whose cumulative count
    * reaches ⌈p·n⌉ (type-1/lower order statistic — pure integers, no
    * interpolation to diverge between engines).
    *
    * Scale shape: corpus → spine groupBy (bounded by group × value
    * alphabets), per-group window over the spine only. If a single
    * group's value alphabet outgrows one partition, swap the window
    * for [[DistCumSum]] per group — the operator's contract (rank on
    * the spine) is unchanged. */
  def q212GroupQuartiles(s: SparkSession, dir: String): DataFrame =
    groupQuartilesOn(Tables.events(s, dir).select(col("event_type"),
      expr("cast(round(value * 100) as bigint)").as("v")))

  /** [[q212GroupQuartiles]] over any (`event_type`, `v` long) frame —
    * exposed for the hand-computed spec. */
  def groupQuartilesOn(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = rows.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = rows.groupBy("event_type").agg(count(lit(1)).as("n"))
    val cum = spine.withColumn("cum", sum("c").over(byType))
      .join(broadcast(n), "event_type")
    def pick(p: Int, name: String) = cum
      .where(col("cum") >= expr(s"($p * n + 99) div 100"))
      .groupBy("event_type").agg(min("v").as(name))
    pick(25, "p25_cents")
      .join(pick(50, "p50_cents"), "event_type")
      .join(pick(75, "p75_cents"), "event_type")
      .join(n, "event_type")
      .select("event_type", "n", "p25_cents", "p50_cents", "p75_cents")
  }

  // ---------------------------------------------------------------- q225

  /** q225 — Theil–Sen robust trend per event type: the LOWER MEDIAN of
    * all pairwise slopes (cnt_j − cnt_i)/(j − i) over the daily-count
    * series. The trend estimate q162's least-squares line cannot give:
    * up to ~29% of the days can be arbitrarily corrupted (outages,
    * backfill spikes) without moving it, which is why it is the
    * monitoring-world default for "is this feed growing".
    *
    * Integer discipline: slopes are snapped to integer MICRO-units by
    * one integral division per pair (`div` and DuckDB `//` both
    * truncate toward zero, so negative slopes agree), and the lower
    * median is a rank statistic — the value at row ⌈m/2⌉ of the sorted
    * slope list, deterministic under ties, no interpolation.
    *
    * Scale shape: corpus → day spine per type (ONE map-side-combining
    * groupBy; spine bounded by calendar × type alphabet, not volume);
    * the pair join is spine × spine within a type — days², never
    * corpus². The median window orders each type's ≤ days²/2 slopes,
    * partitioned by type. At 10⁴+ days, swap the per-pair enumeration
    * for the O(n log² n) Katz–Sen binary search over slope ranks — the
    * operator contract (median of pairwise slopes) is unchanged. */
  def q225TheilSen(s: SparkSession, dir: String): DataFrame =
    theilSenOn(Tables.events(s, dir).select(col("event_type"),
      to_date(col("ts")).as("d")))

  /** [[q225TheilSen]] over any (`event_type`, `d` date) frame —
    * exposed for the planted-outlier spec. */
  def theilSenOn(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the ONE corpus pass; the cached spine (days × types — bounded by
    // calendar, not volume) feeds every later branch
    val byDay = rows.groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      .persist()
    val idx = byDay.crossJoin(broadcast(byDay.agg(min("d").as("d0"))))
      .select(col("event_type"),
        datediff(col("d"), col("d0")).cast("long").as("i"), col("cnt"))
    val b = idx.select(col("event_type").as("et"), col("i").as("j"),
      col("cnt").as("cnt_j"))
    val slopes = idx.join(b,
        col("et") === col("event_type") && col("j") > col("i"))
      .select(col("event_type"),
        expr("(cnt_j - cnt) * 1000000 div (j - i)").as("sl"))
    // rank AND pair-count off the same per-type sort — one window pass
    val w = Window.partitionBy("event_type").orderBy("sl")
    val wAll = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val out = slopes.withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .join(broadcast(byDay.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"))), "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("sl").as("slope_micro"))
    graft.operators.SmallResult.materialize(out, byDay)
  }

  // ---------------------------------------------------------------- q226

  /** Lag budget for [[q226XcorrLag]] — a week each way. */
  val XcorrMaxLag = 7

  /** q226 — lagged cross-correlation between the daily count series of
    * the two lexicographically-first event types: Pearson r at every
    * lag in ±[[XcorrMaxLag]]. The lead/lag detector — "signups follow
    * campaigns by 3 days" is r(+3) spiking — i.e. q203's ACF pointed
    * across two series, and the diagnostic that says WHICH series is
    * the leading indicator before anyone fits q162's trend to the
    * follower.
    *
    * Same integer discipline as q203: per-lag sufficient statistics in
    * decimal(38,0), cov/var terms land in exact longs, and the one
    * non-integer step (r = cov/√(vx·vy)) is identical integer-derived
    * IEEE doubles in both engines, snapped to milli.
    *
    * Scale shape: corpus → day×type spine (one groupBy), lag alignment
    * = spine self-join per lag against a broadcast lag table — spine²
    * at worst, never corpus². Day-INDEX arithmetic, so calendar gaps
    * drop pairs instead of shifting later lags. */
  def q226XcorrLag(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val ts = e.select("event_type").distinct().orderBy("event_type")
      .limit(2).collect().map(_.getString(0))
    xcorrOn(e.where(col("event_type").isin(ts(0), ts(1)))
      .select((col("event_type") === ts(0)).as("a"),
        to_date(col("ts")).as("d")), XcorrMaxLag)
  }

  /** [[q226XcorrLag]] over a two-series (`a` bool, `d` date) frame. */
  def xcorrOn(rows: DataFrame, maxLag: Int): DataFrame = {
    // one corpus pass; the day spine is calendar-bounded and reused by
    // the d0 lookup and both sides of the lag self-join
    val byDay = rows.groupBy("d").agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("x"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("y")).persist()
    val idx = byDay.crossJoin(broadcast(byDay.agg(min("d").as("d0"))))
      .select(datediff(col("d"), col("d0")).cast("long").as("i"),
        col("x"), col("y"))
    val lags = rows.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = idx.select(col("i"), col("x"))
      .crossJoin(broadcast(lags))
      .join(idx.select(col("i").as("yi"), col("y")),
        col("yi") === col("i") + col("lag"))
    val out = pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        expr("cast(n_pairs * sxy - sx * sy as bigint)").as("cov_n"),
        expr("cast(n_pairs * sxx - sx * sx as bigint)").as("vx_n"),
        expr("cast(n_pairs * syy - sy * sy as bigint)").as("vy_n"))
      .withColumn("r_milli",
        when(col("vx_n") > 0L && col("vy_n") > 0L,
          round(col("cov_n").cast("double") /
            sqrt(col("vx_n").cast("double") * col("vy_n").cast("double"))
            * 1000, 0).cast("long")))
      .select("lag", "n_pairs", "cov_n", "vx_n", "vy_n", "r_milli")
    graft.operators.SmallResult.materialize(out, byDay)
  }

  // ---------------------------------------------------------------- q235

  /** q235 — grouped skewness and excess kurtosis from EXACT integer
    * power sums: per event type over value cents, the third and
    * fourth standardized moments — the distribution-shape read-outs
    * q212's quartiles bracket but do not quantify (heavy right tail →
    * skew ≫ 0; fat tails → kurtosis ≫ 0 — the difference between "cap
    * outliers" and "the mean is meaningless here").
    *
    * Exactness: one grouped aggregate collects (n, ΣC, ΣC², ΣC³, ΣC⁴)
    * in decimal(38,0) (per-row powers widen BEFORE multiplying — a
    * cent⁴ alone is 10¹⁹); the central-moment numerators
    *   M2n = n·S2 − S1², M3n = n²S3 − 3nS1S2 + 2S1³,
    *   M4n = n³S4 − 4n²S1S3 + 6nS1²S2 − 3S1⁴
    * make every n-power CANCEL: skew = M3n/M2n^1.5 and kurt+3 =
    * M4n/M2n² exactly. Both engines cast the identical exact integers
    * to double for the one fractional-power step and snap to milli
    * (the q203 sqrt discipline). M4n ~ n³·ΣC⁴ needs ~36 digits at
    * sf0.1 cents — at larger corpora rescale the unit (milli-dollars)
    * before this operator, the q144 overflow lesson.
    *
    * Scale shape: ONE map-side-combining groupBy; everything after is
    * a k-row projection. */
  def q235Moments(s: SparkSession, dir: String): DataFrame =
    momentsOn(Tables.events(s, dir).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("c")))

  /** [[q235Moments]] over any (`g`, `c` long) frame. */
  def momentsOn(rows: DataFrame): DataFrame =
    rows
      .select(col("g"), col("c").cast("decimal(38,0)").as("c1"))
      .select(col("g"), col("c1"), (col("c1") * col("c1")).as("c2"))
      .select(col("g"), col("c1"), col("c2"),
        (col("c2") * col("c1")).as("c3"), (col("c2") * col("c2")).as("c4"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("c1").as("s1"), sum("c2").as("s2"),
        sum("c3").as("s3"), sum("c4").as("s4"))
      .withColumn("m2n", expr("n * s2 - s1 * s1"))
      .withColumn("m3n", expr("n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1"))
      .withColumn("m4n", expr(
        """n * n * n * s4 - 4 * n * n * s1 * s3
          | + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1""".stripMargin))
      .select(col("g").as("event_type"), col("n"),
        // m2n^1.5 as m2·√m2: mul and sqrt are IEEE-correctly-rounded
        // in BOTH engines; libm pow(x, 1.5) is not and may differ ulp
        when(col("m2n") > 0L, expr(
          """cast(round(cast(m3n as double)
            | / (cast(m2n as double) * sqrt(cast(m2n as double)))
            | * 1000) as bigint)""".stripMargin)).as("skew_milli"),
        when(col("m2n") > 0L, expr(
          """cast(round((cast(m4n as double)
            | / (cast(m2n as double) * cast(m2n as double)) - 3.0)
            | * 1000) as bigint)""".stripMargin)).as("kurt_milli"))

  // ---------------------------------------------------------------- q238

  /** Per-tail trim fraction for [[q238TrimmedMean]] (10% each side). */
  val TrimPct = 10

  /** q238 — exact grouped trimmed mean: drop the lowest and highest
    * [[TrimPct]]% of ROWS per event type and average the middle. The
    * third member of the robust-location family — q81 CLIPS the tails
    * to the cut values (winsorize), q212's median ignores everything
    * but one rank; the trimmed mean uses the whole kept mass, the
    * standard robust estimator when tails are garbage rather than
    * merely extreme.
    *
    * Exactness: per-group value spine + running counts; a value group
    * occupying ranks (cum−c, cum] contributes
    * max(0, min(cum, n−lo) − max(cum−c, lo)) kept rows (lo = n·p div
    * 100) — boundary tie groups contribute PARTIALLY, by exact rank
    * overlap, so the kept count is exactly n − 2·lo in every group.
    * Mean = Σkept·v·1000 div n_kept in milli-cents, decimal-widened.
    *
    * Scale shape: the q212 discipline — one map-side-combining spine
    * groupBy, a per-group window over the spine only, a k-row
    * aggregate after. */
  def q238TrimmedMean(s: SparkSession, dir: String): DataFrame =
    trimmedMeanOn(Tables.events(s, dir).select(col("event_type"),
      expr("cast(round(value * 100) as bigint)").as("v")), TrimPct)

  /** [[q238TrimmedMean]] over any (`event_type`, `v` long) frame. */
  def trimmedMeanOn(rows: DataFrame, trimPct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = rows.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = rows.groupBy("event_type").agg(count(lit(1)).as("n"))
    spine.withColumn("cum", sum("c").over(byType))
      .join(broadcast(n), "event_type")
      .withColumn("lo", expr(s"n * $trimPct div 100"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum"), col("n") - col("lo")) -
          greatest(col("cum") - col("c"), col("lo"))))
      .groupBy("event_type")
      .agg(max("n").as("n"), sum("kept").as("n_kept"),
        sum(col("kept").cast("decimal(38,0)") * col("v")).as("ksum"))
      .select(col("event_type"), col("n"), col("n_kept"),
        expr("cast(ksum * 1000 div cast(n_kept as decimal(38,0)) as bigint)")
          .as("trimmed_mean_milli"))
  }

  // ---------------------------------------------------------------- q241

  /** q241 — OHLC downsampling: per (event type, day), the open (first
    * value by time), high, low, close (last value by time) and volume
    * — the lossy-but-shape-preserving compaction every time-series
    * store ships raw feeds through before charting/feature-extraction
    * (a 10⁹-row day becomes one row that still shows range and
    * direction). Open/close are `min_by`/`max_by` on the exact
    * microsecond timestamp with event_id packed in as tiebreak, so
    * same-instant events resolve identically in both engines.
    *
    * Scale shape: ONE map-side-combining groupBy — min_by/max_by
    * partials merge like min/max, so the aggregate is fully
    * combinable; no window, no sort. */
  def q241Ohlc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        // one orderable key: microseconds ⋅ 2²⁰ + event_id (ids < 2²⁰
        // per µs by construction) — decimal-widened, epoch-µs ⋅ 2²⁰
        // is already past the long range
        expr("""cast(unix_micros(ts) as decimal(38,0)) * 1048576
               | + event_id""".stripMargin).as("tk"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("volume"),
        expr("min_by(cents, tk)").as("open_cents"),
        max("cents").as("high_cents"), min("cents").as("low_cents"),
        expr("max_by(cents, tk)").as("close_cents"))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("volume"), col("open_cents"), col("high_cents"),
        col("low_cents"), col("close_cents"))

  // ---------------------------------------------------------------- q242

  /** q242 — per-row percentile rank WITHOUT a global window:
    * `percent_rank()`/`cume_dist()` OVER (ORDER BY v) move the whole
    * corpus to one partition (q233's scale-killer, at row
    * granularity); here the value spine carries the cumulative once
    * ([[DistCumSum]]'s two-level scan) and BROADCASTS back onto the
    * corpus — rows never shuffle at all, their scan partitioning
    * survives, and ties share one exact rank by construction. Emits
    * strictly-below mass (`pct_ppm`, the tie-stable percent rank) and
    * inclusive mass (`cume_ppm` = SQL `cume_dist` in ppm) per doc.
    *
    * Scale shape: one map-side-combining spine groupBy + one
    * broadcast hash join; zero corpus shuffles. The spine is bounded
    * by the value alphabet — beyond broadcast range, the join flips
    * to a shuffle join on `v` and the contract is unchanged. */
  def q242PercentileRank(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("v"))
    val spine = docs.groupBy("v").agg(count(lit(1)).as("c"))
    val cum = DistCumSum.overDomain(spine, "v", "c") // inclusive
    val tot = spine.agg(sum("c").as("n"))
    docs.join(broadcast(cum), "v")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("v"),
        (col("cum") - col("c")).as("below"),
        expr("(cum - c) * 1000000 div n").as("pct_ppm"),
        expr("cum * 1000000 div n").as("cume_ppm"))
  }

  // ---------------------------------------------------------------- q248

  /** q248 — WEIGHTED median per group: per source, the doc length at
    * which half the corpus TOKENS sit in shorter-or-equal docs,
    * alongside the plain row median. The two answer different
    * questions — "typical document" (row median) vs "typical token's
    * document" (weight median) — and on a corpus with a few huge docs
    * they diverge wildly; training-mix budgeting wants the token one
    * (q133's curriculum fills by token mass, not doc count).
    *
    * Integer discipline: the (source, length) spine carries both row
    * counts and exact token mass; each median is the smallest value
    * whose inclusive cumulative ×2 reaches the total (lower weighted
    * median — pure integer comparisons, no interpolation).
    *
    * Scale shape: the q212 discipline — one map-side-combining spine
    * groupBy, per-group windows over the spine only. */
  def q248WeightedMedian(s: SparkSession, dir: String): DataFrame =
    weightedMedianOn(Tables.documents(s, dir).select(
      col("source"), col("n_chars").as("v"),
      size(split(col("text"), " ")).cast("long").as("w")))

  /** [[q248WeightedMedian]] over any (`source`, `v`, `w`) frame. */
  def weightedMedianOn(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = rows.groupBy("source", "v")
      .agg(count(lit(1)).as("c"), sum("w").as("tw"))
    val bySrc = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rows.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("w").as("w_total"))
    val cum = spine
      .withColumn("cum_c", sum("c").over(bySrc))
      .withColumn("cum_w", sum("tw").over(bySrc))
      .join(broadcast(tot), "source")
    def pick(cumCol: String, totCol: String, name: String) = cum
      .where(col(cumCol) * 2 >= col(totCol))
      .groupBy("source").agg(min("v").as(name))
    pick("cum_c", "n", "median_len")
      .join(pick("cum_w", "w_total", "token_median_len"), "source")
      .join(tot, "source")
      .select("source", "n", "w_total", "median_len", "token_median_len")
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_weighted_median" -> (q248WeightedMedian _),
    "q203_acf" -> (q203Acf _),
    "q204_equidepth_hist" -> (q204EquidepthHist _),
    "q212_group_quartiles" -> (q212GroupQuartiles _),
    "q225_theil_sen" -> (q225TheilSen _),
    "q226_xcorr_lag" -> (q226XcorrLag _),
    "q235_moments" -> (q235Moments _),
    "q238_trimmed_mean" -> (q238TrimmedMean _),
    "q241_ohlc" -> (q241Ohlc _),
    "q242_percentile_rank" -> (q242PercentileRank _))

  val oracles: Map[String, String] = Map(
    "q203_acf" ->
      s"""WITH byday AS (
         | SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
         | FROM events GROUP BY 1),
         |d0 AS (SELECT min(d) AS d0 FROM byday),
         |idx AS (
         | SELECT CAST(date_diff('day', d0.d0, b.d) AS BIGINT) AS day_idx, cnt
         | FROM byday b CROSS JOIN d0),
         |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, ${MaxLag + 1})),
         |pairs AS (
         | SELECT l.lag, x.cnt AS x, y.cnt AS y
         | FROM idx x CROSS JOIN lags l
         | JOIN idx y ON y.day_idx = x.day_idx + l.lag),
         |stats AS (
         | SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |  sum(CAST(x AS HUGEINT) * y) AS sxy,
         |  sum(CAST(x AS HUGEINT) * x) AS sxx,
         |  sum(CAST(y AS HUGEINT) * y) AS syy
         | FROM pairs GROUP BY lag),
         |derived AS (
         | SELECT lag, n_pairs,
         |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_n,
         |  CAST(n_pairs * sxx - sx * sx AS BIGINT) AS vx_n,
         |  CAST(n_pairs * syy - sy * sy AS BIGINT) AS vy_n
         | FROM stats)
         |SELECT lag, n_pairs, cov_n, vx_n, vy_n,
         | CASE WHEN vx_n > 0 AND vy_n > 0 THEN
         |  CAST(round(CAST(cov_n AS DOUBLE)
         |   / sqrt(CAST(vx_n AS DOUBLE) * CAST(vy_n AS DOUBLE)) * 1000, 0)
         |   AS BIGINT) END AS r_milli
         |FROM derived""".stripMargin,
    "q212_group_quartiles" ->
      """WITH rows0 AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        | FROM events),
        |spine AS (
        | SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
        | FROM rows0 GROUP BY 1, 2),
        |n AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n
        | FROM rows0 GROUP BY 1),
        |cum AS (
        | SELECT s.event_type, s.v, n.n,
        |  sum(s.c) OVER (PARTITION BY s.event_type ORDER BY s.v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM spine s JOIN n USING (event_type)),
        |p25 AS (SELECT event_type, min(v) AS p25_cents FROM cum
        |        WHERE cum >= (25 * n + 99) // 100 GROUP BY 1),
        |p50 AS (SELECT event_type, min(v) AS p50_cents FROM cum
        |        WHERE cum >= (50 * n + 99) // 100 GROUP BY 1),
        |p75 AS (SELECT event_type, min(v) AS p75_cents FROM cum
        |        WHERE cum >= (75 * n + 99) // 100 GROUP BY 1)
        |SELECT n.event_type, n.n, p25.p25_cents, p50.p50_cents, p75.p75_cents
        |FROM n JOIN p25 USING (event_type) JOIN p50 USING (event_type)
        |JOIN p75 USING (event_type)""".stripMargin,
    "q204_equidepth_hist" ->
      s"""WITH vals AS (
         | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
         |spine AS (
         | SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
         |cum AS (
         | SELECT v, c,
         |  COALESCE(sum(c) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         | FROM spine)
         |SELECT CAST(prior * $HistBuckets // n.n AS BIGINT) AS bucket,
         | CAST(count(*) AS BIGINT) AS n_values,
         | CAST(sum(c) AS BIGINT) AS n_rows,
         | min(v) AS lo_cents, max(v) AS hi_cents,
         | CAST(sum(CAST(v AS HUGEINT) * c) // sum(c) AS BIGINT) AS mean_cents
         |FROM cum CROSS JOIN n
         |GROUP BY 1""".stripMargin,
    "q225_theil_sen" ->
      """WITH byday AS (
        | SELECT event_type, CAST(ts AS DATE) AS d,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY 1, 2),
        |d0 AS (SELECT min(d) AS d0 FROM byday),
        |idx AS (
        | SELECT event_type, CAST(date_diff('day', d0.d0, b.d) AS BIGINT) AS i,
        |  cnt
        | FROM byday b CROSS JOIN d0),
        |slopes AS (
        | SELECT a.event_type,
        |  (b.cnt - a.cnt) * 1000000 // (b.i - a.i) AS sl
        | FROM idx a JOIN idx b
        |  ON b.event_type = a.event_type AND b.i > a.i),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
        |      FROM slopes GROUP BY 1),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM byday GROUP BY 1),
        |r AS (
        | SELECT event_type, sl,
        |  row_number() OVER (PARTITION BY event_type ORDER BY sl) AS rn
        | FROM slopes)
        |SELECT r.event_type, nd.n_days, m.n_pairs, r.sl AS slope_micro
        |FROM r JOIN m USING (event_type) JOIN nd USING (event_type)
        |WHERE r.rn = (m.n_pairs + 1) // 2""".stripMargin,
    "q226_xcorr_lag" ->
      s"""WITH pair AS (
         | SELECT min(event_type) AS t1,
         |  min(CASE WHEN event_type > (SELECT min(event_type) FROM events)
         |      THEN event_type END) AS t2
         | FROM events),
         |byday AS (
         | SELECT CAST(ts AS DATE) AS d,
         |  CAST(sum(CASE WHEN event_type = (SELECT t1 FROM pair)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
         |  CAST(sum(CASE WHEN event_type = (SELECT t2 FROM pair)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS y
         | FROM events
         | WHERE event_type IN (SELECT t1 FROM pair)
         |    OR event_type IN (SELECT t2 FROM pair)
         | GROUP BY 1),
         |d0 AS (SELECT min(d) AS d0 FROM byday),
         |idx AS (
         | SELECT CAST(date_diff('day', d0.d0, b.d) AS BIGINT) AS i, x, y
         | FROM byday b CROSS JOIN d0),
         |lags AS (SELECT CAST(range AS BIGINT) AS lag
         |         FROM range(${-XcorrMaxLag}, ${XcorrMaxLag + 1})),
         |pairs AS (
         | SELECT l.lag, a.x, b.y
         | FROM idx a CROSS JOIN lags l
         | JOIN idx b ON b.i = a.i + l.lag),
         |stats AS (
         | SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |  sum(CAST(x AS HUGEINT) * y) AS sxy,
         |  sum(CAST(x AS HUGEINT) * x) AS sxx,
         |  sum(CAST(y AS HUGEINT) * y) AS syy
         | FROM pairs GROUP BY lag),
         |derived AS (
         | SELECT lag, n_pairs,
         |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_n,
         |  CAST(n_pairs * sxx - sx * sx AS BIGINT) AS vx_n,
         |  CAST(n_pairs * syy - sy * sy AS BIGINT) AS vy_n
         | FROM stats)
         |SELECT lag, n_pairs, cov_n, vx_n, vy_n,
         | CASE WHEN vx_n > 0 AND vy_n > 0 THEN
         |  CAST(round(CAST(cov_n AS DOUBLE)
         |   / sqrt(CAST(vx_n AS DOUBLE) * CAST(vy_n AS DOUBLE)) * 1000, 0)
         |   AS BIGINT) END AS r_milli
         |FROM derived""".stripMargin,
    "q235_moments" ->
      """WITH c AS (
        | SELECT event_type AS g,
        |  CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c1
        | FROM events),
        |p AS (SELECT g, c1, c1 * c1 AS c2, c1 * c1 * c1 AS c3,
        |             c1 * c1 * c1 * c1 AS c4 FROM c),
        |st AS (
        | SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(c1) AS s1,
        |  sum(c2) AS s2, sum(c3) AS s3, sum(c4) AS s4
        | FROM p GROUP BY g),
        |m AS (
        | SELECT g, n, n * s2 - s1 * s1 AS m2n,
        |  n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3n,
        |  n * n * n * s4 - 4 * n * n * s1 * s3
        |   + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS m4n
        | FROM st)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        | CASE WHEN m2n > 0 THEN CAST(round(CAST(m3n AS DOUBLE)
        |   / (CAST(m2n AS DOUBLE) * sqrt(CAST(m2n AS DOUBLE))) * 1000)
        |   AS BIGINT) END AS skew_milli,
        | CASE WHEN m2n > 0 THEN CAST(round((CAST(m4n AS DOUBLE)
        |   / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)) - 3.0) * 1000)
        |   AS BIGINT) END AS kurt_milli
        |FROM m""".stripMargin,
    "q248_weighted_median" ->
      """WITH r AS (
        | SELECT source, n_chars AS v,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        | FROM documents),
        |spine AS (
        | SELECT source, v, CAST(count(*) AS BIGINT) AS c,
        |  CAST(sum(w) AS BIGINT) AS tw
        | FROM r GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(w) AS BIGINT) AS w_total FROM r GROUP BY 1),
        |cum AS (
        | SELECT s.source, s.v, tot.n, tot.w_total,
        |  sum(s.c) OVER (PARTITION BY s.source ORDER BY s.v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
        |  sum(s.tw) OVER (PARTITION BY s.source ORDER BY s.v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
        | FROM spine s JOIN tot ON tot.source = s.source),
        |m1 AS (SELECT source, min(v) AS median_len FROM cum
        |       WHERE cum_c * 2 >= n GROUP BY 1),
        |m2 AS (SELECT source, min(v) AS token_median_len FROM cum
        |       WHERE cum_w * 2 >= w_total GROUP BY 1)
        |SELECT tot.source, tot.n, tot.w_total, m1.median_len,
        | m2.token_median_len
        |FROM tot JOIN m1 USING (source) JOIN m2 USING (source)"""
        .stripMargin,
    "q242_percentile_rank" ->
      """WITH spine AS (
        | SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        | FROM documents GROUP BY 1),
        |cum AS (
        | SELECT v, c, CAST(sum(c) OVER (ORDER BY v
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum
        | FROM spine),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine)
        |SELECT d.doc_id, d.n_chars AS v, cum.cum - cum.c AS below,
        | (cum.cum - cum.c) * 1000000 // n.n AS pct_ppm,
        | cum.cum * 1000000 // n.n AS cume_ppm
        |FROM documents d JOIN cum ON cum.v = d.n_chars CROSS JOIN n"""
        .stripMargin,
    "q241_ohlc" ->
      """WITH e AS (
        | SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
        |  CAST(epoch_us(ts) AS HUGEINT) * 1048576 + event_id AS tk,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events)
        |SELECT event_type, d, CAST(count(*) AS BIGINT) AS volume,
        | min_by(cents, tk) AS open_cents,
        | max(cents) AS high_cents, min(cents) AS low_cents,
        | max_by(cents, tk) AS close_cents
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q238_trimmed_mean" ->
      s"""WITH rows0 AS (
         | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
         | FROM events),
         |spine AS (
         | SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
         | FROM rows0 GROUP BY 1, 2),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |      FROM rows0 GROUP BY 1),
         |cum AS (
         | SELECT s.event_type, s.v, s.c, n.n, n.n * $TrimPct // 100 AS lo,
         |  sum(s.c) OVER (PARTITION BY s.event_type ORDER BY s.v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM spine s JOIN n USING (event_type)),
         |k AS (
         | SELECT event_type, n,
         |  greatest(0, least(cum, n - lo) - greatest(cum - c, lo)) AS kept, v
         | FROM cum)
         |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         | CAST(sum(kept) AS BIGINT) AS n_kept,
         | CAST(sum(CAST(kept AS HUGEINT) * v) * 1000
         |   // CAST(sum(kept) AS HUGEINT) AS BIGINT) AS trimmed_mean_milli
         |FROM k GROUP BY event_type""".stripMargin)
}
