package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.operators.DistCumSum
import graft.sources.Tables

/** Classical two-sample hypothesis tests, run at corpus scale with
  * exact integer statistics — the read-outs that decide whether two
  * slices of a 100 TB corpus are "the same distribution": q216
  * difference-in-differences (the panel-data causal contrast), q217
  * two-sample Kolmogorov–Smirnov (max CDF gap — the distribution-shift
  * detector), q218 Mann–Whitney U / rank-biserial AUC (the location
  * test that survives the heavy tails that break t-tests), q223
  * Welch's t (the parametric mean test with its Satterthwaite df),
  * and q224 one-way ANOVA (the k-group mean gate).
  *
  * All three compress the corpus to a bounded spine first (value
  * histogram or 2×2 cell totals) and compute the statistic on the
  * spine in pure integers: cumulative counts are cross-multiplied
  * (c1·n2 − c2·n1) instead of divided, ranks are kept DOUBLED so tie
  * midranks stay integral, and the only divisions are final integral
  * `div`s onto ppm scales — so the DuckDB oracle matches bit-for-bit.
  * The q217/q218 spine cumulative runs through [[DistCumSum]]'s
  * two-level scan: no single-partition window anywhere, even when the
  * value alphabet outgrows one executor.
  */
object Hypothesis {

  // ---------------------------------------------------------------- q216

  /** q216 — difference-in-differences: users hash-split into
    * treat/control arms (the q122/q98 md5 discipline — identical draw
    * in both engines), the calendar split at the midpoint day, and the
    * DiD contrast (Δtreat − Δcontrol in mean cents per arm user)
    * computed exactly over a common denominator:
    * ((S_tp−S_t0)·n_c − (S_cp−S_c0)·n_t) · 10⁶ div (n_t·n_c).
    * The parallel-trends read-out every launch review asks for, from
    * ONE pass over the events table.
    *
    * Scale shape: one global aggregate with conditional sums and two
    * conditional count-distincts — partial aggregation does the work
    * map-side; the result is a single row. Products widen through
    * decimal(38,0) so arm sizes in the billions cannot overflow. */
  def q216Did(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val bounds = e.agg(min(to_date(col("ts"))).as("dmin"),
      max(to_date(col("ts"))).as("dmax"))
    didOn(e.crossJoin(broadcast(bounds)).select(
      col("user_id"),
      T.hashMod("did:", col("user_id"), 2).as("arm"),
      (to_date(col("ts")) > expr(
        "date_add(dmin, cast(datediff(dmax, dmin) div 2 as int))")).as("post"),
      expr("cast(round(value * 100) as bigint)").as("cents")))
  }

  /** [[q216Did]] over any (user_id, `arm` 0/1, `post` bool, `cents`)
    * frame — exposed for the hand-computed spec. */
  def didOn(e: DataFrame): DataFrame = {
    def cell(a: Int, p: Boolean) = coalesce(sum(when(
      col("arm") === a && col("post") === p, col("cents"))), lit(0L))
    e.groupBy().agg(
      count_distinct(when(col("arm") === 1, col("user_id"))).as("n_treat"),
      count_distinct(when(col("arm") === 0, col("user_id"))).as("n_ctrl"),
      cell(1, p = false).as("s_treat_pre"), cell(1, p = true).as("s_treat_post"),
      cell(0, p = false).as("s_ctrl_pre"), cell(0, p = true).as("s_ctrl_post"))
      .withColumn("did_micro_cents", expr(
        """cast(((s_treat_post - s_treat_pre) * cast(n_ctrl as decimal(38,0))
          |  - (s_ctrl_post - s_ctrl_pre) * cast(n_treat as decimal(38,0)))
          | * 1000000 div (cast(n_treat as decimal(38,0)) * n_ctrl)
          | as bigint)""".stripMargin))
  }

  // ------------------------------------------------------- q217 / q218

  /** The two-sample pair: the two lexicographically-first `source`
    * values of the documents table, compared on their `n_chars`
    * distributions. Bounded driver fetch (SURVEY P7 discipline). */
  private def samplePair(docs: DataFrame): (String, String) = {
    val ss = docs.select("source").distinct().orderBy("source")
      .limit(2).collect().map(_.getString(0))
    (ss(0), ss(1))
  }

  /** (src_a, src_b, spine) — spine = one row per distinct value with
    * per-sample counts `c1`/`c2` and [[DistCumSum]] cumulatives
    * `f1`/`f2` (inclusive CDF numerators). The shared first half of
    * q217 and q218. */
  private def cdfSpine(docs: DataFrame, s1: String, s2: String): DataFrame = {
    val hist = docs.where(col("source").isin(s1, s2))
      .select(col("source"), col("n_chars").as("v"))
      .groupBy("v").agg(
        sum(when(col("source") === s1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === s2, 1L).otherwise(0L)).as("c2"))
    DistCumSum.overDomainAll(hist, "v", Seq("c1" -> "f1", "c2" -> "f2"))
  }

  private def wide(c: Column): Column = c.cast("decimal(38,0)")

  /** q217 — two-sample Kolmogorov–Smirnov distance between the two
    * sources' document-length distributions: D = max_v |F₁(v) − F₂(v)|,
    * computed as max |f1·n2 − f2·n1| on the value spine (cumulative
    * counts cross-multiplied — no division until the final ppm) and
    * reported in ppm of n1·n2. THE nonparametric "did the length
    * distribution drift" alarm: unlike q177's PSI it needs no binning
    * choice, and unlike a mean test it sees shape changes that leave
    * the mean fixed.
    *
    * Scale shape: corpus → value histogram (map-side partial), spine
    * cumulative via [[DistCumSum]], one scalar max. Products widen
    * through decimal(38,0): exact up to 10¹⁹-row samples. */
  def q217KsTest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (s1, s2) = samplePair(docs)
    ksOn(cdfSpine(docs, s1, s2), s1, s2)
  }

  /** KS statistic from a (`v`, c1, c2, f1, f2) CDF spine. */
  def ksOn(spine: DataFrame, srcA: String, srcB: String): DataFrame = {
    val n = spine.groupBy().agg(sum("c1").as("n1"), sum("c2").as("n2"))
    spine.crossJoin(broadcast(n))
      .agg(max(abs(wide(col("f1")) * col("n2") - wide(col("f2")) * col("n1")))
        .as("d_num"), first("n1").as("n1"), first("n2").as("n2"))
      .select(lit(srcA).as("src_a"), lit(srcB).as("src_b"),
        col("n1"), col("n2"),
        expr("cast(d_num * 1000000 div (cast(n1 as decimal(38,0)) * n2) as bigint)")
          .as("d_ppm"))
  }

  /** q218 — Mann–Whitney U between the same two samples, ties handled
    * by exact midranks kept DOUBLED so they stay integral: the rank
    * contribution of spine row v is c1·(2·cb + c + 1) with cb = pooled
    * cumulative below v and c = pooled count at v; U₁×2 = ΣR₁×2 −
    * n1(n1+1). Reported with the rank-biserial effect size
    * AUC = U₁/(n1·n2) in ppm — P(random doc from A longer than one
    * from B), the location shift q217's shape test does not isolate.
    *
    * Scale shape: identical to q217 — histogram, [[DistCumSum]]
    * cumulative, one scalar aggregate; decimal(38,0) widening. */
  def q218MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (s1, s2) = samplePair(docs)
    mannWhitneyOn(cdfSpine(docs, s1, s2), s1, s2)
  }

  /** Doubled-rank U from a (`v`, c1, c2, f1, f2) CDF spine. */
  def mannWhitneyOn(spine: DataFrame, srcA: String, srcB: String): DataFrame =
    spine
      // pooled cumulative BELOW v (cb) and pooled count at v (c)
      .select(col("c1"), (col("c1") + col("c2")).as("c"),
        (col("f1") + col("f2") - col("c1") - col("c2")).as("cb"))
      .agg(sum(wide(col("c1")) * (col("cb") * 2 + col("c") + 1)).as("r1_x2"),
        sum("c1").as("n1"), sum(col("c") - col("c1")).as("n2"))
      .select(lit(srcA).as("src_a"), lit(srcB).as("src_b"),
        col("n1"), col("n2"),
        expr("cast(r1_x2 - cast(n1 as decimal(38,0)) * (n1 + 1) as decimal(38,0))")
          .as("u1_x2"))
      .select(col("src_a"), col("src_b"), col("n1"), col("n2"),
        col("u1_x2").cast("long").as("u1_x2"),
        expr("cast(u1_x2 * 1000000 div (2 * cast(n1 as decimal(38,0)) * n2) as bigint)")
          .as("auc_ppm"))

  // ---------------------------------------------------------------- q223

  /** q223 — Welch's unequal-variance t-test between the same two
    * sources' document-length distributions: the PARAMETRIC member of
    * the two-sample family (q217 tests shape, q218 location by rank;
    * this one tests the mean, with the classic t read-out reviews
    * expect). Never assumes equal variances — the two sources of a web
    * corpus never have them.
    *
    * Exactness: the corpus collapses to six sufficient statistics
    * (n, Σv, Σv² per sample — one map-side-combining aggregate). Both
    * t² and the Welch–Satterthwaite df are then ratios of SQUARES of
    * exact rationals — clearing those symbolically overflows
    * decimal(38,0) once samples reach ~10⁶ rows/side with a material
    * mean gap (Spark's non-ANSI decimal would silently NULL while
    * DuckDB HUGEINT errors — the q224 overflow, reappearing here). So
    * both engines snap the STAGED quantities to integer micro units
    * first (the q104 micro-nat discipline): aᵢ = sᵢ²/nᵢ as v_iu micros
    * (with Aᵢ = nᵢ·Qᵢ − Sᵢ², aᵢ = Aᵢ/(nᵢ²(nᵢ−1))), the mean gap as
    * ppm, then t²·10⁶ = md_ppm² div (v1u + v2u) and the identical
    * staged df — n never re-enters a numerator, so the staging is
    * corpus-size-safe; each read-out is off by < 1e-6 relative from
    * the unstaged value, and both engines evaluate the identical
    * integral formula so the gate compares bit-for-bit. The signed
    * mean gap rides along in ppm (`div` and DuckDB `//` both truncate
    * toward zero, verified, so negatives agree — and md_ppm² squares
    * AFTER that shared truncation). */
  def q223WelchT(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (s1, s2) = samplePair(docs)
    welchOn(docs.where(col("source").isin(s1, s2))
      .select((col("source") === s1).as("a"), col("n_chars").as("v")), s1, s2)
  }

  /** Welch t² + df from a two-sample (`a` bool, `v` long) frame —
    * exposed for the hand-computed spec. */
  def welchOn(df: DataFrame, srcA: String, srcB: String): DataFrame =
    df.agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("a"), wide(col("v")))).as("s1"),
      sum(when(!col("a"), wide(col("v")))).as("s2"),
      sum(when(col("a"), wide(col("v")) * col("v"))).as("q1"),
      sum(when(!col("a"), wide(col("v")) * col("v"))).as("q2"))
      .withColumn("a1", expr("n1 * q1 - s1 * s1"))
      .withColumn("a2", expr("n2 * q2 - s2 * s2"))
      // sᵢ²/nᵢ snapped to integer micros: aᵢ/(nᵢ²(nᵢ−1)) · 10⁶
      .withColumn("v1u", expr(
        "cast(a1 * 1000000 div (cast(n1 as decimal(38,0)) * n1 * (n1 - 1)) as decimal(38,0))"))
      .withColumn("v2u", expr(
        "cast(a2 * 1000000 div (cast(n2 as decimal(38,0)) * n2 * (n2 - 1)) as decimal(38,0))"))
      .withColumn("md_ppm", expr(
        "cast((s1 * n2 - s2 * n1) * 1000000 div (cast(n1 as decimal(38,0)) * n2) as decimal(38,0))"))
      .select(
        lit(srcA).as("src_a"), lit(srcB).as("src_b"), col("n1"), col("n2"),
        expr("cast(md_ppm as bigint)").as("mdiff_ppm"),
        expr("cast(md_ppm * md_ppm div (v1u + v2u) as bigint)").as("t2_ppm"),
        expr("""cast((v1u + v2u) * (v1u + v2u) * 1000
               | div (v1u * v1u div (n1 - 1) + v2u * v2u div (n2 - 1))
               | as bigint)""".stripMargin).as("df_milli"))

  // ---------------------------------------------------------------- q224

  /** q224 — one-way ANOVA across event types on event value (in exact
    * cents): does ANY event type differ in mean value, in one test —
    * the k-group gate you run BEFORE k·(k−1)/2 pairwise q223s (and the
    * multiple-comparison trap they carry). F = (SSB/(k−1))/(SSW/(n−k)).
    *
    * Exactness: one grouped aggregate gives (n_g, ΣC, ΣC²) per type —
    * partial aggregation map-side, k rows after — then the between/
    * within sums of squares come from Σ (S_g² div n_g) — each term a
    * single integral division of exact integers in WHOLE square-cents
    * (micro-staging would push S_g²·10⁶/n_g ≈ n_g·var·10⁶ past the
    * bigint range `div` returns — measured 1.6e19 at sf0.1 already),
    * summed over k rows; both engines evaluate the identical terms so
    * the unit truncations agree, and SSB/SSW are off by at most k
    * square-cents from exact. Sums accumulate in decimal(38,0): cent
    * squares are 10¹⁰, so a Long Σc² dies at 10⁹ rows — the q144
    * lesson. */
  def q224Anova(s: SparkSession, dir: String): DataFrame =
    anovaOn(Tables.events(s, dir).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("c")))

  /** One-way ANOVA from a (`g` group, `c` long) frame. */
  def anovaOn(e: DataFrame): DataFrame =
    e.groupBy("g")
      .agg(count(lit(1)).as("n_g"), sum(wide(col("c"))).as("s_g"),
        sum(wide(col("c")) * col("c")).as("q_g"))
      .agg(count(lit(1)).as("k"), sum("n_g").as("n"),
        sum("s_g").as("s"), sum("q_g").as("q"),
        // div returns bigint; re-widen each term so the k-row SUM of
        // ~n_g·var-sized terms survives any corpus size
        sum(expr("cast(s_g * s_g div n_g as decimal(38,0))")).as("term"))
      .withColumn("ssb", expr(
        "term - s * s div cast(n as decimal(38,0))"))
      .withColumn("ssw", expr("q - term"))
      .select(col("k"), col("n"),
        expr("cast(ssb as bigint)").as("ssb"),
        expr("cast(ssw as bigint)").as("ssw"),
        expr("""cast(ssb * (n - k) * 1000000
               | div (ssw * (k - 1)) as bigint)""".stripMargin)
          .as("f_ppm"))

  // ---------------------------------------------------------------- q259

  /** Romano et al. |δ| magnitude cuts, in ppm. */
  val CliffSmallPpm = 147000L
  val CliffMediumPpm = 330000L
  val CliffLargePpm = 474000L

  /** q259 — Cliff's delta between the q218 pair: the ORDINAL effect
    * size δ = P(a > b) − P(a < b) = 2U/(n₁n₂) − 1, derived exactly from
    * the same doubled-rank U statistic (δ_ppm = u1_x2·10⁶ div (n₁n₂) −
    * 10⁶ — one integral division, tie-aware for free), with the
    * conventional Romano magnitude bucket alongside. The read-out
    * reviews actually want next to q218's p-story: HOW big the shift
    * is, robust to the heavy tails that break Cohen's d.
    *
    * Scale shape: identical to q217/q218 — histogram spine,
    * [[DistCumSum]] cumulative, one scalar aggregate. */
  def q259CliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (s1, s2) = samplePair(docs)
    mannWhitneyOn(cdfSpine(docs, s1, s2), s1, s2)
      .withColumn("delta_ppm", expr(
        """cast(cast(u1_x2 as decimal(38,0)) * 1000000
          | div (cast(n1 as decimal(38,0)) * n2) - 1000000 as bigint)"""
          .stripMargin))
      .select(col("src_a"), col("src_b"), col("n1"), col("n2"),
        col("delta_ppm"),
        when(abs(col("delta_ppm")) < CliffSmallPpm, "negligible")
          .when(abs(col("delta_ppm")) < CliffMediumPpm, "small")
          .when(abs(col("delta_ppm")) < CliffLargePpm, "medium")
          .otherwise("large").as("magnitude"))
  }

  // ---------------------------------------------------------------- q261

  /** q261 — Levene's test (mean-centered) for variance homogeneity of
    * event value across event types: the gate you run BEFORE trusting
    * q224's ANOVA (whose F assumes equal group variances — ironically
    * the thing it cannot itself check). Each observation maps to its
    * absolute deviation from the group mean, snapped to WHOLE cents
    * (the mean is one integral division to micro-cents, the deviation
    * one more back to cents — both truncations identical cross-engine;
    * staying in micro-cents would push the ANOVA's Σz² read-outs past
    * bigint, the q224 overflow lesson in reverse), then the one-way
    * ANOVA machinery runs unchanged on the deviations — F_ppm large ⇒
    * spreads differ.
    *
    * Scale shape: one grouped mean pass (map-side combinable, k-row
    * broadcast back) + the q224 aggregate on the deviations. */
  def q261Levene(s: SparkSession, dir: String): DataFrame =
    leveneOn(Tables.events(s, dir).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("c")))

  /** [[q261Levene]] from a (`g` group, `c` long) frame. */
  def leveneOn(e: DataFrame): DataFrame = {
    val means = e.groupBy("g").agg(count(lit(1)).as("__n"),
        sum(wide(col("c"))).as("__s"))
      .select(col("g"),
        expr("cast(__s * 1000000 div __n as decimal(38,0))").as("__mu"))
    anovaOn(e.join(broadcast(means), "g")
      .select(col("g"),
        expr("""cast(abs(cast(c as decimal(38,0)) * 1000000 - __mu)
               | div 1000000 as bigint)""".stripMargin).as("c")))
  }

  // ---------------------------------------------------------------- q237

  /** BH significance level for [[q237BhFdr]], in ppm (α = 0.05). */
  val BhAlphaPpm = 50000L

  /** q237 — ALL-pairs KS with Benjamini–Hochberg FDR control: every
    * pair of sources compared on its document-length distribution
    * (the q217 statistic, asymptotic Smirnov p ≈ 2·e^(−2D²·n₁n₂/(n₁+n₂))),
    * then the 190-row p-value list BH-corrected at α = 0.05. THE
    * multiple-comparisons operator: run q217 naively across 20 sources
    * and ~9 "significant" pairs appear by chance alone; BH caps the
    * expected false-discovery fraction at α while keeping far more
    * power than Bonferroni.
    *
    * Integer discipline: per-source CDFs materialize on the GLOBAL
    * value spine (dense source × value grid — both alphabet-bounded),
    * D numerators are exact cross-products; the single transcendental
    * (exp) takes an integer-derived double and snaps to micro
    * (the q104 ln discipline); the BH step is pure integer —
    * reject rank i iff p_micro·m ≤ α_ppm·i, take every rank ≤ the
    * largest passing one.
    *
    * Scale shape: corpus → (source, value) histogram in ONE pass;
    * everything after — dense grid, per-source running counts, the
    * pairs² join, the BH window — runs on alphabet-bounded frames
    * (sources² × values, never corpus rows). */
  def q237BhFdr(s: SparkSession, dir: String): DataFrame =
    bhFdrOn(Tables.documents(s, dir)
      .select(col("source"), col("n_chars").as("v")))

  /** [[q237BhFdr]] over any (`source`, `v` long) frame. */
  def bhFdrOn(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one corpus pass; all later branches run on the bounded spine
    val hist = rows.groupBy("source", "v").agg(count(lit(1)).as("c"))
      .persist()
    val vs = hist.select("v").distinct()
    val srcs = hist.groupBy("source").agg(sum("c").as("n"))
    // dense source × value grid -> exact per-source CDF at every v
    val grid = vs.crossJoin(srcs.select("source"))
      .join(hist, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val bysrc = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = grid.withColumn("f", sum("c").over(bysrc))
    val a = cdf.select(col("source").as("s1"), col("v"), col("f").as("f1"))
      .join(srcs.select(col("source").as("s1"), col("n").as("n1")), "s1")
    val b = cdf.select(col("source").as("s2"), col("v"), col("f").as("f2"))
      .join(srcs.select(col("source").as("s2"), col("n").as("n2")), "s2")
    val d = a.join(b, Seq("v")).where(col("s1") < col("s2"))
      .groupBy("s1", "s2", "n1", "n2")
      .agg(max(abs(wide(col("f1")) * col("n2") - wide(col("f2")) * col("n1")))
        .as("d_num"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        col("d_num").cast("long").as("d_num"),
        // Smirnov: 2·exp(−2·(D·n1n2)²/(n1n2(n1+n2))) with exact-integer
        // argument; least() caps the asymptotic tail formula at 1
        least(lit(1000000L), expr(
          """cast(round(2000000 * exp(-2.0
            | * cast(d_num as double) * cast(d_num as double)
            | / (cast(n1 as double) * n2 * (n1 + n2)))) as bigint)"""
            .stripMargin)).as("p_micro"))
      // bounded (sources²/2 rows) and consumed by TWO actions — the m
      // count below and the final materialize; un-persisted, the whole
      // grid/CDF/pair-join lineage re-executed for the second action
      .persist()
    val m = d.count() // bounded: sources²/2 — the BH list length
    val w = Window.orderBy(col("p_micro"), col("s1"), col("s2"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val out = d
      .withColumn("rank", row_number().over(w))
      .withColumn("pass", when(
        col("p_micro") * lit(m) <= lit(BhAlphaPpm) * col("rank"), col("rank")))
      .withColumn("k_star", coalesce(max("pass").over(wAll), lit(0)))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("d_num"),
        col("p_micro"), col("rank").cast("long").as("rank"),
        (col("rank") <= col("k_star")).as("rejected"))
    graft.operators.SmallResult.materialize(out, hist, d)
  }

  // ---------------------------------------------------------------- q250

  /** q250 — Kendall rank correlation (τ-b, tie-corrected) between two
    * per-doc signals — length vs stopword score, the "do my two
    * quality signals even agree on ordering" check. Pearson (q87)
    * asks about LINEAR co-movement; τ asks the weaker, more robust
    * question rank-based gating actually depends on: of all doc
    * pairs, how many do the two signals order the same way?
    *
    * Exactness: both signals quantize to decile buckets (ranks are
    * what τ measures, so bucketing = coarser ties, handled exactly by
    * τ-b), the corpus collapses to the ≤ 10×10 joint grid in ONE
    * aggregation, and concordant/discordant counts are exact integer
    * sums over grid-cell PAIRS (≤ 4950, metadata). The single sqrt
    * takes the same exact integers in both engines and snaps to
    * milli.
    *
    * Scale shape: one map-side-combining groupBy; everything after is
    * grid-sized. The grid trick is the scale story — naive τ is
    * O(n²) pair enumeration; on a bounded alphabet it is O(cells²),
    * volume-independent. */
  def q250KendallTau(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    kendallOn(docs
      .select(col("n_chars").as("x0"),
        expr("size(filter(split(text, ' '), t -> array_contains(" +
          T.EnglishStopwords.map(w => s"'$w'").mkString("array(", ",", ")") +
          ", t))) * 1000000L div size(split(text, ' '))").as("y0"))
      .crossJoin(broadcast(docs.agg(
        expr("max(n_chars)").as("xmax"))))
      .select(least(expr("x0 * 10 div (xmax + 1)"), lit(9L)).as("xa"),
        least(expr("y0 div 100000"), lit(9L)).as("yb")))
  }

  /** [[q250KendallTau]] over any bucketed (`xa`, `yb`) frame. */
  def kendallOn(rows: DataFrame): DataFrame = {
    val grid = rows.groupBy("xa", "yb").agg(count(lit(1)).as("n")).persist()
    val a = grid.select(col("xa").as("x1"), col("yb").as("y1"),
      col("n").as("n1"))
    val b = grid.select(col("xa").as("x2"), col("yb").as("y2"),
      col("n").as("n2"))
    val pairs = a.join(b, col("x1") < col("x2") ||
      (col("x1") === col("x2") && col("y1") < col("y2")))
    val cd = pairs.agg(
      sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
        (col("x1") > col("x2") && col("y1") > col("y2")),
        wide(col("n1")) * col("n2"))).as("c_pairs"),
      sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
        (col("x1") > col("x2") && col("y1") < col("y2")),
        wide(col("n1")) * col("n2"))).as("d_pairs"))
    val margins = grid.agg(sum("n").as("nn"))
    val tx = grid.groupBy("xa").agg(sum("n").as("m"))
      .agg(sum(wide(col("m")) * col("m")).as("sq_x"))
    val ty = grid.groupBy("yb").agg(sum(col("n")).as("m"))
      .agg(sum(wide(col("m")) * col("m")).as("sq_y"))
    val out = cd.crossJoin(broadcast(margins))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      // n0 − n1 = (n² − Σm_x²)/2 etc.: everything ×2 to stay integral
      .select(col("nn").cast("long").as("n"),
        coalesce(col("c_pairs"), lit(0L)).cast("long").as("c_pairs"),
        coalesce(col("d_pairs"), lit(0L)).cast("long").as("d_pairs"),
        expr("""cast(round(
               |  cast(2 * (coalesce(c_pairs, 0) - coalesce(d_pairs, 0))
               |    as double)
               |  / sqrt(cast(cast(nn as decimal(38,0)) * nn - sq_x as double)
               |       * cast(cast(nn as decimal(38,0)) * nn - sq_y as double))
               |  * 1000) as bigint)""".stripMargin).as("tau_b_milli"))
    graft.operators.SmallResult.materialize(out, grid)
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_did" -> (q216Did _),
    "q217_ks_test" -> (q217KsTest _),
    "q218_mann_whitney" -> (q218MannWhitney _),
    "q223_welch_t" -> (q223WelchT _),
    "q224_anova" -> (q224Anova _),
    "q237_bh_fdr" -> (q237BhFdr _),
    "q250_kendall_tau" -> (q250KendallTau _),
    "q259_cliffs_delta" -> (q259CliffsDelta _),
    "q261_levene" -> (q261Levene _))

  /** DuckDB spine CTEs shared by the q217/q218 oracles. */
  private val spineSql =
    """pair AS (
      | SELECT min(source) AS s1,
      |  min(CASE WHEN source > (SELECT min(source) FROM documents)
      |      THEN source END) AS s2
      | FROM documents),
      |hist AS (
      | SELECT n_chars AS v,
      |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair) THEN 1 ELSE 0 END)
      |   AS BIGINT) AS c1,
      |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair) THEN 1 ELSE 0 END)
      |   AS BIGINT) AS c2
      | FROM documents
      | WHERE source IN (SELECT s1 FROM pair) OR source IN (SELECT s2 FROM pair)
      | GROUP BY 1),
      |cum AS (
      | SELECT v, c1, c2,
      |  sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS f1,
      |  sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS f2
      | FROM hist),
      |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      |      FROM hist)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q216_did" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS dmin,
        |                  max(CAST(ts AS DATE)) AS dmax FROM events),
        |e AS (
        | SELECT user_id,
        |  ('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 2 AS arm,
        |  CAST(ts AS DATE) >
        |    (SELECT dmin + CAST(date_diff('day', dmin, dmax) // 2 AS INTEGER)
        |     FROM b) AS post,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |cells AS (
        | SELECT
        |  CAST(count(DISTINCT CASE WHEN arm = 1 THEN user_id END) AS BIGINT)
        |    AS n_treat,
        |  CAST(count(DISTINCT CASE WHEN arm = 0 THEN user_id END) AS BIGINT)
        |    AS n_ctrl,
        |  CAST(coalesce(sum(CASE WHEN arm = 1 AND NOT post THEN cents END), 0)
        |    AS BIGINT) AS s_treat_pre,
        |  CAST(coalesce(sum(CASE WHEN arm = 1 AND post THEN cents END), 0)
        |    AS BIGINT) AS s_treat_post,
        |  CAST(coalesce(sum(CASE WHEN arm = 0 AND NOT post THEN cents END), 0)
        |    AS BIGINT) AS s_ctrl_pre,
        |  CAST(coalesce(sum(CASE WHEN arm = 0 AND post THEN cents END), 0)
        |    AS BIGINT) AS s_ctrl_post
        | FROM e)
        |SELECT *,
        | CAST(((s_treat_post - s_treat_pre) * CAST(n_ctrl AS HUGEINT)
        |   - (s_ctrl_post - s_ctrl_pre) * CAST(n_treat AS HUGEINT)) * 1000000
        |  // (CAST(n_treat AS HUGEINT) * n_ctrl) AS BIGINT) AS did_micro_cents
        |FROM cells""".stripMargin,
    "q217_ks_test" ->
      s"""WITH $spineSql
         |SELECT (SELECT s1 FROM pair) AS src_a, (SELECT s2 FROM pair) AS src_b,
         | n.n1, n.n2,
         | CAST(max(abs(CAST(f1 AS HUGEINT) * n.n2 - CAST(f2 AS HUGEINT) * n.n1))
         |   * 1000000 // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT) AS d_ppm
         |FROM cum, n GROUP BY 1, 2, 3, 4""".stripMargin,
    "q218_mann_whitney" ->
      s"""WITH $spineSql,
         |u AS (
         | SELECT CAST(sum(CAST(c1 AS HUGEINT)
         |    * (2 * (f1 + f2 - c1 - c2) + (c1 + c2) + 1)) AS HUGEINT) AS r1_x2
         | FROM cum)
         |SELECT (SELECT s1 FROM pair) AS src_a, (SELECT s2 FROM pair) AS src_b,
         | n.n1, n.n2,
         | CAST(u.r1_x2 - CAST(n.n1 AS HUGEINT) * (n.n1 + 1) AS BIGINT) AS u1_x2,
         | CAST((u.r1_x2 - CAST(n.n1 AS HUGEINT) * (n.n1 + 1)) * 1000000
         |   // (2 * CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT) AS auc_ppm
         |FROM u, n""".stripMargin,
    "q259_cliffs_delta" ->
      s"""WITH $spineSql,
         |u AS (
         | SELECT CAST(sum(CAST(c1 AS HUGEINT)
         |    * (2 * (f1 + f2 - c1 - c2) + (c1 + c2) + 1)) AS HUGEINT) AS r1_x2
         | FROM cum),
         |d AS (
         | SELECT (SELECT s1 FROM pair) AS src_a, (SELECT s2 FROM pair) AS src_b,
         |  n.n1, n.n2,
         |  CAST((u.r1_x2 - CAST(n.n1 AS HUGEINT) * (n.n1 + 1)) * 1000000
         |    // (CAST(n.n1 AS HUGEINT) * n.n2) - 1000000 AS BIGINT) AS delta_ppm
         | FROM u, n)
         |SELECT src_a, src_b, n1, n2, delta_ppm,
         | CASE WHEN abs(delta_ppm) < $CliffSmallPpm THEN 'negligible'
         |      WHEN abs(delta_ppm) < $CliffMediumPpm THEN 'small'
         |      WHEN abs(delta_ppm) < $CliffLargePpm THEN 'medium'
         |      ELSE 'large' END AS magnitude
         |FROM d""".stripMargin,
    "q261_levene" ->
      """WITH e AS (
        | SELECT event_type AS g, CAST(round(value * 100) AS HUGEINT) AS cc
        | FROM events),
        |m AS (
        | SELECT g, sum(cc) * 1000000 // CAST(count(*) AS HUGEINT) AS mu
        | FROM e GROUP BY 1),
        |z AS (SELECT e.g, abs(e.cc * 1000000 - m.mu) // 1000000 AS c
        |      FROM e JOIN m USING (g)),
        |g2 AS (
        | SELECT g, CAST(count(*) AS HUGEINT) AS n_g, sum(c) AS s_g,
        |  sum(c * c) AS q_g
        | FROM z GROUP BY 1),
        |tot AS (
        | SELECT CAST(count(*) AS HUGEINT) AS k, sum(n_g) AS n,
        |  sum(s_g) AS s, sum(q_g) AS q,
        |  sum(s_g * s_g // n_g) AS term
        | FROM g2)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        | CAST(term - s * s // n AS BIGINT) AS ssb,
        | CAST(q - term AS BIGINT) AS ssw,
        | CAST((term - s * s // n) * (n - k) * 1000000
        |   // ((q - term) * (k - 1)) AS BIGINT) AS f_ppm
        |FROM tot""".stripMargin,
    "q223_welch_t" ->
      """WITH pair AS (
        | SELECT min(source) AS s1,
        |  min(CASE WHEN source > (SELECT min(source) FROM documents)
        |      THEN source END) AS s2
        | FROM documents),
        |st AS (
        | SELECT
        |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair) THEN 1 ELSE 0 END)
        |    AS HUGEINT) AS na,
        |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair) THEN 1 ELSE 0 END)
        |    AS HUGEINT) AS nb,
        |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair) THEN n_chars END)
        |    AS HUGEINT) AS sa,
        |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair) THEN n_chars END)
        |    AS HUGEINT) AS sb,
        |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair)
        |      THEN CAST(n_chars AS HUGEINT) * n_chars END) AS HUGEINT) AS qa,
        |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair)
        |      THEN CAST(n_chars AS HUGEINT) * n_chars END) AS HUGEINT) AS qb
        | FROM documents
        | WHERE source IN (SELECT s1 FROM pair) OR source IN (SELECT s2 FROM pair)),
        |ab AS (SELECT *, na * qa - sa * sa AS a1, nb * qb - sb * sb AS a2
        |       FROM st),
        |vu AS (SELECT *,
        |  a1 * 1000000 // (na * na * (na - 1)) AS v1u,
        |  a2 * 1000000 // (nb * nb * (nb - 1)) AS v2u,
        |  (sa * nb - sb * na) * 1000000 // (na * nb) AS md_ppm FROM ab)
        |SELECT (SELECT s1 FROM pair) AS src_a, (SELECT s2 FROM pair) AS src_b,
        | CAST(na AS BIGINT) AS n1, CAST(nb AS BIGINT) AS n2,
        | CAST(md_ppm AS BIGINT) AS mdiff_ppm,
        | CAST(md_ppm * md_ppm // (v1u + v2u) AS BIGINT) AS t2_ppm,
        | CAST((v1u + v2u) * (v1u + v2u) * 1000
        |  // (v1u * v1u // (na - 1) + v2u * v2u // (nb - 1))
        |  AS BIGINT) AS df_milli
        |FROM vu""".stripMargin,
    "q224_anova" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(count(*) AS HUGEINT) AS n_g,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s_g,
        |  CAST(sum(CAST(round(value * 100) AS HUGEINT)
        |         * CAST(round(value * 100) AS HUGEINT)) AS HUGEINT) AS q_g
        | FROM events GROUP BY 1),
        |tot AS (
        | SELECT CAST(count(*) AS HUGEINT) AS k, sum(n_g) AS n,
        |  sum(s_g) AS s, sum(q_g) AS q,
        |  sum(s_g * s_g // n_g) AS term
        | FROM g)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        | CAST(term - s * s // n AS BIGINT) AS ssb,
        | CAST(q - term AS BIGINT) AS ssw,
        | CAST((term - s * s // n) * (n - k) * 1000000
        |   // ((q - term) * (k - 1)) AS BIGINT) AS f_ppm
        |FROM tot""".stripMargin,
    "q237_bh_fdr" ->
      s"""WITH hist AS (
         | SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
         | FROM documents GROUP BY 1, 2),
         |vs AS (SELECT DISTINCT v FROM hist),
         |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |         FROM hist GROUP BY 1),
         |grid AS (
         | SELECT s.source, vs.v, COALESCE(h.c, 0) AS c
         | FROM vs CROSS JOIN (SELECT source FROM srcs) s
         | LEFT JOIN hist h ON h.source = s.source AND h.v = vs.v),
         |cdf AS (
         | SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
         | FROM grid),
         |d AS (
         | SELECT a.source AS s1, b.source AS s2, sa.n AS n1, sb.n AS n2,
         |  CAST(max(abs(CAST(a.f AS HUGEINT) * sb.n
         |             - CAST(b.f AS HUGEINT) * sa.n)) AS BIGINT) AS d_num
         | FROM cdf a JOIN cdf b ON a.v = b.v AND a.source < b.source
         | JOIN srcs sa ON sa.source = a.source
         | JOIN srcs sb ON sb.source = b.source
         | GROUP BY 1, 2, 3, 4),
         |p AS (
         | SELECT *, least(1000000, CAST(round(2000000 * exp(-2.0
         |   * CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE)
         |   / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2)))) AS BIGINT)) AS p_micro
         | FROM d),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
         |r AS (SELECT p.*, row_number() OVER (ORDER BY p_micro, s1, s2)
         |        AS rank FROM p),
         |ks AS (SELECT COALESCE(max(CASE WHEN p_micro * (SELECT m FROM m)
         |          <= $BhAlphaPpm * rank THEN rank END), 0) AS k_star FROM r)
         |SELECT s1, s2, n1, n2, d_num, p_micro,
         | CAST(rank AS BIGINT) AS rank,
         | rank <= (SELECT k_star FROM ks) AS rejected
         |FROM r""".stripMargin,
    "q250_kendall_tau" -> {
      val stop = T.EnglishStopwords.map(w => s"'$w'")
        .mkString("[", ",", "]")
      s"""WITH g0 AS (
         | SELECT n_chars AS x0,
         |  CAST(len(list_filter(string_split(text, ' '),
         |     t -> list_contains($stop, t))) * 1000000
         |    // len(string_split(text, ' ')) AS BIGINT) AS y0
         | FROM documents),
         |mx AS (SELECT max(x0) AS xmax FROM g0),
         |b AS (
         | SELECT least(x0 * 10 // (mx.xmax + 1), 9) AS xa,
         |  least(y0 // 100000, 9) AS yb
         | FROM g0 CROSS JOIN mx),
         |grid AS (SELECT xa, yb, CAST(count(*) AS BIGINT) AS n
         |         FROM b GROUP BY 1, 2),
         |cd AS (
         | SELECT
         |  CAST(coalesce(sum(CASE WHEN (a.xa < c.xa AND a.yb < c.yb)
         |     OR (a.xa > c.xa AND a.yb > c.yb)
         |    THEN CAST(a.n AS HUGEINT) * c.n END), 0) AS BIGINT) AS c_pairs,
         |  CAST(coalesce(sum(CASE WHEN (a.xa < c.xa AND a.yb > c.yb)
         |     OR (a.xa > c.xa AND a.yb < c.yb)
         |    THEN CAST(a.n AS HUGEINT) * c.n END), 0) AS BIGINT) AS d_pairs
         | FROM grid a JOIN grid c
         |  ON a.xa < c.xa OR (a.xa = c.xa AND a.yb < c.yb)),
         |m AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM grid),
         |tx AS (SELECT CAST(sum(CAST(mm AS HUGEINT) * mm) AS HUGEINT) AS sq_x
         |       FROM (SELECT sum(n) AS mm FROM grid GROUP BY xa)),
         |ty AS (SELECT CAST(sum(CAST(mm AS HUGEINT) * mm) AS HUGEINT) AS sq_y
         |       FROM (SELECT sum(n) AS mm FROM grid GROUP BY yb))
         |SELECT m.nn AS n, cd.c_pairs, cd.d_pairs,
         | CAST(round(CAST(2 * (cd.c_pairs - cd.d_pairs) AS DOUBLE)
         |  / sqrt(CAST(CAST(m.nn AS HUGEINT) * m.nn - tx.sq_x AS DOUBLE)
         |       * CAST(CAST(m.nn AS HUGEINT) * m.nn - ty.sq_y AS DOUBLE))
         |  * 1000) AS BIGINT) AS tau_b_milli
         |FROM cd CROSS JOIN m CROSS JOIN tx CROSS JOIN ty""".stripMargin
    })
}
