package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational operator surface from SURVEY.md §2, expressed over the driver
  * testdata tables. Each query has a DuckDB oracle in [[Relational.oracles]].
  *
  * Design notes (100 TB mindset):
  *  - filters/projections are declared on the scan so Catalyst pushes them
  *    into the parquet reader (PushedFilters / ReadSchema pruning);
  *  - small dimension tables (region 5, nation 25, supplier ~10/sf) are
  *    explicitly `broadcast()` so the join never shuffles the fact table;
  *  - aggregates use built-in hash aggregation (map-side partial agg free);
  *  - floating-point outputs are rounded so hash-comparison with DuckDB is
  *    stable across accumulation orders (sums of integer-valued doubles are
  *    exact and left unrounded).
  */
object Relational {

  /** Money sums accumulate as integer cents (exact in Long) so results are
    * bit-deterministic across engines AND across Spark partial-agg merge
    * orders — double accumulation would be order-dependent at the rounding
    * boundary. Valid while total cents < 2^53 (plenty at bench scale; at
    * 100 TB the same pattern runs on DecimalType). */
  private def cents(c: org.apache.spark.sql.Column, scale: Double = 100.0) =
    round(c * scale, 0).cast("long")

  /** TPC-H Q1-style pricing summary: multi-aggregate hash agg (SURVEY A4/A5).
    * Ref behavior: Main.scala:65-68 daily sum agg — generalized. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_price"),
        (sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000.0)) / 10000.0)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("cnt"))

  /** Predicate + projection pushdown to parquet (SURVEY P3/S3). */
  def q02FilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** 3-way equi-join + agg (SURVEY J1 generalized): revenue per customer. */
  def q03JoinRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_custkey", "c_name")
      .agg(
        (sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000.0)) / 10000.0)
          .as("revenue"),
        count(lit(1)).as("items"))

  /** Star-schema rollup through two broadcast dims (region ⋈ nation ⋈ customer). */
  def q04RegionCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("customers"),
        (sum(cents(col("c_acctbal"))) / 100.0).as("total_bal"))

  /** Broadcast join of the tiny supplier dim against the lineitem fact. */
  def q05SupplierVolume(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("items"))

  /** Global scalar aggregates (SURVEY A4): min/max/avg/stddev/count/sum. */
  def q06GlobalStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n"),
      min("l_quantity").as("min_q"),
      max("l_quantity").as("max_q"),
      round(avg("l_quantity"), 6).as("avg_q"),
      round(stddev_samp("l_quantity"), 6).as("sd_q"),
      sum("l_quantity").as("sum_q"))

  /** Distinct (SURVEY P6 — `dropDuplicates` on region list, Main.scala:283). */
  def q07DistinctSegments(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_mktsegment").distinct()

  /** Union of two filtered scans (SURVEY O3 — history ∪ today, Main.scala:151).
    * Spark `union` is positional UNION ALL; we use unionByName for safety. */
  def q08Union(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_acctbal")
    c.where(col("c_acctbal") < 0).unionByName(c.where(col("c_acctbal") > 9000))
  }

  /** Cumulative (expanding) moving average — THE reference detrender frame
    * (SURVEY W1, Main.scala:168-171), over the events stream table. */
  def q09CumAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("vc", cents(col("value")))
      .select(col("event_id"), col("event_type"),
        round(sum("vc").over(w) / (lit(100.0) * count(lit(1)).over(w)), 6)
          .as("cum_avg"))
  }

  /** Ranking + lag analytics (engine surface beyond the reference). */
  def q10WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2).as("gap"))
      .where(col("rn") <= 3)
  }

  /** Daily tumbling aggregation — the batch analog of the streaming daily
    * windowed sum (SURVEY A1, Main.scala:62-68). */
  def q11DailyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg((sum(cents(col("value"))) / 100.0).as("total"), count(lit(1)).as("cnt"))

  private def EventTypes = PipelineQueries.EventTypes

  /** Static-vocabulary pivot (SURVEY A2, Main.scala:212-215). Passing the
    * known value list skips Spark's distinct-scan job — the §4 fast path. */
  def q12PivotEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("vc", cents(col("value")))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", EventTypes)
      .agg(sum("vc") / 100.0)
      .na.fill(0.0)

  private def MonthNames = graft.outbreak.Preprocess.MonthNames

  /** Month one-hot without UDF or pivot (SURVEY A3/U1: replaces
    * getMonthStrUdf + pivot.count with codegen-friendly `when` — no extra
    * shuffle, fixed schema). */
  def q13OnehotMonth(s: SparkSession, dir: String): DataFrame = {
    val indicators = MonthNames.zipWithIndex.map { case (m, i) =>
      max(when(month(col("o_orderdate")) === (i + 1), 1L).otherwise(0L))
        .as(s"is_$m")
    }
    Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"), indicators: _*)
  }

  /** Detrend: daily sum → cumulative moving average → ratio with 0/NULL
    * repair to 1.0 (SURVEY W1 + P5, Main.scala:168-195). The guard avoids
    * NaN entirely (Spark 0/0=NaN vs DuckDB 0/0=NULL divergence). */
  def q14Detrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg((sum(cents(col("value"))) / 100.0).as("val"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cma", avg("val").over(w))
      .select(col("day"), col("event_type"),
        round(when(col("cma").isNull || col("cma") === 0.0, 1.0)
          .otherwise(col("val") / col("cma")), 6).as("detrended"))
  }

  /** Null/sentinel repair via when/otherwise (SURVEY P5, Main.scala:193-195). */
  def q15NullRepair(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") === 0.0, 1.0).otherwise(col("l_discount"))
          .as("disc_repaired"))

  /** Total-order sort + limit (SURVEY O1/O2) — top-k with full tiebreak. */
  def q16TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Scalar string functions (SURVEY §2.8: regexp_replace/cast/concat…). */
  def q17StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))

  /** Left-semi join (SURVEY J3 analog): customers having any order. */
  def q18SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** Left-anti join: customers with no order. */
  def q19AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Rollup grouping sets (engine surface; absent in reference per §2.5). */
  def q20Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))

  /** Cube grouping sets (engine surface beyond the reference's rollup). */
  def q43Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))

  /** Set operations: INTERSECT / EXCEPT over customer key sets. */
  def q44SetOps(s: SparkSession, dir: String): DataFrame = {
    val withBal = Tables.customer(s, dir).where(col("c_acctbal") > 0)
      .select(col("c_custkey").as("custkey"))
    val withOrders = Tables.orders(s, dir)
      .select(col("o_custkey").as("custkey")).distinct()
    withBal.intersect(withOrders).withColumn("tag", lit("both"))
      .unionByName(withBal.except(withOrders).withColumn("tag", lit("only_bal")))
  }

  /** Exact interpolated percentiles per group (sort-based — deterministic,
    * no accumulation-order sensitivity). */
  def q45Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_p50"))

  /** Calendar decomposition functions (SURVEY §2.8 date family). */
  def q46DatetimeFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"))

  /** JSON path extraction from the events `props` payload (SURVEY P2 in
    * batch form: parse the JSON string column, not re-parse per field). */
  def q47JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))

  /** Left-outer join preserving customers with zero orders (count(col)
    * skips nulls — the standard outer-join + agg idiom). */
  def q55OuterJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        (sum(cents(coalesce(col("o_totalprice"), lit(0.0)))) / 100.0).as("total_spent"))

  /** The SQL-string interface: the same engine drives `spark.sql` over
    * registered temp views — proof the Spark SQL surface (not just the
    * DataFrame API) works end-to-end. */
  def q56SqlInterface(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
             sum(l_quantity) AS qty
      FROM orders_v JOIN lineitem_v ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderpriority""")
  }

  /** Correlated subquery (Catalyst decorrelates to an aggregate + join):
    * parts priced ≥1.5× their brand's average. The average is computed in
    * integer cents so the comparison is engine-exact. */
  def q58CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("part_v")
    s.sql("""
      SELECT p_partkey, p_brand, p_retailprice
      FROM part_v p
      WHERE CAST(round(p_retailprice * 100.0) AS BIGINT) * 1.0 >= 1.5 * (
        SELECT avg(CAST(round(p2.p_retailprice * 100.0) AS BIGINT))
        FROM part_v p2 WHERE p2.p_brand = p.p_brand)""")
  }

  /** Scalar (uncorrelated) subquery: orders above the global average. */
  def q59ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v2")
    s.sql("""
      SELECT count(*) AS n_above
      FROM orders_v2
      WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) * 1.0 > (
        SELECT avg(CAST(round(o_totalprice * 100.0) AS BIGINT)) FROM orders_v2)""")
  }

  /** RANGE window frame (value-based, vs W1's ROWS frame) + first_value/
    * last_value: running sum over a trailing event_id range. */
  def q60RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy("event_type").orderBy("event_id")
      .rangeBetween(-100L, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("vc", cents(col("value")))
      .select(col("event_id"), col("event_type"),
        (sum("vc").over(frame) / 100.0).as("trailing_sum"),
        first_value(col("event_id")).over(frame).as("frame_start_id"),
        count(lit(1)).over(frame).as("frame_n"))
  }

  /** Dynamic pivot — the reference's actual two-pass call (distinct-values
    * scan then agg; Main.scala:212-215). q12 is the static fast path. */
  def q61PivotDynamic(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("vc", cents(col("value")))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type")
      .agg(sum("vc") / 100.0)
      .na.fill(0.0)

  /** Edit-distance text similarity: candidate pairs come from
    * character-trigram MinHash-LSH bands (4 single-hash bands over the
    * 40-char prefix — strings at small edit distance share most char
    * trigrams), verified with exact Levenshtein ≤ 20. The former
    * coarse-key ((source, lang)) self-join was quadratic in block size;
    * band buckets bound the pair count. Prefix-bounded because
    * Levenshtein is O(n·m) per pair. Oracle replicates the banding. */
  def q62EditDistance(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val d = Tables.documents(s, dir)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("doc_id") +: col("source") +: col("lang") +:
        substring(col("text"), 1, 40).as("prefix") +:
        (0 until 4).map(b =>
          T.charMinhash(substring(col("text"), 1, 40), 3, b).as(s"__b$b")): _*)
      .cache()
    val cand = graft.operators.Dedup.bandedCandidates(
      d, "doc_id", bands = 4, blockCols = Seq("source", "lang"))
    cand
      .join(d.select(col("doc_id").as("__a_id"), col("prefix").as("a_prefix")), "__a_id")
      .join(d.select(col("doc_id").as("__b_id"), col("prefix").as("b_prefix")), "__b_id")
      .select(col("__a_id").as("a_id"), col("__b_id").as("b_id"),
        levenshtein(col("a_prefix"), col("b_prefix")).as("edit_dist"))
      .where(col("edit_dist") <= 20)
  }

  /** The remaining analytic window family in one query: lag/lead offsets,
    * ntile deciles, percent_rank/cume_dist — over the (unique) event_id
    * order so ties can't make ranking nondeterministic. Cents-quantized
    * values keep the offset arithmetic integer-exact across engines. */
  def q69AnalyticFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
    Tables.events(s, dir)
      .withColumn("vc", cents(col("value")))
      .select(col("event_type"), col("event_id"),
        lag("vc", 1).over(w).as("prev_vc"),
        lead("vc", 2).over(w).as("next2_vc"),
        ntile(10).over(w).as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** q184 — CUBE over the corpus catalog dimensions: doc count and
    * char mass at every (source, lang) granularity — per-pair, per-
    * source, per-lang, and the grand total — in ONE scan with one
    * Expand (4 grouping sets), `grouping_id` disambiguating real NULLs
    * from rollup rows. Completes the multi-granularity surface next to
    * q94's explicit GROUPING SETS: CUBE is what a corpus-card
    * dashboard actually asks for. */
  def q184CubeCatalog(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(s, dir)
      .cube("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        grouping_id().as("gid"))

  /** q186 — ranking-window suite over the daily per-type series: one
    * window pass carrying `percent_rank`, `cume_dist`, `ntile(4)` and
    * the full-frame `nth_value(3)` — the analytic-SQL ranking surface
    * (quartiles, empirical CDF positions, fixed-position picks) in one
    * oracle-checked query. Cross-engine exactness: every function here
    * is integer rank arithmetic or a single division of identical
    * integers; the `nth_value` frame is pinned to the whole partition
    * explicitly (engines default that frame differently). Deterministic
    * total order via the (cnt, day) tiebreak. */
  def q186WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.sources.Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val ord = Window.partitionBy("event_type")
      .orderBy(col("cnt").desc, col("d"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily.select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("date"), col("cnt"),
        round(percent_rank().over(ord), 6).as("pct_rank"),
        round(cume_dist().over(ord), 6).as("cdist"),
        ntile(4).over(ord).as("quartile"),
        nth_value(col("cnt"), 3).over(full).as("third_highest"))
  }

  /** q191 — Benford first-digit audit of order totals: the forensic
    * data-quality check (fabricated or unit-mangled monetary columns
    * break Benford's log distribution). The digit comes from the CENTS
    * integer's leading decimal character — pure string/integer
    * arithmetic, no float log10 whose ulps could disagree across
    * engines; expected shares are the usual micro-snapped
    * `ln(1+1/d)/ln 10`. One combinable 9-bucket histogram; everything
    * after runs on the 9-row frame under constant-domain window sums
    * (the q177 discipline). */
  def q191BenfordAudit(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(round(col("o_totalprice") * 100, 0).cast("long")
      .cast("string"), 1, 1).cast("int")
    val hist = graft.sources.Tables.orders(s, dir)
      .where(col("o_totalprice") > 0.0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("total", sum("n").over(wAll))
      .select(col("digit"), col("n"),
        // decimal-widened: n·10⁶ passes Long at 100 TB row counts
        expr("cast(cast(n as decimal(38,0)) * 1000000 div total as bigint)")
          .as("obs_ppm"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)) * 1e6, 0).cast("long").as("benford_ppm"))
      .withColumn("abs_dev_ppm",
        abs(col("obs_ppm") - col("benford_ppm")))
  }

  /** q192 — market-share trend (the TPC-H Q8 shape): per order year,
    * the ppm share of region-0 customers' revenue supplied by nation-0
    * suppliers. Exercises the star join at its widest — fact⋈fact on
    * orderkey (the one real shuffle), every dimension broadcast — with
    * conditional aggregation instead of a second pass. Revenue in
    * integer 10⁻⁴ units (the q01/q03 cents discipline), share one
    * integral division per year. */
  def q192MarketShare(s: SparkSession, dir: String): DataFrame = {
    val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
      10000.0)
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("r_regionkey") === 0L)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(rev).as("total_rev_um"),
        sum(when(col("s_nationkey") === 0L, rev).otherwise(0L))
          .as("nation_rev_um"))
      .select(col("o_year"), col("total_rev_um"), col("nation_rev_um"),
        // decimal-widened: yearly revenue · 10⁶ overflows Long at sf0.1 already
        expr("cast(cast(nation_rev_um as decimal(38,0)) * 1000000 div total_rev_um as bigint)")
          .as("share_ppm"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_benford_audit" -> (q191BenfordAudit _),
    "q192_market_share" -> (q192MarketShare _),
    "q186_window_suite" -> (q186WindowSuite _),
    "q184_cube_catalog" -> (q184CubeCatalog _),
    "q69_analytic_funcs" -> (q69AnalyticFuncs _),
    "q61_pivot_dynamic" -> (q61PivotDynamic _),
    "q62_edit_distance" -> (q62EditDistance _),
    "q58_correlated_subquery" -> (q58CorrelatedSubquery _),
    "q59_scalar_subquery" -> (q59ScalarSubquery _),
    "q60_range_frame" -> (q60RangeFrame _),
    "q55_outer_join" -> (q55OuterJoin _),
    "q56_sql_interface" -> (q56SqlInterface _),
    "q43_cube" -> (q43Cube _),
    "q44_setops" -> (q44SetOps _),
    "q45_percentiles" -> (q45Percentiles _),
    "q46_datetime_funcs" -> (q46DatetimeFuncs _),
    "q47_json_extract" -> (q47JsonExtract _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_pushdown" -> (q02FilterPushdown _),
    "q03_join_revenue" -> (q03JoinRevenue _),
    "q04_region_customers" -> (q04RegionCustomers _),
    "q05_supplier_volume" -> (q05SupplierVolume _),
    "q06_global_stats" -> (q06GlobalStats _),
    "q07_distinct_segments" -> (q07DistinctSegments _),
    "q08_union" -> (q08Union _),
    "q09_cum_avg" -> (q09CumAvg _),
    "q10_window_rank" -> (q10WindowRank _),
    "q11_daily_agg" -> (q11DailyAgg _),
    "q12_pivot_events" -> (q12PivotEvents _),
    "q13_onehot_month" -> (q13OnehotMonth _),
    "q14_detrend" -> (q14Detrend _),
    "q15_null_repair" -> (q15NullRepair _),
    "q16_topk" -> (q16TopK _),
    "q17_string_funcs" -> (q17StringFuncs _),
    "q18_semi_join" -> (q18SemiJoin _),
    "q19_anti_join" -> (q19AntiJoin _),
    "q20_rollup" -> (q20Rollup _),
  )

  val oracles: Map[String, String] = Map(
    "q191_benford_audit" ->
      """WITH h AS (
        | SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM orders WHERE o_totalprice > 0.0 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
        |SELECT digit, n,
        | CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) AS obs_ppm,
        | CAST(round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0, 0)
        |   AS BIGINT) AS benford_ppm,
        | abs(CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) -
        |  CAST(round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0, 0)
        |    AS BIGINT)) AS abs_dev_ppm
        |FROM h CROSS JOIN t""".stripMargin,
    "q192_market_share" ->
      """WITH j AS (
        | SELECT year(o_orderdate) AS o_year, s_nationkey,
        |  CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT) AS rev
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        | WHERE r_regionkey = 0),
        |a AS (
        | SELECT o_year, CAST(sum(rev) AS BIGINT) AS total_rev_um,
        |  CAST(sum(CASE WHEN s_nationkey = 0 THEN rev ELSE 0 END) AS BIGINT)
        |   AS nation_rev_um
        | FROM j GROUP BY 1)
        |SELECT o_year, total_rev_um, nation_rev_um,
        | CAST(CAST(nation_rev_um AS HUGEINT) * 1000000 // total_rev_um AS BIGINT)
        |  AS share_ppm
        |FROM a""".stripMargin,
    "q186_window_suite" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS d,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS date, cnt,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | nth_value(cnt, 3) OVER (PARTITION BY event_type
        |   ORDER BY cnt DESC, d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS third_highest
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY cnt DESC, d)""".stripMargin,
    "q184_cube_catalog" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS n_chars,
        | CAST(grouping(source, lang) AS BIGINT) AS gid
        |FROM documents
        |GROUP BY CUBE (source, lang)""".stripMargin,
    "q69_analytic_funcs" ->
      """SELECT event_type, event_id,
        | lag(CAST(round(value*100.0) AS BIGINT), 1) OVER w AS prev_vc,
        | lead(CAST(round(value*100.0) AS BIGINT), 2) OVER w AS next2_vc,
        | CAST(ntile(10) OVER w AS INTEGER) AS decile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id)""".stripMargin,
    "q61_pivot_dynamic" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | coalesce(CAST(sum(CASE WHEN event_type='click' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS click,
        | coalesce(CAST(sum(CASE WHEN event_type='error' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS error,
        | coalesce(CAST(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS purchase,
        | coalesce(CAST(sum(CASE WHEN event_type='signup' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS signup,
        | coalesce(CAST(sum(CASE WHEN event_type='view' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q62_edit_distance" ->
      """WITH sig AS (
        | SELECT doc_id, source, lang, substr(text, 1, 40) AS prefix,
        |  list_aggregate(list_transform(generate_series(1, greatest(len(substr(text,1,40))-2, 1)),
        |    i -> md5('0|' || substr(substr(text,1,40), i, 3))), 'min') AS b0,
        |  list_aggregate(list_transform(generate_series(1, greatest(len(substr(text,1,40))-2, 1)),
        |    i -> md5('1|' || substr(substr(text,1,40), i, 3))), 'min') AS b1,
        |  list_aggregate(list_transform(generate_series(1, greatest(len(substr(text,1,40))-2, 1)),
        |    i -> md5('2|' || substr(substr(text,1,40), i, 3))), 'min') AS b2,
        |  list_aggregate(list_transform(generate_series(1, greatest(len(substr(text,1,40))-2, 1)),
        |    i -> md5('3|' || substr(substr(text,1,40), i, 3))), 'min') AS b3
        | FROM documents),
        |lanes AS (
        | SELECT 0 AS band, b0 AS bucket, doc_id, source, lang, prefix FROM sig
        | UNION ALL SELECT 1, b1, doc_id, source, lang, prefix FROM sig
        | UNION ALL SELECT 2, b2, doc_id, source, lang, prefix FROM sig
        | UNION ALL SELECT 3, b3, doc_id, source, lang, prefix FROM sig),
        |pairs AS (
        | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |  a.prefix AS a_prefix, b.prefix AS b_prefix
        | FROM lanes a JOIN lanes b
        |  ON a.band = b.band AND a.bucket = b.bucket
        |  AND a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        | CAST(levenshtein(a_prefix, b_prefix) AS INTEGER) AS edit_dist
        |FROM pairs WHERE levenshtein(a_prefix, b_prefix) <= 20""".stripMargin,
    "q58_correlated_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE CAST(round(p_retailprice * 100.0) AS BIGINT) * 1.0 >= 1.5 * (
        |  SELECT avg(CAST(round(p2.p_retailprice * 100.0) AS BIGINT))
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "q59_scalar_subquery" ->
      """SELECT count(*) AS n_above
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) * 1.0 > (
        |  SELECT avg(CAST(round(o_totalprice * 100.0) AS BIGINT)) FROM orders)""".stripMargin,
    "q60_range_frame" ->
      """SELECT event_id, event_type,
        | CAST(sum(CAST(round(value*100.0) AS BIGINT)) OVER w AS BIGINT)/100.0 AS trailing_sum,
        | first_value(event_id) OVER w AS frame_start_id,
        | count(*) OVER w AS frame_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q55_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | CAST(sum(CAST(round(coalesce(o_totalprice, 0.0)*100.0) AS BIGINT)) AS BIGINT)/100.0 AS total_spent
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q56_sql_interface" ->
      """SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        | sum(l_quantity) AS qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,
    "q43_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q44_setops" ->
      """WITH withbal AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0),
        |withorders AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM withbal INTERSECT SELECT custkey FROM withorders)
        |UNION ALL
        |SELECT custkey, 'only_bal' AS tag FROM (SELECT custkey FROM withbal EXCEPT SELECT custkey FROM withorders)""".stripMargin,
    "q45_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
        | round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS p90,
        | round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS price_p50
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q46_datetime_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(quarter(o_orderdate) AS INTEGER) AS q,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders""".stripMargin,
    "q47_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100.0) AS BIGINT)) AS BIGINT)/100.0 AS sum_price,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT)) AS BIGINT)/10000.0 AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity < 10""".stripMargin,
    "q03_join_revenue" ->
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT)) AS BIGINT)/10000.0 AS revenue,
        | count(*) AS items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q04_region_customers" ->
      """SELECT r_name, count(*) AS customers,
        | CAST(sum(CAST(round(c_acctbal*100.0) AS BIGINT)) AS BIGINT)/100.0 AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q05_supplier_volume" ->
      """SELECT s_name, sum(l_quantity) AS qty, count(*) AS items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "q06_global_stats" ->
      """SELECT count(*) AS n, min(l_quantity) AS min_q, max(l_quantity) AS max_q,
        | round(avg(l_quantity),6) AS avg_q, round(stddev_samp(l_quantity),6) AS sd_q,
        | sum(l_quantity) AS sum_q
        |FROM lineitem""".stripMargin,
    "q07_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer",
    "q08_union" ->
      """SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
        |UNION ALL
        |SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000""".stripMargin,
    "q09_cum_avg" ->
      """SELECT event_id, event_type,
        | round(sum(CAST(round(value*100.0) AS BIGINT)) OVER w
        |   / (100.0 * count(*) OVER w), 6) AS cum_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, gap FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS gap
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3""".stripMargin,
    "q11_daily_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        | CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT)/100.0 AS total,
        | count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q12_pivot_events" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | coalesce(CAST(sum(CASE WHEN event_type='click' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS click,
        | coalesce(CAST(sum(CASE WHEN event_type='error' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS error,
        | coalesce(CAST(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS purchase,
        | coalesce(CAST(sum(CASE WHEN event_type='signup' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS signup,
        | coalesce(CAST(sum(CASE WHEN event_type='view' THEN CAST(round(value*100.0) AS BIGINT) END) AS BIGINT)/100.0, 0.0) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q13_onehot_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS cnt,
        | CAST(max(CASE WHEN month(o_orderdate)=1 THEN 1 ELSE 0 END) AS BIGINT) AS is_january,
        | CAST(max(CASE WHEN month(o_orderdate)=2 THEN 1 ELSE 0 END) AS BIGINT) AS is_february,
        | CAST(max(CASE WHEN month(o_orderdate)=3 THEN 1 ELSE 0 END) AS BIGINT) AS is_march,
        | CAST(max(CASE WHEN month(o_orderdate)=4 THEN 1 ELSE 0 END) AS BIGINT) AS is_april,
        | CAST(max(CASE WHEN month(o_orderdate)=5 THEN 1 ELSE 0 END) AS BIGINT) AS is_may,
        | CAST(max(CASE WHEN month(o_orderdate)=6 THEN 1 ELSE 0 END) AS BIGINT) AS is_june,
        | CAST(max(CASE WHEN month(o_orderdate)=7 THEN 1 ELSE 0 END) AS BIGINT) AS is_july,
        | CAST(max(CASE WHEN month(o_orderdate)=8 THEN 1 ELSE 0 END) AS BIGINT) AS is_august,
        | CAST(max(CASE WHEN month(o_orderdate)=9 THEN 1 ELSE 0 END) AS BIGINT) AS is_september,
        | CAST(max(CASE WHEN month(o_orderdate)=10 THEN 1 ELSE 0 END) AS BIGINT) AS is_october,
        | CAST(max(CASE WHEN month(o_orderdate)=11 THEN 1 ELSE 0 END) AS BIGINT) AS is_november,
        | CAST(max(CASE WHEN month(o_orderdate)=12 THEN 1 ELSE 0 END) AS BIGINT) AS is_december
        |FROM orders GROUP BY 1""".stripMargin,
    "q14_detrend" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |   CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT)/100.0 AS val
        |  FROM events GROUP BY 1, 2
        |), d2 AS (
        |  SELECT day, event_type, val,
        |   avg(val) OVER (PARTITION BY event_type ORDER BY day
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cma
        |  FROM daily)
        |SELECT day, event_type,
        | round(CASE WHEN cma IS NULL OR cma = 0 THEN 1.0 ELSE val/cma END, 6)
        |   AS detrended
        |FROM d2""".stripMargin,
    "q15_null_repair" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_discount = 0 THEN 1.0 ELSE l_discount END AS disc_repaired
        |FROM lineitem""".stripMargin,
    "q16_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q17_string_funcs" ->
      """SELECT p_partkey, regexp_replace(p_type, ' ', '_', 'g') AS type_u,
        | upper(p_brand) AS brand_u, CAST(length(p_name) AS INTEGER) AS name_len,
        | p_brand || ':' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q18_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q19_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q20_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
  )
}
