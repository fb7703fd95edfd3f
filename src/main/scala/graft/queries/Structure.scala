package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps

/** Structural-statistics queries over the behavioral graph and the text
  * corpus: HITS centrality, frequent itemsets beyond pairs, degree
  * assortativity, term burstiness, Gini concentration, and the paired
  * McNemar test. All integer-exact (the micro-unit discipline), all
  * DuckDB-oracled.
  */
object Structure {

  private def wide(c: Column): Column = c.cast("decimal(38,0)")

  // ---------------------------------------------------------------- q252

  /** HITS iterations run (full hub→authority alternations). */
  val HitsIters = 2

  /** q252 — HITS (Kleinberg) hubs-and-authorities on the user ↔
    * event-type bipartite engagement graph, [[HitsIters]] full
    * alternations from a uniform hub start: authority(type) =
    * Σ_users hub·w, hub(user) = Σ_types auth·w, w = events observed on
    * the edge, each side re-normalized to max = 10⁶ micro-units with
    * integral division so both engines walk the identical integer
    * lattice (rand-free, order-free: every step is a sum of integer
    * products). The bipartite read-out ranks event types by how much
    * engagement flows through them from broadly-engaged users — the
    * eigenvector complement to q103's PageRank (which ranks by
    * transition structure, not co-engagement mass).
    *
    * Scale shape: the edge list collapses to one (user, type, count)
    * aggregate up front (map-side combinable); each half-step is one
    * hash join edge⋈scores + one groupBy — with |types| tiny the
    * score table broadcasts; the max-normalizer is a broadcast scalar.
    * Rounds are fixed (no convergence loop), so the lineage is a
    * constant-depth DAG. */
  def q252Hits(s: SparkSession, dir: String): DataFrame = {
    val w = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .persist()
    // Lineage cut per half-step (the Mst/PageRank discipline): each
    // normalize embeds its input TWICE (scores + the max scalar), so an
    // uncut 2·iters+1-deep chain re-expands exponentially. An eager
    // localCheckpoint keeps every step a one-join plan over cached
    // parents in ONE job (persist + count was two: the broadcast build
    // of a freshly persisted score table also re-enters codegen per
    // cache incarnation — the q48 lesson); the per-USER hub table stays
    // distributed throughout.
    val cached = List(w)
    def step(raw: DataFrame): DataFrame = normalize(raw).cut()
    // hub0 = 1e6 for every user: the first authority pass is just the
    // weighted degree Σ 1e6·c
    var auth = step(
      w.groupBy("event_type").agg(sum(wide(lit(1000000L) * col("c"))).as("r")))
    (1 to HitsIters).foreach { _ =>
      val hub = step(
        w.join(broadcast(auth), "event_type")
          .groupBy("user_id").agg(sum(wide(col("s") * col("c"))).as("r")))
      auth = step(
        w.join(hub, "user_id")
          .groupBy("event_type").agg(sum(wide(col("s") * col("c"))).as("r")))
    }
    // one row per event type — bounded by construction
    graft.operators.SmallResult.materialize(
      auth.select(col("event_type"), col("s").as("auth_ppm")), cached: _*)
  }

  /** Scores scaled so the max is exactly 10⁶ (integral div — identical
    * truncation in DuckDB). Keyed frame (key, r) → (key, s). */
  private def normalize(raw: DataFrame): DataFrame = {
    val key = raw.columns.head
    val m = raw.agg(max(col("r")).as("m"))
    raw.crossJoin(broadcast(m))
      .select(col(key), expr("cast(r * 1000000 div m as bigint)").as("s"))
  }

  // ---------------------------------------------------------------- q253

  /** q253 — frequent TRIPLES of event types over (user, day) baskets —
    * Apriori level 3, one level above q156's pairs: which three
    * behaviors co-occur in one user-day, with exact support and a ppm
    * support rate against the basket universe. Rule-mining features
    * and the bundle signal recommenders start from.
    *
    * Scale shape: the corpus collapses to distinct (user, day, type)
    * basket items first (one aggregate; baskets ≤ |types| wide), then
    * two self-joins keyed on the basket id with the `a<b<c` total
    * order emitting each triple once — fan-out is baskets ·
    * C(width, 3) with width ≤ |types|, never corpus². The basket
    * count for the rate is one scalar broadcast. */
  def q253FrequentTriples(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
      .cache()
    val n = b.select(col("user_id"), col("d")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val t1 = b.select(col("user_id"), col("d"), col("event_type").as("ta"))
    val t2 = b.select(col("user_id"), col("d"), col("event_type").as("tb"))
    val t3 = b.select(col("user_id"), col("d"), col("event_type").as("tc"))
    val triples = t1.join(t2, Seq("user_id", "d")).where(col("ta") < col("tb"))
      .join(t3, Seq("user_id", "d")).where(col("tb") < col("tc"))
      .groupBy("ta", "tb", "tc").agg(count(lit(1)).as("support"))
    // ≤ C(|types|, 3) rows — bounded; frees b's cache (referenced four
    // times in the plan) on the way out
    graft.operators.SmallResult.materialize(
      triples.crossJoin(broadcast(n))
        .select(col("ta"), col("tb"), col("tc"), col("support"),
          expr("cast(support * 1000000 div n_baskets as bigint)")
            .as("support_ppm")),
      b)
  }

  // ---------------------------------------------------------------- q254

  /** q254 — degree assortativity of the mutual-kNN similarity graph
    * (q179's edge set): the Pearson correlation of endpoint degrees
    * over edge stubs — positive means well-connected vectors link to
    * each other (core-periphery embedding space), negative means hubs
    * link to tails. THE one-number structure read-out clustering
    * pipelines check before trusting community output (LPA on a
    * disassortative graph shreds).
    *
    * Exactness: degrees are integers, and with BOTH stub orientations
    * summed the x and y marginals are identical — so the Pearson
    * denominator's two variances coincide and the sqrt cancels:
    * r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²), a ratio of exact integers
    * emitted in ppm by one integral division. No float anywhere.
    *
    * Scale shape: rides q179's linear-in-graph edge set; degrees are
    * one groupBy over stubs; the edge⋈degree joins key on node ids.
    * The sufficient statistics are one scalar aggregate. */
  def q254Assortativity(s: SparkSession, dir: String): DataFrame =
    assortativityOn(GraphEval.q179MutualKnn(s, dir)
      .select(col("vec_id").as("a"), col("neighbor_id").as("b")))

  /** [[q254Assortativity]] over any undirected (a, b) edge frame. */
  def assortativityOn(edges0: DataFrame): DataFrame = {
    val edges = edges0.cache()
    val stubs = edges.select(col("a").as("x"), col("b").as("y"))
      .unionByName(edges.select(col("b").as("x"), col("a").as("y")))
    val deg = stubs.groupBy(col("x").as("node"))
      .agg(count(lit(1)).as("deg"))
    val pairs = stubs
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), "y")
    // one row — bounded; frees the edge cache (referenced by both stub
    // orientations and the degree table) on the way out. A REGULAR
    // graph has zero degree variance — assortativity is undefined
    // there, read out as an explicit null (not an ANSI divide error).
    graft.operators.SmallResult.materialize(
      pairs.agg(count(lit(1)).as("m"),
          sum(wide(col("dx"))).as("sx"),
          sum(wide(col("dx")) * col("dx")).as("sxx"),
          sum(wide(col("dx")) * col("dy")).as("sxy"))
        .select(col("m"),
          when(expr("m * sxx - sx * sx") === 0, lit(null))
            .otherwise(expr("""cast((m * sxy - sx * sx) * 1000000
                 | div (m * sxx - sx * sx) as bigint)""".stripMargin))
            .cast("long").as("assortativity_ppm")),
      edges)
  }

  // ---------------------------------------------------------------- q255

  /** Terms profiled by [[q255TermBurstiness]]. */
  val BurstTopTerms = 10

  /** q255 — burstiness (Fano factor: variance-to-mean of the per-doc
    * count, zeros included) of the corpus's [[BurstTopTerms]] heaviest
    * terms. Content words clump (F ≫ 1), function words spread (F ≈ 1
    * under Poisson) — the Church/Gale signal behind stopword
    * induction, keyword scoring, and quality heuristics that n-gram
    * frequency alone misses. Integer-exact: F_ppm = (n·Σc² − (Σc)²)
    * ·10⁶ div (n·Σc) over exact integer count sums — absent docs
    * contribute exact zeros via n, never a scan.
    *
    * Scale shape: one explode → two-level aggregate (term totals are
    * map-side combinable); the top-terms cut is a tiny sorted limit;
    * the final statistics touch only the kept terms' rows. */
  def q255TermBurstiness(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).where(col("text").isNotNull)
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val stats = counts.groupBy("term")
      .agg(sum(wide(col("c"))).as("sc"),
        sum(wide(col("c")) * col("c")).as("scc"),
        count(lit(1)).as("df_docs"))
    val top = stats
      .orderBy(col("sc").desc, col("term")).limit(BurstTopTerms)
    top.crossJoin(broadcast(nDocs))
      .select(col("term"), expr("cast(sc as bigint)").as("total"),
        col("df_docs"),
        expr("cast((n * scc - sc * sc) * 1000000 div (n * sc) as bigint)")
          .as("fano_ppm"))
  }

  // ---------------------------------------------------------------- q256

  /** q256 — Gini coefficient of document length per source, exactly,
    * from the rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    * the ascending length order (ties rank-broken by doc_id — the
    * tied-group term Σ i·x is invariant under any within-tie order, so
    * the read-out is still canonical). One number per source for "is
    * this feed a few mega-documents plus dust" — the inequality
    * companion to q66's histogram and q173's top-k concentration.
    *
    * Scale shape: one per-source window rank (the sort a Gini needs is
    * irreducible, but it shards per source) + one grouped aggregate of
    * integer products. */
  def q256GiniLength(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("i", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(wide(col("n_chars"))).as("sx"),
        sum(wide(col("i")) * col("n_chars")).as("six"))
      .select(col("source"), col("n_docs"),
        expr("""cast((2 * six - (n_docs + 1) * sx) * 1000000
               | div (cast(n_docs as decimal(38,0)) * sx) as bigint)"""
          .stripMargin).as("gini_ppm"))
  }

  // ---------------------------------------------------------------- q257

  /** Char cut for [[q257Mcnemar]]'s rule A. */
  val McnemarChars = 500L
  /** Token cut for [[q257Mcnemar]]'s rule B. */
  val McnemarTokens = 80

  /** q257 — McNemar's paired test between two short-document detectors
    * (rule A: n_chars < [[McnemarChars]]; rule B: < [[McnemarTokens]]
    * whitespace tokens) on the SAME documents: χ² = (b−c)²/(b+c) over
    * the discordant cells only. The correct significance test when two
    * classifiers/rules score one corpus — the two-proportion tests
    * (q251's intervals, q92's independence χ²) are wrong under pairing,
    * which is exactly the trap this query exists to close. Integer-
    * exact: b and c are counts, χ²_ppm one integral division.
    *
    * Scale shape: one narrow projection (two boolean flags per doc) +
    * one scalar aggregate — map-side combinable, no shuffle beyond the
    * final 4-cell reduce. */
  def q257Mcnemar(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).where(col("text").isNotNull)
      .select((col("n_chars") < McnemarChars).as("fa"),
        (size(split(col("text"), " ")) < McnemarTokens).as("fb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("b"), col("c"),
        // zero discordant pairs = no evidence either way: an explicit
        // NULL in BOTH engines (Spark's `div` by 0 would NULL silently
        // while DuckDB's `//` ERRORS — the guard keeps them agreeing)
        expr("""case when b + c = 0 then null else
               | cast((b - c) * (b - c) * 1000000
               |  div (b + c) as bigint) end""".stripMargin).as("chi2_ppm"))

  // ---------------------------------------------------------------- q258

  /** q258 — Spearman's ρ between the two per-doc quality signals q250's
    * Kendall τ compares (length in chars vs whitespace token count):
    * the rank-correlation read-out most eval suites quote. Tie-aware
    * via exact integer DOUBLE-midranks (2·avgrank = 2·cum_below + cnt +
    * 1, computed on the value HISTOGRAM — never a corpus-wide
    * row_number), then Pearson on the rank pairs from integer
    * sufficient statistics with the q87 final-division discipline (the
    * only floats are two sqrt and one divide over exact integers —
    * identical bits cross-engine).
    *
    * Scale shape: two histograms ([[graft.operators.DistCumSum]]
    * two-level cumulative — no single-partition window even for wide
    * value alphabets), two hash joins mapping value → double-rank, one
    * scalar aggregate. */
  def q258Spearman(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).where(col("text").isNotNull)
      .select(col("n_chars").as("v1"),
        size(split(col("text"), " ")).cast("long").as("v2"))
    def rankMap(vCol: String): DataFrame = {
      val hist = base.groupBy(vCol).agg(count(lit(1)).as("c"))
      graft.operators.DistCumSum.overDomain(hist, vCol, "c", "f")
        .select(col(vCol), (lit(2L) * col("f") - col("c") + 1L).as(s"dr_$vCol"))
    }
    val ranked = base.join(rankMap("v1"), "v1").join(rankMap("v2"), "v2")
      .select(col("dr_v1").as("x"), col("dr_v2").as("y"))
    val agg = ranked.agg(count(lit(1)).as("n"),
      sum(wide(col("x"))).as("sx"), sum(wide(col("y"))).as("sy"),
      sum(wide(col("x")) * col("x")).as("sxx"),
      sum(wide(col("y")) * col("y")).as("syy"),
      sum(wide(col("x")) * col("y")).as("sxy"))
    agg.select(col("n"),
      round(expr("cast(n * sxy - sx * sy as double)").cast("double") /
        (sqrt(expr("cast(n * sxx - sx * sx as double)")) *
          sqrt(expr("cast(n * syy - sy * sy as double)"))), 6)
        .as("spearman_rho"))
  }

  // ---------------------------------------------------------------- q260

  /** q260 — Cramér's V for the q92 contingency (event type × day of
    * week): the EFFECT SIZE its χ² deliberately does not give —
    * χ² grows with n, so at corpus scale everything is "significant"
    * and V = sqrt(χ²/(n·(min(r,c)−1))) ∈ [0,1] is the number that says
    * whether the association matters. Same micro-quantized cell terms
    * as q92 (bit-stable under any merge order), one float sqrt at the
    * end, rounded identically in both engines.
    *
    * Scale shape: q92's — one combinable count to a |types|×7 table,
    * broadcast margins, scalar aggregate. */
  def q260CramersV(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .select(col("event_type"), dayofweek(to_date(col("ts"))).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("event_type").agg(sum("o").as("r"))
    val ct = obs.groupBy("dow").agg(sum("o").as("c"))
    val nn = obs.agg(sum("o").as("n"))
    val d = (col("o") * col("n") - col("r") * col("c")).cast("double")
    val term = d * d /
      (col("n").cast("double") * col("r").cast("double") * col("c").cast("double"))
    val dims = rt.agg(count(lit(1)).as("nr"))
      .crossJoin(ct.agg(count(lit(1)).as("nc")))
    obs.join(broadcast(rt), "event_type")
      .join(broadcast(ct), "dow").crossJoin(broadcast(nn))
      .agg(first(col("n")).as("n"),
        (sum(round(term * 1000000.0, 0).cast("long")) / 1000000.0).as("__chi2"))
      .crossJoin(broadcast(dims))
      .select(col("n"),
        ((least(col("nr"), col("nc")) - 1)).as("dof_min"),
        round(sqrt(col("__chi2") /
          (col("n").cast("double") * (least(col("nr"), col("nc")) - 1)
            .cast("double"))), 6).as("cramers_v"))
  }

  // ---------------------------------------------------------------- q263

  /** Growth-curve checkpoints (corpus deciles) for [[q263HeapsFit]]. */
  val HeapsCheckpoints = 10

  /** q263 — Heaps'-law fit of vocabulary growth: V(N) ≈ k·N^β over
    * [[HeapsCheckpoints]] corpus-prefix checkpoints (docs in doc_id
    * order), OLS of micro-nat ln V on ln N — the companion single-
    * number to q229's Zipf slope. Natural text sits near β ≈ 0.5;
    * β → 0 means the vocabulary saturated (template/boilerplate
    * corpus), β → 1 means near-disjoint shards glued together. The
    * after-vs-before β is the cheap "did the filter stage change the
    * LANGUAGE" check.
    *
    * Determinism: the prefix rank comes from the doc-id histogram via
    * [[graft.operators.DistCumSum]] (exact, no corpus-wide window);
    * first-seen ranks and checkpoint counts are exact integers; both
    * engines snap the same integer-derived lns to micro-nats (q229
    * discipline) and the OLS is integer math from there.
    *
    * Scale shape: one rank join + one min-aggregate per token (both
    * map-side combinable); the checkpoint spine is 10 broadcast rows;
    * the vocab-side membership count is one conditional aggregate. */
  def q263HeapsFit(s: SparkSession, dir: String): DataFrame =
    q263HeapsFitOn(Tables.documents(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("text")))

  /** [[q263HeapsFit]] over any (doc_id, text) frame. */
  def q263HeapsFitOn(docs: DataFrame): DataFrame = {
    val rk = graft.operators.DistCumSum.overDomain(
      docs.select(col("doc_id")).withColumn("c", lit(1L)), "doc_id", "c", "r")
      .select(col("doc_id"), col("r"))
    val n = docs.agg(count(lit(1)).as("n"))
    val firstSeen = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(rk, "doc_id")
      .groupBy("term").agg(min(col("r")).as("fr"))
    val spine = n.select(
        explode(typedLit((1 to HeapsCheckpoints).toList)).as("k"), col("n"))
      .select(col("k"), expr("n * k div 10").as("nk"))
    val points = firstSeen.crossJoin(broadcast(spine))
      .groupBy("k", "nk")
      .agg(sum(when(col("fr") <= col("nk"), 1L).otherwise(0L)).as("vk"))
      .where(col("vk") > 0)
    points
      .select(expr("cast(round(ln(nk) * 1000000) as bigint)").as("x"),
        expr("cast(round(ln(vk) * 1000000) as bigint)").as("y"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .withColumn("beta_micro",
        expr("""cast((n_points * sxy - sx * sy) * 1000000
               | div (n_points * sxx - sx * sx) as bigint)""".stripMargin))
      .select(col("n_points"), col("beta_micro"),
        expr("""cast((sy - cast(beta_micro as decimal(38,0)) * sx div 1000000)
               | div n_points as bigint)""".stripMargin).as("lnk_micro"))
  }

  // ---------------------------------------------------------------- q264

  /** q264 — odds ratio of the "short document" condition between the
    * q217 source pair, with the Woolf 95% CI: the 2×2 effect read-out
    * (how many TIMES more likely is a short doc in source A) that q92's
    * independence χ² and q251's per-arm intervals do not give. Cells
    * are exact integer counts; OR_ppm is one integral division;
    * the CI bounds exponentiate ln OR ± 1.96·√(1/a+1/b+1/c+1/d) — the
    * identical integer-derived IEEE doubles in both engines, rounded
    * to 4 dp (the q251 discipline).
    *
    * Scale shape: one conditional scalar aggregate over the pair's
    * docs — map-side combinable, nothing else. */
  def q264OddsRatio(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pair = docs.select(col("source")).distinct()
      .orderBy("source").limit(2)
      .agg(min("source").as("s1"), max("source").as("s2"))
    docs.where(col("text").isNotNull).crossJoin(broadcast(pair))
      .where(col("source") === col("s1") || col("source") === col("s2"))
      .agg(first("s1").as("src_a"), first("s2").as("src_b"),
        sum(when(col("source") === col("s1") &&
          col("n_chars") < McnemarChars, 1L).otherwise(0L)).as("a"),
        sum(when(col("source") === col("s1") &&
          col("n_chars") >= McnemarChars, 1L).otherwise(0L)).as("b"),
        sum(when(col("source") === col("s2") &&
          col("n_chars") < McnemarChars, 1L).otherwise(0L)).as("c"),
        sum(when(col("source") === col("s2") &&
          col("n_chars") >= McnemarChars, 1L).otherwise(0L)).as("d"))
      .select(col("src_a"), col("src_b"), col("a"), col("b"), col("c"),
        col("d"),
        // an empty off-diagonal cell makes the OR undefined: explicit
        // NULL in BOTH engines (Spark `div` by 0 NULLs, DuckDB `//`
        // errors — the guard keeps a degenerate corpus agreeing)
        expr("""case when b = 0 or c = 0 then null else
               | cast(cast(a as decimal(38,0)) * d * 1000000
               |  div (cast(b as decimal(38,0)) * c) as bigint) end"""
          .stripMargin).as("or_ppm"),
        round(exp(log(col("a").cast("double") * col("d") /
            (col("b").cast("double") * col("c"))) -
          lit(1.96) * sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
            lit(1.0) / col("c") + lit(1.0) / col("d"))), 4).as("or_lo"),
        round(exp(log(col("a").cast("double") * col("d") /
            (col("b").cast("double") * col("c"))) +
          lit(1.96) * sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
            lit(1.0) / col("c") + lit(1.0) / col("d"))), 4).as("or_hi"))
  }

  // ---------------------------------------------------------------- q265

  /** q265 — empirical entropy rate of the per-user event-type Markov
    * chain (q88's bigrams): H = Σ_i (cᵢ·/C)·Hᵢ in exact micro-nats —
    * per cell the term cᵢⱼ·(ln cᵢ· − ln cᵢⱼ) is integer micro-nat
    * math (the q104/q147 discipline), summed exactly, one final div
    * by the bigram total. The one-number "how predictable is behavior"
    * read-out: H = 0 is deterministic routing, ln|types| is uniform
    * chaos — the sequence-level companion to q145's static column
    * entropy and the sanity bound for q214's predictor accuracy.
    *
    * Scale shape: q88's window pass (one user_id shuffle) into a
    * |types|²-row bigram table; everything after runs on that bounded
    * spine. */
  def q265EntropyRate(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val bigrams = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("event_type", 1).over(byUser))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type")).agg(count(lit(1)).as("cij"))
    def microLn(name: String): Column =
      expr(s"cast(round(ln($name) * 1000000) as bigint)")
    val rows = bigrams.groupBy("prev").agg(sum("cij").as("ci"))
    bigrams.join(broadcast(rows), "prev")
      .agg(count(lit(1)).as("n_cells"),
        count_distinct(col("prev")).as("n_states"),
        sum(col("cij")).as("n_bigrams"),
        sum(col("cij") * (microLn("ci") - microLn("cij")))
          .as("__h_num"))
      .select(col("n_states"), col("n_cells"), col("n_bigrams"),
        expr("cast(__h_num div n_bigrams as bigint)")
          .as("entropy_rate_micro"))
  }

  // ---------------------------------------------------------------- q266

  /** Grid cell edge (milli-degrees) for [[q266GridColocation]]. */
  val GridCellMdeg = 1000L
  /** Chebyshev co-location threshold (milli-degrees). */
  val GridDistMdeg = 500L

  /** q266 — spatial co-location via GRID-CELL blocking: users get
    * deterministic synthetic coordinates (the q216 md5 draw — the
    * events table carries no geo columns, so the fixture is the
    * hash; the OPERATOR is the point), land in [[GridCellMdeg]]-wide
    * cells, and each point probes its 3×3 cell neighborhood for
    * partners within [[GridDistMdeg]] Chebyshev distance. This is the
    * spatial sibling of the q83 bin range join and the LSH band join:
    * candidates come from an EQUI-join on cell keys (cell width ≥
    * threshold guarantees no pair is missed beyond the 9 probes), so
    * an all-pairs distance join never exists.
    *
    * Scale shape: one distinct + projection per point, a 9× probe
    * fan-out, one hash join on the cell key, exact filter on the
    * candidate sliver, scalar aggregate. Dense cells are the skew
    * axis — at real scale pre-split hot cells (the salted-join
    * pattern) exactly as dense LSH buckets. */
  def q266GridColocation(s: SparkSession, dir: String): DataFrame = {
    val pts = gridPoints(s, dir).cache()
    graft.operators.SmallResult.materialize(
      pts.agg(count(lit(1)).as("n_points"),
          count_distinct(struct(col("cx"), col("cy"))).as("n_cells"))
        .crossJoin(broadcast(
          gridPairsOn(pts).agg(count(lit(1)).as("n_pairs")))),
      pts)
  }

  /** The deterministic synthetic point cloud of q266: one (lat, lon)
    * draw per distinct user via the engine-wide md5 bucket primitive,
    * plus the [[GridCellMdeg]] cell keys. The events table carries no
    * geo columns, so the FIXTURE is the hash — the operators are the
    * point. (Robust's q269 DBSCAN labeling draws the same way over a
    * denser metro-scale range.) */
  def gridPoints(s: SparkSession, dir: String): DataFrame = {
    val T = graft.functions.TextFunctions
    Tables.events(s, dir).select(col("user_id")).distinct()
      .select(col("user_id"),
        T.hashMod("lat:", col("user_id"), 180000).as("lat"),
        T.hashMod("lon:", col("user_id"), 360000).as("lon"))
      .withColumn("cx", expr(s"lat div $GridCellMdeg"))
      .withColumn("cy", expr(s"lon div $GridCellMdeg"))
  }

  /** The 3x3-probe candidate join of [[q266GridColocation]] over any
    * (user_id, lat, lon, cx, cy) point frame -- exposed for the spec.
    * Output (ua, ub), a < b, distinct, exactly the Chebyshev-close
    * pairs. */
  def gridPairsOn(pts: DataFrame): DataFrame = {
    val offs = Seq(-1L, 0L, 1L)
    val probes = pts.select(col("user_id").as("ua"), col("lat").as("la"),
        col("lon").as("oa"), explode(typedLit(
          (for (dx <- offs; dy <- offs) yield (dx, dy)).toList)).as("d"),
        col("cx"), col("cy"))
      .select(col("ua"), col("la"), col("oa"),
        (col("cx") + col("d._1")).as("cx"), (col("cy") + col("d._2")).as("cy"))
    val pairs = probes.join(
        pts.select(col("user_id").as("ub"), col("lat").as("lb"),
          col("lon").as("ob"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .where(col("ua") < col("ub") &&
        abs(col("la") - col("lb")) <= GridDistMdeg &&
        abs(col("oa") - col("ob")) <= GridDistMdeg)
      .select("ua", "ub").distinct()
    pairs
  }

  // ---------------------------------------------------------------- q267

  /** Step window (days) for [[q267OrderedFunnel]]. */
  val FunnelWindowDays = 7L

  /** q267 — time-constrained ORDERED funnel: first view → first click
    * within [[FunnelWindowDays]] days OF THAT VIEW → first purchase
    * within the window of THAT click, per user. q72's set-membership
    * funnel overcounts (a purchase before the view still counts);
    * product analytics wants the ordered, windowed chain, which is
    * exactly two windowed semi-lookups off the per-user anchors. All
    * times are exact integer microseconds.
    *
    * Scale shape: three conditional min-aggregates keyed on user_id —
    * the two follow-up steps join the (user, anchor) frame back to the
    * events ON user_id (AQE-coalesced hash joins), never a cross or a
    * corpus window. */
  def q267OrderedFunnel(s: SparkSession, dir: String): DataFrame =
    orderedFunnelOn(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** [[q267OrderedFunnel]] over any (user_id, event_type, us) frame. */
  def orderedFunnelOn(ev: DataFrame): DataFrame = {
    val winUs = FunnelWindowDays * 86400L * 1000000L
    val t1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val t2 = ev.where(col("event_type") === "click").join(t1, "user_id")
      .where(col("us") > col("t1") && col("us") <= col("t1") + winUs)
      .groupBy("user_id").agg(min("us").as("t2"))
    val t3 = ev.where(col("event_type") === "purchase").join(t2, "user_id")
      .where(col("us") > col("t2") && col("us") <= col("t2") + winUs)
      .groupBy("user_id").agg(min("us").as("t3"))
    val n = ev.select("user_id").distinct().agg(count(lit(1)).as("n_users"))
    n.crossJoin(broadcast(t1.agg(count(lit(1)).as("n_view"))))
      .crossJoin(broadcast(t2.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(t3.agg(count(lit(1)).as("n_purchase"))))
      .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
        expr("""cast(cast(n_purchase as decimal(38,0)) * 1000000
               | div n_view as bigint)""".stripMargin).as("conv_ppm"))
  }

  // ---------------------------------------------------------------- q268

  /** q268 — exact interval-union coverage (gaps-and-islands): each
    * event opens an interval of `round(value)` seconds (≥1); per user,
    * overlapping intervals merge into islands via the running-max-end
    * rule (island boundary where start > max end so far — one
    * partitioned window pass, the canonical distributed form), and
    * coverage sums island extents. The merge q71's gap-sessionizer
    * never needs (its intervals are disjoint by construction) and
    * double-counting Σ durations gets wrong whenever intervals
    * overlap — utilization, SLA uptime, effective watch time.
    *
    * Scale shape: two windows + one aggregate, all partitioned by
    * user_id over the same exchange; islands never leave their
    * partition. */
  def q268IntervalCoverage(s: SparkSession, dir: String): DataFrame =
    intervalCoverageOn(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("st"),
        greatest(lit(1L), expr("cast(round(value) as bigint)")).as("dur")))

  /** [[q268IntervalCoverage]] over any (user_id, event_id, st, dur)
    * interval frame. */
  def intervalCoverageOn(iv: DataFrame): DataFrame = {
    val ev = iv.withColumn("en", col("st") + col("dur"))
    val ord = Window.partitionBy("user_id").orderBy("st", "event_id")
    val withIsland = ev
      .withColumn("prev_max_en",
        max("en").over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum("new_island").over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    withIsland.groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_iv"), min("st").as("s0"), max("en").as("e1"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("e1") - col("s0")).as("coverage_s"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q266_grid_colocation" -> (q266GridColocation _),
    "q267_ordered_funnel" -> (q267OrderedFunnel _),
    "q268_interval_coverage" -> (q268IntervalCoverage _),
    "q258_spearman" -> (q258Spearman _),
    "q260_cramers_v" -> (q260CramersV _),
    "q263_heaps_fit" -> (q263HeapsFit _),
    "q264_odds_ratio" -> (q264OddsRatio _),
    "q265_entropy_rate" -> (q265EntropyRate _),
    "q252_hits" -> (q252Hits _),
    "q253_frequent_triples" -> (q253FrequentTriples _),
    "q254_assortativity" -> (q254Assortativity _),
    "q255_term_burstiness" -> (q255TermBurstiness _),
    "q256_gini_length" -> (q256GiniLength _),
    "q257_mcnemar" -> (q257Mcnemar _))

  val oracles: Map[String, String] = Map(
    "q266_grid_colocation" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        |p AS (
        | SELECT user_id,
        |  ('0x' || substr(md5('lat:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 180000 AS lat,
        |  ('0x' || substr(md5('lon:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 360000 AS lon
        | FROM u),
        |c AS (SELECT *, lat // $GridCellMdeg AS cx, lon // $GridCellMdeg AS cy
        |      FROM p),
        |pairs AS (
        | SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
        | FROM c a JOIN c b ON a.user_id < b.user_id
        |  AND abs(a.lat - b.lat) <= $GridDistMdeg
        |  AND abs(a.lon - b.lon) <= $GridDistMdeg)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_points,
        | (SELECT CAST(count(DISTINCT (cx, cy)) AS BIGINT) FROM c) AS n_cells,
        | (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs""".stripMargin,
    "q267_ordered_funnel" -> {
      val winUs = FunnelWindowDays * 86400L * 1000000L
      s"""WITH ev AS (
        | SELECT user_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(us) AS t2
        |       FROM ev e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 AND us <= t1 + $winUs
        |       GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(us) AS t3
        |       FROM ev e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + $winUs
        |       GROUP BY 1),
        |n AS (
        | SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_view,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_click,
        |  (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_purchase
        | FROM ev)
        |SELECT n_users, n_view, n_click, n_purchase,
        | CAST(CAST(n_purchase AS HUGEINT) * 1000000 // n_view AS BIGINT)
        |  AS conv_ppm
        |FROM n""".stripMargin
    },
    "q268_interval_coverage" ->
      """WITH iv AS (
        | SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS st,
        |  greatest(1, CAST(round(value) AS BIGINT)) AS dur
        | FROM events),
        |w AS (SELECT user_id, event_id, st, st + dur AS en FROM iv),
        |m AS (
        | SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        | FROM w),
        |isl AS (
        | SELECT *, sum(CASE WHEN pme IS NULL OR st > pme THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY st, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM m),
        |g AS (
        | SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_iv,
        |  min(st) AS s0, max(en) AS e1
        | FROM isl GROUP BY 1, 2)
        |SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        | CAST(count(*) AS BIGINT) AS n_islands,
        | CAST(sum(e1 - s0) AS BIGINT) AS coverage_s
        |FROM g""".stripMargin,
    "q263_heaps_fit" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |rk AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r FROM d),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |fr AS (
        | SELECT t.term, min(rk.r) AS fr
        | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d) t
        |  JOIN rk USING (doc_id)
        | GROUP BY 1),
        |spine AS (
        | SELECT CAST(k AS BIGINT) AS k,
        |  (SELECT n FROM n) * CAST(k AS BIGINT) // 10 AS nk
        | FROM range(1, 11) t(k)),
        |points AS (
        | SELECT s.k, s.nk,
        |  CAST(sum(CASE WHEN f.fr <= s.nk THEN 1 ELSE 0 END) AS BIGINT) AS vk
        | FROM spine s, fr f GROUP BY 1, 2),
        |xy AS (
        | SELECT CAST(round(ln(nk) * 1000000) AS HUGEINT) AS x,
        |  CAST(round(ln(vk) * 1000000) AS HUGEINT) AS y
        | FROM points WHERE vk > 0),
        |a AS (
        | SELECT CAST(count(*) AS HUGEINT) AS np, sum(x) AS sx, sum(y) AS sy,
        |  sum(x * y) AS sxy, sum(x * x) AS sxx
        | FROM xy),
        |b AS (
        | SELECT np, sx, sy,
        |  (np * sxy - sx * sy) * 1000000 // (np * sxx - sx * sx) AS beta
        | FROM a)
        |SELECT CAST(np AS BIGINT) AS n_points,
        | CAST(beta AS BIGINT) AS beta_micro,
        | CAST((sy - beta * sx // 1000000) // np AS BIGINT) AS lnk_micro
        |FROM b""".stripMargin,
    "q264_odds_ratio" ->
      s"""WITH pair AS (
        | SELECT min(source) AS s1,
        |  min(CASE WHEN source > (SELECT min(source) FROM documents)
        |      THEN source END) AS s2
        | FROM documents),
        |cells AS (
        | SELECT (SELECT s1 FROM pair) AS src_a, (SELECT s2 FROM pair) AS src_b,
        |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair)
        |    AND n_chars < $McnemarChars THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN source = (SELECT s1 FROM pair)
        |    AND n_chars >= $McnemarChars THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair)
        |    AND n_chars < $McnemarChars THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN source = (SELECT s2 FROM pair)
        |    AND n_chars >= $McnemarChars THEN 1 ELSE 0 END) AS BIGINT) AS d
        | FROM documents
        | WHERE text IS NOT NULL AND (source = (SELECT s1 FROM pair)
        |   OR source = (SELECT s2 FROM pair)))
        |SELECT src_a, src_b, a, b, c, d,
        | CASE WHEN b = 0 OR c = 0 THEN NULL ELSE
        |  CAST(CAST(a AS HUGEINT) * d * 1000000
        |   // (CAST(b AS HUGEINT) * c) AS BIGINT) END AS or_ppm,
        | round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
        |  - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 4) AS or_lo,
        | round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
        |  + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 4) AS or_hi
        |FROM cells""".stripMargin,
    "q265_entropy_rate" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |seq AS (
        | SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS prev
        | FROM e),
        |bg AS (
        | SELECT prev, event_type, CAST(count(*) AS BIGINT) AS cij
        | FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
        |rows_ AS (SELECT prev, CAST(sum(cij) AS BIGINT) AS ci
        |          FROM bg GROUP BY 1),
        |t AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(count(DISTINCT bg.prev) AS BIGINT) AS n_states,
        |  CAST(sum(bg.cij) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CAST(bg.cij AS HUGEINT)
        |    * (CAST(round(ln(r.ci) * 1000000) AS HUGEINT)
        |       - CAST(round(ln(bg.cij) * 1000000) AS HUGEINT))) AS HUGEINT)
        |    AS hnum
        | FROM bg JOIN rows_ r ON bg.prev = r.prev)
        |SELECT n_states, n_cells, n_bigrams,
        | CAST(hnum // n_bigrams AS BIGINT) AS entropy_rate_micro
        |FROM t""".stripMargin,
    "q258_spearman" ->
      """WITH d AS (
        | SELECT n_chars AS v1,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS v2
        | FROM documents WHERE text IS NOT NULL),
        |h1 AS (SELECT v1, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
        |m1 AS (SELECT v1, 2 * sum(c) OVER (ORDER BY v1
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS x
        |       FROM h1),
        |h2 AS (SELECT v2, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
        |m2 AS (SELECT v2, 2 * sum(c) OVER (ORDER BY v2
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS y
        |       FROM h2),
        |j AS (SELECT CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
        |      FROM d JOIN m1 USING (v1) JOIN m2 USING (v2)),
        |a AS (
        | SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |  sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        | FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        | round(CAST(n * sxy - sx * sy AS DOUBLE)
        |  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
        |FROM a""".stripMargin,
    "q260_cramers_v" ->
      """WITH obs AS (
        | SELECT event_type, dayofweek(CAST(ts AS DATE)) + 1 AS dow,
        |  CAST(count(*) AS BIGINT) AS o
        | FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
        |       FROM obs GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
        |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS nr,
        |                (SELECT CAST(count(*) AS BIGINT) FROM ct) AS nc),
        |chi AS (
        | SELECT (SELECT n FROM nn) AS n,
        |  sum(CAST(round(
        |   CAST(o * (SELECT n FROM nn) - r * c AS DOUBLE)
        |    * CAST(o * (SELECT n FROM nn) - r * c AS DOUBLE)
        |    / (CAST((SELECT n FROM nn) AS DOUBLE) * CAST(r AS DOUBLE)
        |       * CAST(c AS DOUBLE)) * 1000000.0, 0) AS BIGINT)) / 1000000.0
        |   AS chi2
        | FROM obs JOIN rt USING (event_type) JOIN ct USING (dow))
        |SELECT n, least(nr, nc) - 1 AS dof_min,
        | round(sqrt(chi2 / (CAST(n AS DOUBLE)
        |   * CAST(least(nr, nc) - 1 AS DOUBLE))), 6) AS cramers_v
        |FROM chi, dims""".stripMargin,
    "q252_hits" ->
      """WITH w AS (
        | SELECT user_id, event_type, CAST(count(*) AS HUGEINT) AS c
        | FROM events GROUP BY 1, 2),
        |a0r AS (SELECT event_type, sum(1000000 * c) AS r FROM w GROUP BY 1),
        |a0 AS (SELECT event_type, r * 1000000 // (SELECT max(r) FROM a0r) AS s
        |       FROM a0r),
        |h1r AS (SELECT w.user_id, sum(a0.s * w.c) AS r
        |        FROM w JOIN a0 USING (event_type) GROUP BY 1),
        |h1 AS (SELECT user_id, r * 1000000 // (SELECT max(r) FROM h1r) AS s
        |       FROM h1r),
        |a1r AS (SELECT w.event_type, sum(h1.s * w.c) AS r
        |        FROM w JOIN h1 USING (user_id) GROUP BY 1),
        |a1 AS (SELECT event_type, r * 1000000 // (SELECT max(r) FROM a1r) AS s
        |       FROM a1r),
        |h2r AS (SELECT w.user_id, sum(a1.s * w.c) AS r
        |        FROM w JOIN a1 USING (event_type) GROUP BY 1),
        |h2 AS (SELECT user_id, r * 1000000 // (SELECT max(r) FROM h2r) AS s
        |       FROM h2r),
        |a2r AS (SELECT w.event_type, sum(h2.s * w.c) AS r
        |        FROM w JOIN h2 USING (user_id) GROUP BY 1)
        |SELECT event_type,
        | CAST(r * 1000000 // (SELECT max(r) FROM a2r) AS BIGINT) AS auth_ppm
        |FROM a2r""".stripMargin,
    "q254_assortativity" -> {
      val mutual = GraphEval.oracles("q179_mutual_knn")
      s"""WITH mutual AS ($mutual),
        |e AS (SELECT vec_id AS a, neighbor_id AS b FROM mutual),
        |stubs AS (
        | SELECT a AS x, b AS y FROM e
        | UNION ALL
        | SELECT b AS x, a AS y FROM e),
        |deg AS (SELECT x AS node, CAST(count(*) AS HUGEINT) AS deg
        |        FROM stubs GROUP BY 1),
        |p AS (
        | SELECT dx.deg AS dx, dy.deg AS dy
        | FROM stubs s
        |  JOIN deg dx ON s.x = dx.node
        |  JOIN deg dy ON s.y = dy.node)
        |SELECT CAST(count(*) AS BIGINT) AS m,
        | CASE WHEN CAST(count(*) AS HUGEINT) * sum(dx * dx)
        |        - sum(dx) * sum(dx) = 0 THEN NULL
        | ELSE CAST((CAST(count(*) AS HUGEINT) * sum(dx * dy)
        |     - sum(dx) * sum(dx)) * 1000000
        |   // (CAST(count(*) AS HUGEINT) * sum(dx * dx) - sum(dx) * sum(dx))
        |   AS BIGINT) END AS assortativity_ppm
        |FROM p""".stripMargin
    },
    "q253_frequent_triples" ->
      """WITH b AS (
        | SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
        | FROM events),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
        |      FROM (SELECT DISTINCT user_id, d FROM b)),
        |t AS (
        | SELECT x.event_type AS ta, y.event_type AS tb, z.event_type AS tc,
        |  CAST(count(*) AS BIGINT) AS support
        | FROM b x
        |  JOIN b y ON x.user_id = y.user_id AND x.d = y.d
        |   AND x.event_type < y.event_type
        |  JOIN b z ON y.user_id = z.user_id AND y.d = z.d
        |   AND y.event_type < z.event_type
        | GROUP BY 1, 2, 3)
        |SELECT ta, tb, tc, support,
        | CAST(support * 1000000 // (SELECT n_baskets FROM n) AS BIGINT)
        |  AS support_ppm
        |FROM t""".stripMargin,
    "q255_term_burstiness" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM d),
        |c AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d),
        |pc AS (SELECT term, doc_id, CAST(count(*) AS HUGEINT) AS c
        |       FROM c GROUP BY 1, 2),
        |st AS (SELECT term, sum(c) AS sc, sum(c * c) AS scc,
        |        CAST(count(*) AS BIGINT) AS df_docs
        |       FROM pc GROUP BY 1),
        |top AS (SELECT * FROM st ORDER BY sc DESC, term LIMIT $BurstTopTerms)
        |SELECT term, CAST(sc AS BIGINT) AS total, df_docs,
        | CAST(((SELECT n FROM n) * scc - sc * sc) * 1000000
        |  // ((SELECT n FROM n) * sc) AS BIGINT) AS fano_ppm
        |FROM top""".stripMargin,
    "q256_gini_length" ->
      """WITH r AS (
        | SELECT source, n_chars,
        |  CAST(row_number() OVER (PARTITION BY source
        |   ORDER BY n_chars, doc_id) AS HUGEINT) AS i
        | FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST((2 * sum(i * n_chars)
        |    - (CAST(count(*) AS HUGEINT) + 1) * sum(CAST(n_chars AS HUGEINT)))
        |   * 1000000
        |  // (CAST(count(*) AS HUGEINT) * sum(CAST(n_chars AS HUGEINT)))
        |  AS BIGINT) AS gini_ppm
        |FROM r GROUP BY source""".stripMargin,
    "q257_mcnemar" ->
      s"""WITH f AS (
        | SELECT n_chars < $McnemarChars AS fa,
        |  len(string_split(text, ' ')) < $McnemarTokens AS fb
        | FROM documents WHERE text IS NOT NULL),
        |cells AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN fb AND NOT fa THEN 1 ELSE 0 END) AS BIGINT) AS c
        | FROM f)
        |SELECT n, b, c,
        | CASE WHEN b + c = 0 THEN NULL ELSE
        |  CAST(CAST((b - c) AS HUGEINT) * (b - c) * 1000000
        |   // (b + c) AS BIGINT) END AS chi2_ppm
        |FROM cells""".stripMargin)
}
