package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps
import graft.sources.Tables

/** Similarity-graph structure + retrieval-quality evals over the
  * embedding k-NN graph: label-propagation communities (q178), the
  * mutual-kNN sparsification that strips hub edges (q179), and graded
  * nDCG retrieval scoring (q180). Completes the graph family —
  * components (q70) answer "transitively related", k-core (q169)
  * "densely interlinked", LPA answers "which locally-dominant group"
  * (a chain of weak bridges stays one component but splits into
  * communities); and the eval family — q115 measures recall of an
  * approximate index, q180 measures RANKING quality of the exact one
  * against semantic (label) relevance.
  *
  * All three compose the q109/q29 query definitions directly (and
  * their oracles compose those queries' oracle SQL), so the graph
  * being analyzed can never drift from the graph the engine ships. */
object GraphEval {

  /** Synchronous LPA rounds — fixed on both engines, so results match
    * bit-for-bit converged or not (the q169 fixed-round discipline;
    * oscillation under synchronous updates is bounded out by running
    * the identical finite recurrence on both sides). */
  val LpaRounds = 4

  // ---------------------------------------------------------------- q178

  /** q178 — label-propagation communities (Raghavan et al. 2007) over
    * the undirected q109 embedding k-NN graph: each round, every node
    * adopts the most frequent label among its neighbors (ties → the
    * smallest label), labels initialized to node ids. Near-duplicate
    * COMPONENTS (q70) lump everything a chain of borderline pairs can
    * reach; LPA splits such chains at their weak bridges into locally
    * dense groups — the template-family detector that decides "sample
    * one per community", a finer tool than "sample one per component".
    *
    * Scale shape: per round exactly TWO shuffles — neighbor-label
    * count (map-side combining groupBy on (node, label)) and the
    * per-node argmax (WindowGroupLimit-pruned rank on node) — and the
    * label frame carries 2 longs per node; rounds are a fixed small
    * constant. The edge list is cached once; per-round lineage is cut
    * by the label-frame handoff (the q169/CC discipline). */
  def q178LpaCommunities(s: SparkSession, dir: String): DataFrame =
    lpaOn(PipelineQueries.q109EmbeddingKnn(s, dir), LpaRounds)

  /** [[q178LpaCommunities]] over any (vec_id, neighbor_id) edge frame —
    * exposed for the planted-topology spec. */
  def lpaOn(knn: DataFrame, rounds: Int): DataFrame = {
    val und = knn.select(
        least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    // cached hash-partitioned by `src` (guide §2.4, the q196 discipline):
    // the per-round edge⋈label join reuses the layout at cluster scale
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .cache()
    val w = Window.partitionBy("id").orderBy(col("c").desc, col("lbl"))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (r <- 1 to rounds) {
      labels = edges
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("id", "lbl")
      // lineage cut (q169 discipline) every OTHER round: each eager
      // localCheckpoint materializes a job, and at 2 rounds of joins the
      // plan is still small — halving the cuts halves that fixed cost
      // while keeping lineage depth bounded for any `rounds`
      if (r % 2 == 0 || r == rounds) labels = labels.cut()
    }
    edges.unpersist()
    labels.select(col("id").as("vec_id"), col("lbl").as("community"))
  }

  // ---------------------------------------------------------------- q179

  /** q179 — mutual (reciprocal) k-NN edges: keep (a, b) only when each
    * is in the OTHER's top-3 — the standard hub-edge filter (a hub
    * vector near everything appears in thousands of neighbor lists,
    * but its own list holds only 3, so hub→tail edges die). The
    * sparsified graph is what SNN/hubness-aware clustering and the
    * q178 communities actually want at scale.
    *
    * Scale shape: one self-join of the k-NN edge list on the REVERSED
    * pair key — input already ≤ k rows per node, so the join is
    * linear in the graph, never touches vectors, and the a<b guard
    * emits each surviving edge once. */
  def q179MutualKnn(s: SparkSession, dir: String): DataFrame =
    mutualOn(PipelineQueries.q109EmbeddingKnn(s, dir))

  /** [[q179MutualKnn]] over any (vec_id, neighbor_id, rank, sim)
    * directed k-NN frame. */
  def mutualOn(knn: DataFrame): DataFrame = {
    val fwd = knn.select(col("vec_id").as("a"), col("neighbor_id").as("b"),
      col("sim"))
    val rev = knn.select(col("vec_id").as("rb"), col("neighbor_id").as("ra"))
    fwd.join(rev, col("a") === col("ra") && col("b") === col("rb"))
      .where(col("a") < col("b"))
      .select(col("a").as("vec_id"), col("b").as("neighbor_id"), col("sim"))
  }

  // ---------------------------------------------------------------- q180

  /** nDCG truncation depth = q29's k. */
  val NdcgK = 10

  /** `round(10⁶·ln 2/ln(r+1))` — the micro-snapped 1/log2(r+1) DCG
    * discount at integer rank r, identical arithmetic on both engines
    * (deliberately a quotient of two lns — native log2 differs in
    * ulps across libms; the q175 lesson). */
  private def microDiscount(r: Column): Column =
    round(lit(1e6) * log(lit(2.0d)) / log(r.cast("double") + 1.0d), 0)
      .cast("long")

  /** q180 — graded retrieval quality (nDCG@10) of exact cosine search:
    * per q29 anchor, DCG over binary semantic relevance (neighbor
    * shares the anchor's label) with the 1/log2(r+1) discount,
    * normalized by the ideal DCG of that anchor's full relevance pool
    * capped at k. q115 (recall of the ANN index vs exact top-10)
    * measures INDEX fidelity; this measures whether similarity search
    * retrieves semantically right items at the top — the
    * embedding-quality gate before a corpus ships to retrieval
    * training. Discounts snap to integer micro-units per RANK (a
    * 10-row spine), so DCG/IDCG are exact long sums and nDCG is an
    * integer ppm ratio.
    *
    * Scale shape: rides q29's broadcast-anchor scan; everything after
    * is anchors×k rows joined to a label histogram (bounded by the
    * label alphabet) and a 10-row discount spine — all broadcast. */
  def q180Ndcg(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val truth = TextVector.q29AnnBruteForce(s, dir)
    val qLab = e.select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val nLab = e.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"))
    val labCnt = e.groupBy("label").agg(count(lit(1)).as("pool"))
    val dcg = truth
      .join(broadcast(qLab), "query_id").join(nLab, "neighbor_id")
      .groupBy(col("query_id"), col("qlabel"))
      .agg(sum(when(col("nlabel") === col("qlabel"),
          microDiscount(col("rank"))).otherwise(0L)).as("dcg_micro"),
        sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L))
          .as("n_rel_topk"))
    // ideal: every rank down to min(pool-1, k) filled with a relevant hit
    val spine = spark.range(1, NdcgK + 1).select(col("id").as("r"),
      microDiscount(col("id")).as("w"))
    val withPool = dcg.join(broadcast(labCnt),
        col("qlabel") === col("label"))
      .select(col("query_id"), col("dcg_micro"), col("n_rel_topk"),
        least(col("pool") - 1L, lit(NdcgK.toLong)).as("icap"))
    withPool.join(broadcast(spine), col("r") <= col("icap"), "left")
      .groupBy("query_id", "dcg_micro", "n_rel_topk", "icap")
      .agg(coalesce(sum("w"), lit(0L)).as("idcg_micro"))
      .select(col("query_id"), col("n_rel_topk"), col("icap"),
        col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") === 0L, lit(null).cast("long"))
          .otherwise(expr("dcg_micro * 1000000 div idcg_micro"))
          .as("ndcg_ppm"))
  }

  // ---------------------------------------------------------------- q231

  /** q231 — MAP / MRR over the same retrieval run q180 scores with
    * NDCG: per query, average precision (precision-at-rank summed at
    * each relevant hit, normalized by the achievable relevant count)
    * and reciprocal rank of the FIRST hit. The three eval numbers
    * report different failures — MRR only cares about the first good
    * result (autocomplete), MAP rewards packing all of them early
    * (retrieval-augmented training), NDCG grades the whole gain curve
    * — so an ANN regression can move one sharply while the others sit
    * still; an eval harness wants all three off ONE ranking pass.
    *
    * Integer discipline: precision@r = cum_rel·10⁶ div r per hit
    * (exact integers both engines), AP = the hit-sum div
    * icap = min(pool−1, k) — the q180 normalizer, so an
    * impossible-to-fill top-k can still score 10⁶. MRR = 10⁶ div
    * first-hit rank, 0 when the top-k has no hit.
    *
    * Scale shape: reuses the q29 truth (per-query top-k already
    * bounded); labels broadcast-join on; the cumulative runs in a
    * per-query window over ≤ k rows — partitioned, never global. */
  def q231MapMrr(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val truth = TextVector.q29AnnBruteForce(s, dir)
    val qLab = e.select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val nLab = e.select(col("vec_id").as("neighbor_id"),
      col("label").as("nlabel"))
    val labCnt = e.groupBy("label").agg(count(lit(1)).as("pool"))
    val w = Window.partitionBy("query_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = truth
      .join(broadcast(qLab), "query_id").join(nLab, "neighbor_id")
      .select(col("query_id"), col("qlabel"), col("rank"),
        (col("nlabel") === col("qlabel")).as("rel"))
      .withColumn("cum_rel",
        sum(when(col("rel"), 1L).otherwise(0L)).over(w))
    marked.groupBy("query_id", "qlabel")
      .agg(
        sum(when(col("rel"), expr("cum_rel * 1000000 div rank"))
          .otherwise(0L)).as("ap_num"),
        sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel_topk"),
        min(when(col("rel"), col("rank"))).as("first_hit"))
      .join(broadcast(labCnt), col("qlabel") === col("label"))
      .select(col("query_id"), col("n_rel_topk"),
        least(col("pool") - 1L, lit(NdcgK.toLong)).as("icap"),
        col("first_hit").cast("long").as("first_hit"),
        coalesce(expr("1000000 div cast(first_hit as bigint)"), lit(0L))
          .as("rr_ppm"),
        col("ap_num"))
      .withColumn("ap_ppm",
        when(col("icap") > 0L, expr("ap_num div icap")).otherwise(lit(0L)))
      .drop("ap_num")
  }

  // ---------------------------------------------------------------- q185

  /** Benchmark id cut and cosine flag threshold for [[q185SemanticContamination]]. */
  val BenchIdCut = 20L
  val ContamTau = 0.4

  /** q185 — semantic decontamination report: for every corpus vector,
    * its nearest BENCHMARK vector by exact cosine and a contamination
    * flag at cosine ≥ 0.4 — the embedding-space upgrade of q64's
    * 5-gram contamination (paraphrased or reformatted eval items share
    * no n-grams but sit next to the original in embedding space; n-gram
    * decontamination provably misses them). Benchmark = the bounded
    * vec_id < 20 eval set, corpus = the rest.
    *
    * Scale shape: the q114 discipline mirrored — the bounded benchmark
    * set broadcasts, similarity is one codegen'd native-cosine pass
    * over the corpus scan, the per-vector argmax is a
    * WindowGroupLimit-pruned rank (ties → smaller bench id), the flag
    * is a pure projection. At benchmark×corpus scale beyond broadcast,
    * the same rule routes through the IVF probe
    * ([[graft.operators.AnnIvf]]) with benchmark vectors as queries. */
  def q185SemanticContamination(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val bench = e.where(col("vec_id") < BenchIdCut)
      .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
    val corpus = e.where(col("vec_id") >= BenchIdCut)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("__sim").desc, col("bench_id"))
    corpus.join(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        graft.functions.VectorFunctions.nativeCosine(col("embedding"), col("bv"))
          .as("__sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"),
        round(col("__sim"), 4).as("sim"),
        (col("__sim") >= ContamTau).as("contaminated"))
  }

  // ---------------------------------------------------------------- q201

  /** Independent FM-sketch copies per node (averaging k copies cuts the
    * estimator's variance ~1/√k). */
  val AnfCopies = 8

  /** Frontier rounds — the neighborhood function is emitted per round
    * 1‥AnfRounds (the effective-diameter growth curve). */
  val AnfRounds = 4

  /** `2^ρ(u)` where ρ = index of the lowest SET bit of the 32-bit hash
    * `u` (ρ = 31 for u = 0) — the Flajolet–Martin register a node
    * contributes, as one generated CASE of pure div/mod arithmetic
    * identical in both engines. */
  private def fmMaskCase(u: String, idiv: String): String =
    (0 until 31).map { b =>
      s"WHEN ($u $idiv ${1L << b}) % 2 = 1 THEN ${1L << b}"
    }.mkString("CASE ", " ", s" ELSE ${1L << 31} END")

  /** Index of the lowest UNSET bit of mask `m` — the FM radius
    * statistic R whose 2^R estimates the ball's cardinality. */
  private def lowestUnsetCase(m: String, idiv: String): String =
    (0 until 32).map { b =>
      s"WHEN ($m $idiv ${1L << b}) % 2 = 0 THEN $b"
    }.mkString("CASE ", " ", " ELSE 32 END")

  /** q201 — neighborhood function via HyperANF (Boldi–Rosa–Vigna 2011,
    * with classic Flajolet–Martin registers): per frontier round r,
    * the summed FM radius statistic over all nodes — the integer
    * sufficient statistic behind "how many pairs are within r hops",
    * i.e. the effective-diameter growth curve of the similarity graph.
    * BFS (q196) measures distance from ONE seed; ANF measures ALL
    * balls at once, which exact all-pairs BFS cannot do at any scale —
    * the sketch is what makes graph-diameter audits possible on a
    * billion-node dup graph. Per node, k = 8 independent 32-bit FM
    * masks; a round is bit_or over neighbors (union of reachable sets
    * in sketch space); everything derives from md5, so both engines
    * compute the identical masks and the oracle checks the estimator
    * EXACTLY (the output is Σ lowest-unset-bit, an integer — the
    * float 2^(R/k)/0.77351 read-out is left to the consumer).
    *
    * Scale shape: state is 9 longs per node; each round is one edge
    * join + one bit_or groupBy (the LPA cost model), lineage cut per
    * round. Registers merge by OR — associative, commutative,
    * map-side combinable, the property that lets 1000 executors merge
    * partial frontiers without coordination. */
  def q201Hyperanf(s: SparkSession, dir: String): DataFrame =
    anfOn(PipelineQueries.q109EmbeddingKnn(s, dir), AnfRounds)

  /** [[q201Hyperanf]] over any (vec_id, neighbor_id) edge frame —
    * exposed for the planted-topology spec. */
  def anfOn(knn: DataFrame, rounds: Int): DataFrame = {
    val und = knn.select(
        least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")) // per-round join layout (q196 discipline)
      .cache()
    val maskCols = (0 until AnfCopies).map(j => s"m$j")
    var state = edges.select(col("src").as("id")).distinct()
    for (j <- 0 until AnfCopies)
      state = state.withColumn(s"m$j", expr(fmMaskCase(
        s"cast(conv(substring(md5(concat('anf:$j:', id)), 1, 8), 16, 10) as bigint)",
        "div")))
    state = state.cut()
    val rSumExpr = maskCols.map(m => lowestUnsetCase(m, "div"))
      .mkString("(", " + ", ")")
    def summary(r: Int, st: DataFrame): DataFrame =
      st.agg(count(lit(1)).as("nodes"),
          expr(s"cast(sum($rSumExpr) as bigint)").as("r_sum"))
        .select(lit(r).as("round"), col("nodes"), col("r_sum"))
    val out = (1 to rounds).map { r =>
      val contrib = edges
        .join(state.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id") +: maskCols.map(col): _*)
      val aggs = maskCols.map(m => expr(s"bit_or($m)").as(m))
      state = state.unionByName(contrib)
        .groupBy("id").agg(aggs.head, aggs.tail: _*)
        .cut()
      summary(r, state)
    }
    edges.unpersist()
    out.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_lpa_communities" -> (q178LpaCommunities _),
    "q179_mutual_knn" -> (q179MutualKnn _),
    "q180_ndcg" -> (q180Ndcg _),
    "q185_semantic_contamination" -> (q185SemanticContamination _),
    "q201_hyperanf" -> (q201Hyperanf _),
    "q231_map_mrr" -> (q231MapMrr _))

  /** One synchronous LPA round as SQL over the previous round's CTE. */
  private def lpaRoundSql(prev: String, cur: String): String =
    s"""$cur AS (
       | SELECT id, lbl FROM (
       |  SELECT id, lbl,
       |   row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
       |  FROM (
       |   SELECT e.dst AS id, l.lbl, CAST(count(*) AS BIGINT) AS c
       |   FROM edges e JOIN $prev l ON e.src = l.id
       |   GROUP BY e.dst, l.lbl))
       | WHERE rn = 1)""".stripMargin

  /** One ANF round as SQL: OR each node's masks with its neighbors'. */
  private def anfRoundSql(prev: String, cur: String): String = {
    val cols = (0 until AnfCopies).map(j => s"m$j")
    s"""$cur AS (
       | SELECT id, ${cols.map(m => s"bit_or($m) AS $m").mkString(", ")}
       | FROM (
       |  SELECT id, ${cols.mkString(", ")} FROM $prev
       |  UNION ALL
       |  SELECT e.dst AS id, ${cols.map(m => s"p.$m").mkString(", ")}
       |  FROM edges e JOIN $prev p ON e.src = p.id)
       | GROUP BY id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q201_hyperanf" -> {
      val knn = PipelineQueries.oracles("q109_embedding_knn")
      val inits = (0 until AnfCopies).map { j =>
        val u = s"(('0x' || substr(md5('anf:$j:' || CAST(id AS VARCHAR)), 1, 8))::BIGINT)"
        s"${fmMaskCase(u, "//")} AS m$j"
      }.mkString(",\n  ")
      val rounds = (1 to AnfRounds)
        .map(i => anfRoundSql(if (i == 1) "a0" else s"a${i - 1}", s"a$i"))
        .mkString(",\n")
      val rSum = (0 until AnfCopies).map(j => lowestUnsetCase(s"m$j", "//"))
        .mkString("(", " + ", ")")
      val summaries = (1 to AnfRounds).map(i =>
        s"""s$i AS (
           | SELECT $i AS round, CAST(count(*) AS BIGINT) AS nodes,
           |  CAST(sum($rSum) AS BIGINT) AS r_sum FROM a$i)""".stripMargin)
        .mkString(",\n")
      s"""WITH knn AS ($knn),
         |und AS (
         | SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         |  greatest(vec_id, neighbor_id) AS b
         | FROM knn WHERE vec_id <> neighbor_id),
         |edges AS (
         | SELECT a AS src, b AS dst FROM und
         | UNION ALL
         | SELECT b AS src, a AS dst FROM und),
         |a0 AS (
         | SELECT id,
         |  $inits
         | FROM (SELECT DISTINCT src AS id FROM edges)),
         |$rounds,
         |$summaries
         |${(1 to AnfRounds).map(i => s"SELECT * FROM s$i").mkString("\nUNION ALL\n")}""".stripMargin
    },
    "q178_lpa_communities" -> {
      val knn = PipelineQueries.oracles("q109_embedding_knn")
      val rounds = (1 to LpaRounds)
        .map(i => lpaRoundSql(if (i == 1) "l0" else s"l${i - 1}", s"l$i"))
        .mkString(",\n")
      s"""WITH knn AS ($knn),
         |und AS (
         | SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         |  greatest(vec_id, neighbor_id) AS b
         | FROM knn WHERE vec_id <> neighbor_id),
         |edges AS (
         | SELECT a AS src, b AS dst FROM und
         | UNION ALL
         | SELECT b AS src, a AS dst FROM und),
         |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
         |$rounds
         |SELECT id AS vec_id, lbl AS community FROM l$LpaRounds""".stripMargin
    },
    "q179_mutual_knn" -> {
      val knn = PipelineQueries.oracles("q109_embedding_knn")
      s"""WITH knn AS ($knn)
         |SELECT k1.vec_id, k1.neighbor_id, k1.sim
         |FROM knn k1 JOIN knn k2
         | ON k1.vec_id = k2.neighbor_id AND k1.neighbor_id = k2.vec_id
         |WHERE k1.vec_id < k1.neighbor_id""".stripMargin
    },
    "q185_semantic_contamination" ->
      s"""WITH b AS (
         | SELECT vec_id AS bench_id, embedding AS bv FROM embeddings
         | WHERE vec_id < $BenchIdCut),
         |sims AS (
         | SELECT e.vec_id, b.bench_id,
         |  list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(bv AS DOUBLE[]))
         |   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         |      * sqrt(list_dot_product(CAST(bv AS DOUBLE[]), CAST(bv AS DOUBLE[])))) AS sim
         | FROM embeddings e, b WHERE e.vec_id >= $BenchIdCut),
         |ranked AS (
         | SELECT vec_id, bench_id, sim,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
         | FROM sims)
         |SELECT vec_id, bench_id, round(sim, 4) AS sim,
         | sim >= $ContamTau AS contaminated
         |FROM ranked WHERE rn = 1""".stripMargin,
    "q231_map_mrr" -> {
      val truth = TextVector.oracles("q29_ann_bruteforce")
      s"""WITH truth AS ($truth),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS pool
         |        FROM embeddings GROUP BY label),
         |marked AS (
         | SELECT t.query_id, q.label AS qlabel, t.rank,
         |  n.label = q.label AS rel,
         |  CAST(sum(CASE WHEN n.label = q.label THEN 1 ELSE 0 END)
         |   OVER (PARTITION BY t.query_id ORDER BY t.rank
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_rel
         | FROM truth t
         |  JOIN lab q ON t.query_id = q.vec_id
         |  JOIN lab n ON t.neighbor_id = n.vec_id),
         |per AS (
         | SELECT query_id, qlabel,
         |  CAST(sum(CASE WHEN rel THEN cum_rel * 1000000 // rank
         |           ELSE 0 END) AS BIGINT) AS ap_num,
         |  CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
         |  min(CASE WHEN rel THEN rank END) AS first_hit
         | FROM marked GROUP BY 1, 2)
         |SELECT p.query_id, p.n_rel_topk,
         | least(c.pool - 1, $NdcgK) AS icap,
         | CAST(p.first_hit AS BIGINT) AS first_hit,
         | COALESCE(1000000 // CAST(p.first_hit AS BIGINT), 0) AS rr_ppm,
         | CASE WHEN least(c.pool - 1, $NdcgK) > 0
         |  THEN p.ap_num // least(c.pool - 1, $NdcgK) ELSE 0 END AS ap_ppm
         |FROM per p JOIN cnt c ON p.qlabel = c.label""".stripMargin
    },
    "q180_ndcg" -> {
      val truth = TextVector.oracles("q29_ann_bruteforce")
      s"""WITH truth AS ($truth),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS pool
         |        FROM embeddings GROUP BY label),
         |dcg AS (
         | SELECT t.query_id, q.label AS qlabel,
         |  CAST(sum(CASE WHEN n.label = q.label THEN
         |   CAST(round(1000000.0 * ln(2.0) / ln(CAST(t.rank AS DOUBLE) + 1.0), 0) AS BIGINT)
         |   ELSE 0 END) AS BIGINT) AS dcg_micro,
         |  CAST(sum(CASE WHEN n.label = q.label THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_rel_topk
         | FROM truth t
         |  JOIN lab q ON t.query_id = q.vec_id
         |  JOIN lab n ON t.neighbor_id = n.vec_id
         | GROUP BY t.query_id, q.label),
         |pooled AS (
         | SELECT d.query_id, d.dcg_micro, d.n_rel_topk,
         |  least(c.pool - 1, $NdcgK) AS icap
         | FROM dcg d JOIN cnt c ON d.qlabel = c.label),
         |spine AS (
         | SELECT CAST(range AS BIGINT) + 1 AS r,
         |  CAST(round(1000000.0 * ln(2.0) / ln(CAST(range AS DOUBLE) + 2.0), 0) AS BIGINT) AS w
         | FROM range($NdcgK))
         |SELECT p.query_id, p.n_rel_topk, p.icap, p.dcg_micro,
         | CAST(COALESCE(sum(s.w), 0) AS BIGINT) AS idcg_micro,
         | CASE WHEN COALESCE(sum(s.w), 0) = 0 THEN NULL
         |  ELSE CAST(p.dcg_micro * 1000000 // sum(s.w) AS BIGINT) END AS ndcg_ppm
         |FROM pooled p LEFT JOIN spine s ON s.r <= p.icap
         |GROUP BY p.query_id, p.n_rel_topk, p.icap, p.dcg_micro""".stripMargin
    })
}
