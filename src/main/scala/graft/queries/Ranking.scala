package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph-ranking queries past q103's global PageRank: personalized
  * PageRank (q208 — random-walk-with-restart affinity to a seed, the
  * graded "how related to THIS node" score that global rank cannot
  * give) and TextRank (q209 — Mihalcea & Tarau 2004: PageRank over the
  * token co-occurrence graph as an unsupervised keyphrase scorer, the
  * graph-native complement of q85's frequency-based top terms and
  * q90's TF-IDF).
  *
  * Both run [[graft.operators.PageRank]]'s exact integer recurrence
  * (parts-per-1e9 longs, `div` truncation deterministic), so the
  * oracles unroll the identical arithmetic in SQL — the q103
  * discipline extended to a point-mass restart vector.
  */
object Ranking {

  private val Iters = 5
  private val Damping = 85
  private val Scale = 1000000000L

  // ---------------------------------------------------------------- q208

  /** q208 — personalized PageRank over the event-type transition graph
    * (the q103/q88 bigram edges), restarted at the lexicographically
    * smallest event type. Global PageRank answers "which states
    * dominate user flows overall"; PPR answers "which states does the
    * walk reach FROM HERE before restarting" — the seed-conditional
    * relevance that attribution ("what follows a signup, directly or
    * indirectly") and contamination tracing actually need. The seed is
    * data-derived but deterministic (min node), so both engines pick
    * the same restart point with no configuration to drift.
    *
    * Scale shape: edge construction is one per-user window + groupBy
    * (bounded type-alphabet output); each PR round is the two-shuffle
    * Pregel step on an alphabet-sized rank table. The seed fetch is a
    * one-row bounded driver action (the q36 model-fetch contract). */
  def q208Ppr(s: SparkSession, dir: String): DataFrame = {
    val edges = transitionEdges(s, dir)
    val seed = edges.agg(min("src")).head().getString(0)
    graft.operators.PageRank
      .personalizedRanks(edges, seed, Iters, Damping, Scale)
      .select(col("node"), col("rank").as("rank_ppb"))
  }

  /** The q103 transition edge list: (prev type → type, count). */
  private def transitionEdges(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("event_type", 1).over(byUser))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  // ---------------------------------------------------------------- q209

  /** q209 — TextRank keyphrase scores: undirected token co-occurrence
    * graph from ADJACENT token pairs (window 2, self-loops dropped),
    * edge weight = corpus-wide pair count, then the exact-integer
    * PageRank. A token ranks high when its neighbors rank high — the
    * recursive centrality that separates structural keywords from
    * merely frequent ones (q85 counts; q209 ranks by graph position).
    *
    * Scale shape: pair generation is a NARROW pass (`arrays_zip` of the
    * token array against its own tail — no posexplode self-join); the
    * co-occurrence groupBy's spine is the bigram vocabulary; PR rounds
    * run on the unigram-vocabulary rank table. Vocabulary obeys Heaps'
    * law, so both spines grow sublinearly in the corpus; on a corpus
    * where they don't, threshold the edge list by weight first (the
    * q183 degenerate-vocab caveat, rank edition). */
  def q209Textrank(s: SparkSession, dir: String): DataFrame =
    textrankOn(Tables.documents(s, dir))

  /** [[q209Textrank]] over any (doc_id, text) frame — exposed for the
    * planted-graph spec. */
  def textrankOn(docs: DataFrame): DataFrame = {
    val und = docs.where(col("text").isNotNull)
      .select(split(col("text"), " ").as("toks"))
      // adjacent-pair fan-out as a NARROW transform; single-token docs
      // are filtered first (sequence(1, 0) would be DESCENDING in Spark)
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS x, toks[i] AS y))")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    val edges = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
    graft.operators.PageRank.ranks(edges, Iters, Damping, Scale)
      .select(col("node").as("token"), col("rank").as("rank_ppb"))
  }

  // ---------------------------------------------------------------- q219

  /** Collocations below this pair count are noise — dropped before
    * scoring (part of the operator definition, identical in both
    * engines). */
  val LlrMinPairCount = 5

  /** Result rows: top collocations by G², ties broken by (x, y). */
  val LlrTopK = 100

  /** `round(ln(e)·10⁶)` as SQL — the micro-nat primitive (q104/q122
    * discipline). Every argument here is a positive INTEGER, so both
    * engines take `ln` of the same exact double. */
  private def mn(e: String) =
    s"cast(round(ln(cast(($e) as double)) * 1000000) as bigint)"

  /** One G² cell `k·(mn(k) + mn(N) − mn(row) − mn(col))`, zero when the
    * cell is empty (the CASE guard also keeps `ln(0)` unevaluated for
    * degenerate margins). Decimal-widened: immune to 10¹²-bigram
    * corpora. */
  private def g2Term(k: String, row: String, colm: String) =
    s"""(case when ($k) > 0 then cast(($k) as decimal(38,0)) *
       |  (${mn(k)} + ${mn("nn")} - ${mn(row)} - ${mn(colm)})
       | else cast(0 as decimal(38,0)) end)""".stripMargin

  /** q219 — Dunning log-likelihood-ratio collocations (Dunning 1993):
    * adjacent token bigrams scored by the G² statistic of their 2×2
    * contingency table. PMI (q142's stat) explodes on rare pairs; G²
    * weights the evidence by count, which is why collocation mining
    * and feature-association audits use it at corpus scale. The
    * statistic is decomposed so every `ln` is taken of a positive
    * integer and rounded to micro-nats — all arithmetic after that is
    * exact integer/decimal, so the oracle matches bit-for-bit.
    *
    * Scale shape: pair fan-out is the q209 narrow transform; the only
    * corpus shuffle is the bigram-vocabulary groupBy (map-side
    * partial, Heaps-sublinear spine); margins and N are
    * vocabulary-bounded broadcasts; the final top-k is a TakeOrdered,
    * never a global sort materialization. */
  def q219LlrCollocations(s: SparkSession, dir: String): DataFrame =
    llrCollocationsOn(Tables.documents(s, dir))

  /** [[q219LlrCollocations]] over any (doc_id, text) frame. */
  def llrCollocationsOn(docs: DataFrame): DataFrame = {
    val pairCnt = docs.where(col("text").isNotNull)
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS x, toks[i] AS y))")).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("k11"))
    val leftM = pairCnt.groupBy("x").agg(sum("k11").as("r"))
    val rightM = pairCnt.groupBy("y").agg(sum("k11").as("c"))
    val total = pairCnt.agg(sum("k11").as("nn"))
    pairCnt.where(col("k11") >= LlrMinPairCount)
      .join(broadcast(leftM), "x")
      .join(broadcast(rightM), "y")
      .crossJoin(broadcast(total))
      .withColumn("g2_micro", expr(
        s"""cast(2 * (${g2Term("k11", "r", "c")}
           | + ${g2Term("r - k11", "r", "nn - c")}
           | + ${g2Term("c - k11", "nn - r", "c")}
           | + ${g2Term("nn - r - c + k11", "nn - r", "nn - c")})
           | as bigint)""".stripMargin))
      .select("x", "y", "k11", "g2_micro")
      .orderBy(col("g2_micro").desc, col("x"), col("y"))
      .limit(LlrTopK)
  }

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------------------- q279

  /** Leaderboard size of [[q279TopkAggregate]]. */
  val TopKPerGroup = 3

  /** q279 — top-k per group as a MAP-SIDE-COMBINING aggregate
    * ([[graft.functions.TopKAgg]]): the k highest-value events per
    * event type, with their cents and event_id. The window idiom
    * (`row_number() OVER (PARTITION BY type ORDER BY cents DESC)`)
    * shuffles and sorts EVERY event row by (type, cents) to emit k
    * rows per group; the aggregate form pushes a k-bounded binary
    * min-heap into ObjectHashAggregate's partial stage, so each
    * partition ships at most k pairs per group and nothing is globally
    * sorted — the difference between "the corpus through one exchange"
    * and "k·groups·partitions longs" at 100 TB. event_id is the unique
    * tie-breaker, making the (score, payload) order total and the
    * output reproducible (TopKAggSpec pins aggregate ≡ window).
    *
    * The oracle is the window form itself, so the gate proves the
    * bounded-heap plan computes exactly what the textbook plan
    * computes. */
  def q279TopkAggregate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val topk = udaf(new graft.functions.TopKAgg(TopKPerGroup),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    Tables.events(s, dir)
      .where(col("value").isNotNull && col("event_id").isNotNull)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        col("event_id"))
      .groupBy("event_type")
      .agg(topk(col("cents"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as("cents"), col("col._2").as("event_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q279_topk_aggregate" -> (q279TopkAggregate _),
    "q208_ppr" -> (q208Ppr _),
    "q209_textrank" -> (q209Textrank _),
    "q219_llr_collocations" -> (q219LlrCollocations _))

  /** Unrolled personalized-PR rounds: expects CTEs `e(src,dst,w)`,
    * `ow(src,outw)`, `nodes(node)`, `sd(seed)`, `r0(node,rank)`. */
  private def pprRoundSql(k: Int): String =
    s"""r$k AS MATERIALIZED (
       | SELECT nodes.node,
       |  CAST(CASE WHEN nodes.node = sd.seed
       |   THEN (${(100L - Damping) * Scale}) // 100 + ($Damping * dg.dm) // 100
       |   ELSE 0 END
       |  + COALESCE(c.contrib, 0) AS BIGINT) AS rank
       | FROM nodes
       | CROSS JOIN sd
       | CROSS JOIN (SELECT COALESCE(sum(CAST(p.rank AS HUGEINT)), 0) AS dm
       |             FROM r${k - 1} p
       |             LEFT JOIN ow ON p.node = ow.src WHERE ow.src IS NULL) dg
       | LEFT JOIN (SELECT e.dst AS node,
       |             sum((CAST(p.rank AS HUGEINT) * $Damping * e.w)
       |               // (100 * ow.outw)) AS contrib
       |            FROM e JOIN r${k - 1} p ON e.src = p.node
       |            JOIN ow ON e.src = ow.src
       |            GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin

  /** Unrolled uniform-teleport PR rounds (the q103 recurrence): expects
    * CTEs `e`, `ow`, `nodes`, `nn(n)`, `r0`. */
  private def prRoundSql(k: Int): String =
    s"""r$k AS MATERIALIZED (
       | SELECT nodes.node,
       |  CAST(${(100L - Damping) * Scale} // (100 * nn.n)
       |   + COALESCE(c.contrib, 0)
       |   + ($Damping * dg.dm) // (100 * nn.n) AS BIGINT) AS rank
       | FROM nodes
       | CROSS JOIN nn
       | CROSS JOIN (SELECT COALESCE(sum(p.rank), 0) AS dm FROM r${k - 1} p
       |             LEFT JOIN ow ON p.node = ow.src WHERE ow.src IS NULL) dg
       | LEFT JOIN (SELECT e.dst AS node,
       |             sum((p.rank * $Damping * e.w) // (100 * ow.outw)) AS contrib
       |            FROM e JOIN r${k - 1} p ON e.src = p.node
       |            JOIN ow ON e.src = ow.src
       |            GROUP BY e.dst) c ON nodes.node = c.node)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q279_topk_aggregate" ->
      s"""WITH e AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |  event_id
        | FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |r AS (
        | SELECT event_type, cents, event_id,
        |  row_number() OVER (PARTITION BY event_type
        |                     ORDER BY cents DESC, event_id DESC) AS rn
        | FROM e)
        |SELECT event_type, CAST(rn AS BIGINT) AS rank, cents, event_id
        |FROM r WHERE rn <= $TopKPerGroup""".stripMargin,
    "q208_ppr" -> {
      val rounds = (1 to Iters).map(pprRoundSql).mkString(",\n")
      s"""WITH ev AS (
         | SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |b AS (
         | SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |   AS prev, event_type AS curr FROM ev),
         |e AS MATERIALIZED (SELECT prev AS src, curr AS dst, CAST(count(*) AS BIGINT) AS w
         |      FROM b WHERE prev IS NOT NULL GROUP BY 1, 2),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
         |sd AS (SELECT min(src) AS seed FROM e),
         |r0 AS (SELECT node,
         |  CAST(CASE WHEN node = sd.seed THEN $Scale ELSE 0 END AS BIGINT) AS rank
         | FROM nodes CROSS JOIN sd),
         |$rounds
         |SELECT node, CAST(rank AS BIGINT) AS rank_ppb FROM r$Iters""".stripMargin
    },
    "q209_textrank" -> {
      val rounds = (1 to Iters).map(prRoundSql).mkString(",\n")
      s"""WITH toks AS (
         | SELECT doc_id, string_split(text, ' ') AS ts
         | FROM documents WHERE text IS NOT NULL),
         |pos AS (
         | SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS p FROM toks),
         |adj AS (
         | SELECT a.tok AS x, b.tok AS y
         | FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         | WHERE a.tok <> b.tok),
         |und AS MATERIALIZED (
         | SELECT least(x, y) AS a, greatest(x, y) AS b,
         |  CAST(count(*) AS BIGINT) AS w
         | FROM adj GROUP BY 1, 2),
         |e AS MATERIALIZED (
         | SELECT a AS src, b AS dst, w FROM und
         | UNION ALL
         | SELECT b AS src, a AS dst, w FROM und),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
         |r0 AS (SELECT node, CAST($Scale // n AS BIGINT) AS rank
         |       FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT node AS token, CAST(rank AS BIGINT) AS rank_ppb FROM r$Iters""".stripMargin
    },
    "q219_llr_collocations" -> {
      def dmn(e: String) =
        s"CAST(round(ln(CAST(($e) AS DOUBLE)) * 1000000) AS BIGINT)"
      def dterm(k: String, row: String, colm: String) =
        s"""(CASE WHEN ($k) > 0 THEN CAST(($k) AS HUGEINT) *
           |  (${dmn(k)} + ${dmn("nn.nn")} - ${dmn(row)} - ${dmn(colm)})
           | ELSE 0 END)""".stripMargin
      s"""WITH toks AS (
         | SELECT doc_id, string_split(text, ' ') AS ts
         | FROM documents WHERE text IS NOT NULL),
         |pos AS (
         | SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS p FROM toks),
         |pc AS MATERIALIZED (
         | SELECT a.tok AS x, b.tok AS y, CAST(count(*) AS BIGINT) AS k11
         | FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         | GROUP BY 1, 2),
         |l AS (SELECT x, CAST(sum(k11) AS BIGINT) AS r FROM pc GROUP BY 1),
         |rt AS (SELECT y, CAST(sum(k11) AS BIGINT) AS c FROM pc GROUP BY 1),
         |nn AS (SELECT CAST(sum(k11) AS BIGINT) AS nn FROM pc)
         |SELECT pc.x, pc.y, pc.k11,
         | CAST(2 * (${dterm("pc.k11", "l.r", "rt.c")}
         |   + ${dterm("l.r - pc.k11", "l.r", "nn.nn - rt.c")}
         |   + ${dterm("rt.c - pc.k11", "nn.nn - l.r", "rt.c")}
         |   + ${dterm("nn.nn - l.r - rt.c + pc.k11", "nn.nn - l.r",
               "nn.nn - rt.c")}) AS BIGINT) AS g2_micro
         |FROM pc JOIN l USING (x) JOIN rt USING (y) CROSS JOIN nn
         |WHERE pc.k11 >= $LlrMinPairCount
         |ORDER BY g2_micro DESC, x, y LIMIT $LlrTopK""".stripMargin
    })
}
