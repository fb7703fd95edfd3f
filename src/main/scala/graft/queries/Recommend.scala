package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Item-to-item collaborative filtering over the order baskets — the
  * Amazon-style "bought together" recommender (Linden et al. 2003),
  * which is also the workhorse JOIN-side signal for training-data
  * curation: co-occurrence similarity over baskets is the same
  * computation as co-citation similarity over documents, so this
  * operator doubles as the "related items" edge generator the kNN/graph
  * families consume.
  *
  * q156 mines which pairs are FREQUENT (support-thresholded, FP-growth);
  * q206 scores HOW SIMILAR every co-occurring pair is (cosine over
  * basket-membership vectors) — the ranking signal a recommender
  * actually serves.
  */
object Recommend {

  /** Top-k co-occurrence pairs reported by [[q206ItemCf]]. */
  val TopPairs = 20

  /** q206 — item-item cosine similarity over order baskets. An item's
    * basket-membership vector is binary (does order o contain part p),
    * so cosine(a,b) = cooc / √(c_a·c_b) with cooc = #orders containing
    * both and c_x = #orders containing x. The engine reports the exact
    * SQUARED cosine in ppm — `cooc²·10⁶ div (c_a·c_b)` — because the
    * square is pure integer arithmetic both engines evaluate
    * identically (the q194 discipline: never ship a `sqrt` the compare
    * depends on when the monotone square ranks identically).
    *
    * Scale shape: pair generation is a self-join of the (order, item)
    * table ON THE ORDER KEY — fan-out is Σ basket², bounded by basket
    * width (~4 here), never corpus²; the item-frequency frame
    * (item-alphabet-sized) broadcast-joins onto the pair aggregate; the
    * top-k is rank-pushed (`WindowGroupLimit`-free single limit — a
    * global top-20 after a groupBy whose spine is the co-occurring pair
    * alphabet). Counts widen to decimal(38,0) before the multiply —
    * two 10⁹-order item pairs would overflow a Long product (the q144
    * lesson). */
  def q206ItemCf(s: SparkSession, dir: String): DataFrame =
    itemCfOn(Tables.lineitem(s, dir).select(
      col("l_orderkey").as("basket"), col("l_partkey").as("item")))

  /** [[q206ItemCf]] over any (`basket`, `item`) frame — exposed for the
    * hand-computed planted-basket spec. */
  def itemCfOn(pairs0: DataFrame): DataFrame = {
    val bi = pairs0.distinct()
    val itemCnt = bi.groupBy("item").agg(count(lit(1)).as("c"))
    val cooc = bi.select(col("basket"), col("item").as("item_a"))
      .join(bi.select(col("basket"), col("item").as("item_b")), "basket")
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("cooc"))
    cooc
      .join(broadcast(itemCnt.select(col("item").as("item_a"), col("c").as("c_a"))), "item_a")
      .join(broadcast(itemCnt.select(col("item").as("item_b"), col("c").as("c_b"))), "item_b")
      .withColumn("cos2_ppm", expr(
        "cast(cast(cooc as decimal(38,0)) * cooc * 1000000 div (cast(c_a as decimal(38,0)) * c_b) as bigint)"))
      .orderBy(col("cos2_ppm").desc, col("cooc").desc,
        col("item_a"), col("item_b"))
      .limit(TopPairs)
      .select("item_a", "item_b", "cooc", "c_a", "c_b", "cos2_ppm")
  }

  // ---------------------------------------------------------------- q232

  /** Rank / sweeps / damping for [[q232AlsFactorize]]. */
  val AlsRank = 4
  val AlsIters = 3
  val AlsLambda = 0.1

  /** q232 — distributed ALS matrix factorization over the
    * customer × part purchase matrix (rating = lineitem count):
    * [[graft.operators.Als]] alternates rank-[[AlsRank]] least-squares
    * solves between the two sides and reports the per-iteration
    * training-error curve. The LEARNED counterpart of q206's counting
    * recommender: item-CF can only rank items that co-occurred in some
    * basket; the factor model embeds every customer and part in one
    * latent space and scores arbitrary unseen pairs — and the same
    * operator is the classic embedding trainer for any bipartite
    * interaction table (doc × source, user × event type).
    *
    * Correctness signal (rows-only; a driver-side oracle would have to
    * re-implement ALS): the error curve itself — iter 0 is the
    * deterministic-init error, and each alternation must not increase
    * the regularized objective; the spec plants an exactly-rank-k
    * matrix and asserts the curve collapses toward zero, and the
    * golden hash pins the full integer output. */
  def q232AlsFactorize(s: SparkSession, dir: String): DataFrame = {
    val ratings = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("key"), col("l_partkey").as("other"))
      .agg(count(lit(1)).cast("double").as("r"))
    graft.operators.Als.errorCurve(s, ratings, AlsRank, AlsIters, AlsLambda)
  }

  /** Pseudo-random candidate draws per user in [[q280NegativeSampling]]. */
  val NegDraws = 8

  /** q280 — deterministic negative sampling: per customer, [[NegDraws]]
    * hash-derived candidate parts, minus the parts the customer actually
    * ordered — the (user, item) NON-interactions every contrastive /
    * BPR-style recommender (and hard-negative text-pair miner) trains
    * against. `rand()` negatives are irreproducible and resample every
    * run; these are a pure function of (custkey, draw) via the salted-md5
    * idiom (the q74/q102 sampling discipline), so the set is stable
    * across runs, engines, and retries — which is what makes a training
    * set auditable.
    *
    * Scale shape: candidates are |users|·k rows minted WITHOUT touching
    * the item table beyond one broadcast max-key scalar — never the
    * users×items cross join; the positives side is one distinct
    * projection of the interaction join; the subtraction is a
    * hash-partitioned LEFT ANTI join on (custkey, partkey). At 100 TB
    * the anti-join's positives build side is the corpus-sized one, and
    * it shuffles exactly once on the composite key ([[graft.operators
    * .BloomPrune]] can pre-thin candidates if the positive density is
    * high). Draw collisions (two draws minting the same part) pass
    * through as two rows by design — the draw index is part of the
    * output key, so no distinct is needed anywhere. */
  def q280NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    val pos = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey").as("partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select("custkey", "partkey").distinct()
    // candidate keys span [pmin, pmax] — derived from BOTH bounds so the
    // mint is correct for 0-based (this corpus: 0..1999) and 1-based
    // (classic TPC-H) key conventions alike, never naming a nonexistent
    // item (the contiguity of part keys is the documented precondition)
    val prange = Tables.part(s, dir)
      .agg(min("p_partkey").as("pmin"), max("p_partkey").as("pmax"))
    val cand = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      .crossJoin(broadcast(prange))
      .select(col("custkey"),
        explode(sequence(lit(1), lit(NegDraws))).as("draw"),
        col("pmin"), col("pmax"))
      .select(col("custkey"), col("draw").cast("long").as("draw"),
        (col("pmin") + conv(substring(md5(concat(lit("neg:"),
            col("custkey").cast("string"), lit(":"),
            col("draw").cast("string"))), 1, 15), 16, 10).cast("long")
          % (col("pmax") - col("pmin") + 1)).as("partkey"))
    cand.join(pos, Seq("custkey", "partkey"), "left_anti")
      .select("custkey", "draw", "partkey")
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_negative_sampling" -> (q280NegativeSampling _),
    "q206_item_cf" -> (q206ItemCf _),
    "q232_als_factorize" -> (q232AlsFactorize _))

  val oracles: Map[String, String] = Map(
    "q280_negative_sampling" ->
      s"""WITH pos AS (
         | SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
         | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |pm AS (SELECT min(p_partkey) AS pmin, max(p_partkey) AS pmax
         |       FROM part),
         |cand AS (
         | SELECT c.c_custkey AS custkey, CAST(d.draw AS BIGINT) AS draw,
         |  pm.pmin + ('0x' || substr(md5('neg:' || CAST(c.c_custkey AS VARCHAR)
         |     || ':' || CAST(d.draw AS VARCHAR)), 1, 15))::BIGINT
         |   % (pm.pmax - pm.pmin + 1) AS partkey
         | FROM customer c CROSS JOIN pm
         | CROSS JOIN (SELECT unnest(range(1, $NegDraws + 1)) AS draw) d)
         |SELECT custkey, draw, partkey FROM cand
         |WHERE NOT EXISTS (SELECT 1 FROM pos
         |  WHERE pos.custkey = cand.custkey AND pos.partkey = cand.partkey)""".stripMargin,
    "q206_item_cf" ->
      s"""WITH bi AS (
         | SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
         | FROM lineitem),
         |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
         |cooc AS (
         | SELECT a.item AS item_a, b.item AS item_b,
         |  CAST(count(*) AS BIGINT) AS cooc
         | FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
         | GROUP BY 1, 2)
         |SELECT c.item_a, c.item_b, c.cooc, ca.c AS c_a, cb.c AS c_b,
         | CAST(CAST(c.cooc AS HUGEINT) * c.cooc * 1000000
         |   // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS cos2_ppm
         |FROM cooc c
         |JOIN ic ca ON c.item_a = ca.item
         |JOIN ic cb ON c.item_b = cb.item
         |ORDER BY cos2_ppm DESC, c.cooc DESC, c.item_a, c.item_b
         |LIMIT $TopPairs""".stripMargin)
}
