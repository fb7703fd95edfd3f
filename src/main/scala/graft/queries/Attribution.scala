package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps
import graft.sources.Tables

/** Markov-chain conversion attribution (Anderl et al. 2014 — the
  * "removal effect" model every marketing-mix platform implements):
  * user journeys become a first-order chain over channels
  * (event types), conversion = reaching the absorbing `purchase`
  * state, and a channel's credit is how much the START→conversion
  * reach probability DROPS when that channel is removed from the
  * chain. Unlike q166's first/last-touch rules, the credit is derived
  * from the observed transition structure — a channel that only ever
  * feeds dead ends earns nothing no matter how often it is touched.
  *
  * Exactness: reach probabilities are ppm longs under the q103/q208
  * integer-recurrence discipline — per node per round ONE integral
  * division (Σ w·reach(next)) div out_w, floored identically in both
  * engines; the oracle unrolls the same rounds over the
  * (removed-channel × node) product, so the removal lanes vectorize
  * into one static SQL text.
  *
  * Scale shape: journey truncation and transition extraction are one
  * user-partitioned window pass (the q71/q88 shuffle every behavioral
  * query shares); everything after lives on alphabet-sized frames —
  * edges ≤ (|types|+1)², reach table |lanes|·|types| rows — iterated
  * [[MarkovRounds]] times with `localCheckpoint` lineage cuts. Event
  * volume only ever touches the first window pass. */
object Attribution {

  /** Absorbing conversion state; journeys truncate at its first hit. */
  val ConvType = "purchase"

  private val Start = "__start__"
  private val NullState = "__null__"
  private val NoRemoval = "__none__"

  /** Reach-recurrence rounds: journeys are short, 8 rounds converge
    * the ppm value for any chain whose cycles lose mass to NULL. */
  val MarkovRounds = 8

  private val Ppm = 1000000L

  def q221MarkovAttribution(s: SparkSession, dir: String): DataFrame =
    markovAttributionOn(Tables.events(s, dir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us")))

  /** [[q221MarkovAttribution]] over any (user_id, event_id,
    * event_type, `us` long) frame — exposed for the hand-computed
    * spec. */
  def markovAttributionOn(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val rn = ev.withColumn("rn", row_number().over(byUser))
    val firstConv = rn.where(col("event_type") === ConvType)
      .groupBy("user_id").agg(min("rn").as("crn"))
    val byRn = Window.partitionBy("user_id").orderBy("rn")
    val journey = rn.join(firstConv, Seq("user_id"), "left_outer")
      .where(col("crn").isNull || col("rn") <= col("crn"))
      .withColumn("src",
        coalesce(lag("event_type", 1).over(byRn), lit(Start)))
      .withColumn("nxt", lead("event_type", 1).over(byRn))
    val edges = journey.select(col("src"), col("event_type").as("dst"))
      .unionByName(journey
        .where(col("nxt").isNull && col("event_type") =!= ConvType)
        .select(col("event_type").as("src"), lit(NullState).as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .cut()
    val outW = edges.groupBy("src").agg(sum("w").as("outw"))
    val lanes = edges.select(col("src").as("rm"))
      .where(col("rm") =!= Start).distinct()
      .unionByName(s.range(1).select(lit(NoRemoval).as("rm")))
    val nodes = edges.select(col("src").as("node")).distinct()

    // (rm, src, dst, w, outw) product — alphabet-sized
    val fan = edges.join(outW, "src").crossJoin(lanes).cut()

    var reach = lanes.crossJoin(nodes).withColumn("reach", lit(0L))
      .cut()
    for (_ <- 1 to MarkovRounds) {
      val p = reach.select(col("rm").as("prm"), col("node").as("pnode"),
        col("reach").as("preach"))
      reach = fan
        .join(p, col("rm") === col("prm") && col("dst") === col("pnode"),
          "left_outer")
        .select(col("rm"), col("src"), col("outw"),
          (col("w") * when(col("dst") === ConvType, lit(Ppm))
            .when(col("dst") === NullState, lit(0L))
            .when(col("dst") === col("rm"), lit(0L))
            .otherwise(coalesce(col("preach"), lit(0L)))).as("wv"))
        .groupBy("rm", "src")
        .agg(sum("wv").as("acc"), first("outw").as("outw"))
        .select(col("rm"), col("src").as("node"),
          when(col("src") === col("rm"), lit(0L))
            .otherwise(expr("acc div outw")).as("reach"))
        .cut()
    }
    val base = reach
      .where(col("rm") === NoRemoval && col("node") === Start)
      .select(col("reach").as("base_reach_ppm"))
    reach.where(col("rm") =!= NoRemoval && col("node") === Start)
      .select(col("rm").as("channel"), col("reach").as("removed_reach_ppm"))
      .crossJoin(broadcast(base))
      .select(col("channel"), col("base_reach_ppm"),
        col("removed_reach_ppm"),
        (col("base_reach_ppm") - col("removed_reach_ppm"))
          .as("removal_effect_ppm"))
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_markov_attribution" -> (q221MarkovAttribution _))

  /** One unrolled reach round over the (rm × node) product. */
  private def roundSql(k: Int): String =
    s"""r$k AS MATERIALIZED (
       | SELECT c.rm, c.node,
       |  CAST(CASE WHEN c.node = c.rm THEN 0
       |       ELSE c.acc // c.outw END AS BIGINT) AS reach
       | FROM (
       |  SELECT f.rm, f.src AS node, f.outw,
       |   sum(f.w * (CASE WHEN f.dst = '$ConvType' THEN $Ppm
       |     WHEN f.dst = '$NullState' THEN 0
       |     WHEN f.dst = f.rm THEN 0
       |     ELSE coalesce(p.reach, 0) END)) AS acc
       |  FROM fan f
       |  LEFT JOIN r${k - 1} p ON p.rm = f.rm AND p.node = f.dst
       |  GROUP BY 1, 2, 3) c)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q221_markov_attribution" -> {
      val rounds = (1 to MarkovRounds).map(roundSql).mkString(",\n")
      s"""WITH ev AS (
         | SELECT user_id, event_id, event_type,
         |  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |rn AS (
         | SELECT user_id, event_type,
         |  row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
         |   AS rn
         | FROM ev),
         |fc AS (SELECT user_id, min(rn) AS crn FROM rn
         |       WHERE event_type = '$ConvType' GROUP BY 1),
         |j AS (
         | SELECT rn.user_id, rn.event_type,
         |  coalesce(lag(rn.event_type) OVER w, '$Start') AS src,
         |  lead(rn.event_type) OVER w AS nxt
         | FROM rn LEFT JOIN fc USING (user_id)
         | WHERE fc.crn IS NULL OR rn.rn <= fc.crn
         | WINDOW w AS (PARTITION BY rn.user_id ORDER BY rn.rn)),
         |e AS MATERIALIZED (
         | SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
         |  SELECT src, event_type AS dst FROM j
         |  UNION ALL
         |  SELECT event_type AS src, '$NullState' AS dst FROM j
         |  WHERE nxt IS NULL AND event_type <> '$ConvType')
         | GROUP BY 1, 2),
         |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1),
         |lanes AS (SELECT DISTINCT src AS rm FROM e WHERE src <> '$Start'
         |          UNION ALL SELECT '$NoRemoval'),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |fan AS MATERIALIZED (
         | SELECT lanes.rm, e.src, e.dst, e.w, ow.outw
         | FROM e JOIN ow USING (src) CROSS JOIN lanes),
         |r0 AS (SELECT lanes.rm, nodes.node, CAST(0 AS BIGINT) AS reach
         |       FROM lanes CROSS JOIN nodes),
         |$rounds
         |SELECT c.rm AS channel, b.reach AS base_reach_ppm,
         | c.reach AS removed_reach_ppm,
         | b.reach - c.reach AS removal_effect_ppm
         |FROM r$MarkovRounds c
         |CROSS JOIN (SELECT reach FROM r$MarkovRounds
         |            WHERE rm = '$NoRemoval' AND node = '$Start') b
         |WHERE c.rm <> '$NoRemoval' AND c.node = '$Start'""".stripMargin
    })
}
