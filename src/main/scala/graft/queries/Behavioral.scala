package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Behavioral / clickstream analytics over the events table — the
  * sessionize → funnel → retention triad every event-analytics engine
  * ships. All three are windowed or join-reduced aggregations whose
  * shuffles key on `user_id` (the natural partitioning at scale), and
  * all three are DuckDB-oracle-checked.
  */
object Behavioral {

  /** Event time as whole epoch seconds (Long) — the cross-engine-stable
    * unit (micros survive the nanos→micros parquet conversion exactly). */
  private def epochS = unix_timestamp(col("ts"))

  /** Batch sessionization: a gap > `gapMinutes` between a user's
    * consecutive events opens a new session (the batch analog of the
    * streaming `session_window` in Ingest.sessionAggregate). Classic
    * lag → is-new-flag → running-sum session index; one shuffle on
    * user_id serves both windows. */
  def q71Sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), epochS.as("es"))
      .withColumn("new_sess",
        when(col("es") - lag("es", 1).over(byUser) > gapMinutes * 60L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("es").as("start_s"), max("es").as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
  }

  /** Ordered conversion funnel view → click → purchase: each stage's
    * timestamp must strictly follow the previous stage's FIRST completion
    * (min-ts semantics — the standard "first touch" funnel). Three grouped
    * aggregations joined on user_id (AQE broadcasts when small); one row. */
  def q72Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), epochS.as("es"))
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("es").as("f1"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id").where(col("es") > col("f1"))
      .groupBy("user_id").agg(min("es").as("f2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("es") > col("f2"))
      .groupBy("user_id").agg(min("es").as("f3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
  }

  /** Daily cohort retention: users grouped by their FIRST activity day;
    * retained = any event within days 1..7 after it. Two aggregations
    * joined on user_id — never a per-day scan of history. */
  def q73Retention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = e.groupBy("user_id").agg(min("d").as("cohort_day"))
    val retained = e.join(cohorts, "user_id")
      .where(col("d") > col("cohort_day") &&
        col("d") <= date_add(col("cohort_day"), 7))
      .select("user_id").distinct()
      .withColumn("retained", lit(1L))
    cohorts.join(retained, Seq("user_id"), "left")
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("retained"), lit(0L))).as("n_retained_7d"))
  }

  /** q142 — event-type co-occurrence with pointwise mutual information:
    * which behaviors happen to the SAME user more (or less) often than
    * independence predicts — the association-mining signal behind
    * market-basket analysis and feature co-occurrence audits.
    *
    * Scale shape: the only corpus-wide shuffle is the distinct
    * (user, type) reduction on user_id; pair generation then happens
    * per user over that user's distinct-type SET, whose size is bounded
    * by the type alphabet (not by event volume), so the "self-join" is
    * a bounded per-key flatMap, never an unbounded pair explosion. PMI
    * is kept cross-engine-exact the micro-nat way: both engines divide
    * the SAME two integer products in double, take one `ln`, and round
    * to integer micro-nats. */
  def q142CooccurrencePmi(s: SparkSession, dir: String): DataFrame =
    q142CooccurrencePmiOn(Tables.events(s, dir))

  /** [[q142CooccurrencePmi]] over any (user_id, event_type, …) frame —
    * exposed for planted-signal specs. */
  def q142CooccurrencePmiOn(events: DataFrame): DataFrame = {
    // the ONE corpus-wide shuffle: per-user sorted distinct-type sets
    // (collect_set dedups, so no separate distinct pass). The cached
    // frame backs all three consumers of the returned plan — pair
    // counts, single counts, and N (the count() that materializes it);
    // releasing it before the caller's action (the DistCumSum pattern)
    // would instead recompute the corpus shuffle per consumer subtree.
    // One row per user with a type-alphabet-bounded array, and Spark
    // caches spill — session-lifetime residency is the cheaper side.
    val sets = events
      .groupBy("user_id")
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
      .cache()
    val nUsers = sets.count()
    val typeCounts = sets.select(explode(col("ts")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("c_single"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(ts, (a, i) ->
          |  transform(slice(ts, i + 2, size(ts)),
          |            b -> named_struct('a', a, 'b', b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("c_pair"))
    pairs
      .join(broadcast(typeCounts.select(col("event_type").as("type_a"),
        col("c_single").as("c_a"))), "type_a")
      .join(broadcast(typeCounts.select(col("event_type").as("type_b"),
        col("c_single").as("c_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("c_a"), col("c_b"), col("c_pair"),
        round(log((col("c_pair") * nUsers).cast("double") /
          (col("c_a") * col("c_b")).cast("double")) * 1e6, 0).cast("long")
          .as("pmi_micro"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_cooccurrence_pmi" -> (q142CooccurrencePmi _),
    "q71_sessionize" -> ((s: SparkSession, d: String) => q71Sessionize(s, d)),
    "q72_funnel" -> (q72Funnel _),
    "q73_retention" -> (q73Retention _))

  val oracles: Map[String, String] = Map(
    "q142_cooccurrence_pmi" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT count(DISTINCT user_id) AS nu FROM events),
        |tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c_single
        |       FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       CAST(count(*) AS BIGINT) AS c_pair
        |      FROM ut a JOIN ut b
        |       ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, ca.c_single AS c_a, cb.c_single AS c_b, c_pair,
        | CAST(round(ln(CAST(c_pair * nu AS DOUBLE)
        |   / CAST(ca.c_single * cb.c_single AS DOUBLE)) * 1000000.0, 0)
        |  AS BIGINT) AS pmi_micro
        |FROM p JOIN tc ca ON p.type_a = ca.event_type
        | JOIN tc cb ON p.type_b = cb.event_type CROSS JOIN n""".stripMargin,
    "q71_sessionize" ->
      """WITH t AS (
        | SELECT user_id, event_id,
        |  CAST(floor(epoch_ms(ts)/1000) AS BIGINT) AS es
        | FROM events),
        |flagged AS (
        | SELECT user_id, event_id, es,
        |  CASE WHEN es - lag(es, 1) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        | FROM t WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |sessions AS (
        | SELECT user_id, es,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        | FROM flagged)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        | count(*) AS n_events, min(es) AS start_s, max(es) AS end_s,
        | max(es) - min(es) AS duration_s
        |FROM sessions GROUP BY user_id, session_idx""".stripMargin,
    "q72_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, CAST(floor(epoch_ms(ts)/1000) AS BIGINT) AS es
        | FROM events),
        |v AS (SELECT user_id, min(es) AS f1 FROM e WHERE event_type='view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(es) AS f2 FROM e JOIN v USING (user_id)
        |      WHERE event_type='click' AND es > f1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(es) AS f3 FROM e JOIN c USING (user_id)
        |      WHERE event_type='purchase' AND es > f2 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_after,
        |       (SELECT count(*) FROM p) AS n_purchase_after""".stripMargin,
    "q73_retention" ->
      """WITH e AS (
        | SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |cohorts AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id),
        |retained AS (
        | SELECT DISTINCT e.user_id FROM e JOIN cohorts USING (user_id)
        | WHERE e.d > cohort_day AND e.d <= cohort_day + INTERVAL 7 DAY)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        | count(*) AS n_users,
        | CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained_7d
        |FROM cohorts c LEFT JOIN retained r ON c.user_id = r.user_id
        |GROUP BY 1""".stripMargin)
}
