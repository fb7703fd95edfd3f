package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.sources.Tables

/** Incremental materialized-view maintenance — the operation that
  * turns a 100 TB nightly recompute into a delta-sized one. q215
  * maintains a per-(event_type, day) summary (count / sum / min / max)
  * under a batch of inserts AND row deletions without re-reading the
  * base table's clean keys:
  *
  *   - count and sum are retractable — the delta merges in as `+n_i −
  *     n_d` on the aggregate alone;
  *   - min and max are NOT retractable under deletes (removing the
  *     minimum row invalidates the stored min) — so the engine
  *     recomputes them ONLY for the dirty keys (keys that lost rows),
  *     restricted by a broadcast semi-join. Clean keys take
  *     `least/greatest` of the stored and inserted extrema.
  *
  * At scale the delta touches a vanishing fraction of keys, so the
  * recompute leg reads a vanishing fraction of the base — with
  * date-partitioned storage the semi-join prunes to the dirty
  * partitions (the q97 partition-filter discipline). The correctness
  * claim is exactly "incremental ≡ full recompute", and that is
  * literally what the oracle checks: the DuckDB side aggregates the
  * surviving rows from scratch.
  */
object Materialize {

  /** q215 — incremental agg maintenance over a deterministic
    * base/insert/delete split of the events table: md5 bucket 9 of 10
    * is the insert batch, and base rows drawn by a second salt (1 in
    * 7) are the deletion batch. Survivor state = base − deletes +
    * inserts; the engine produces its summary incrementally, the
    * oracle by full recompute. */
  def q215IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.events(s, dir).select(
      col("event_id"), col("event_type"), to_date(col("ts")).as("d"),
      expr("cast(round(value * 100) as bigint)").as("cents"),
      T.hashMod("mv:", col("event_id"), 10).as("split"))
    val base = r.where(col("split") < 9)
    incrementalAggOn(
      base,
      r.where(col("split") === 9),
      base.where(T.hashMod("mvdel:", col("event_id"), 7) === 0))
  }

  /** [[q215IncrementalAgg]] over any (event_id, event_type, `d` date,
    * `cents`) base/insert/delete frames (deletes ⊆ base by event_id) —
    * exposed for the hand-computed spec. */
  def incrementalAggOn(base: DataFrame, ins: DataFrame,
      del: DataFrame): DataFrame = {
    val keys = Seq("event_type", "d")
    def summarize(df: DataFrame, p: String) = df.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as(s"n_$p"), sum("cents").as(s"s_$p"),
        min("cents").as(s"m_$p"), max("cents").as(s"x_$p"))
    val baseAgg = summarize(base, "b")
    val insAgg = summarize(ins, "i")
    val delAgg = del.groupBy(keys.head, keys.tail: _*)
      .agg(count(lit(1)).as("n_d"), sum("cents").as("s_d"))

    // retractable aggregates: pure merge, no base re-read
    val merged = baseAgg.join(insAgg, keys, "full_outer")
      .join(delAgg, keys, "left_outer")
      .select(col("event_type"), col("d"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_i"), lit(0L))
          - coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_i"), lit(0L))
          - coalesce(col("s_d"), lit(0L))).as("sum_cents"),
        // least/greatest skip nulls: a key present on one side only
        // takes that side's extremum
        least(col("m_b"), col("m_i")).as("min_clean"),
        greatest(col("x_b"), col("x_i")).as("max_clean"),
        col("n_d").isNotNull.as("dirty"))

    // non-retractable aggregates: recompute ONLY the dirty keys from
    // the surviving rows (base minus deleted rows, plus inserts)
    val dirtyKeys = delAgg.select(keys.head, keys.tail: _*)
    val dirtyMinMax = base.join(del.select("event_id"), Seq("event_id"),
        "left_anti")
      .unionByName(ins)
      .join(broadcast(dirtyKeys), keys, "left_semi")
      .groupBy(keys.head, keys.tail: _*)
      .agg(min("cents").as("min_dirty"), max("cents").as("max_dirty"))

    merged.where(col("n") > 0)
      .join(dirtyMinMax, keys, "left_outer")
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("n"), col("sum_cents"),
        when(col("dirty"), col("min_dirty")).otherwise(col("min_clean"))
          .as("min_cents"),
        when(col("dirty"), col("max_dirty")).otherwise(col("max_clean"))
          .as("max_cents"))
  }

  // ------------------------------------------------------------ registry

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_incremental_agg" -> (q215IncrementalAgg _))

  val oracles: Map[String, String] = Map(
    "q215_incremental_agg" ->
      """WITH r AS (
        | SELECT event_id, event_type, CAST(ts AS DATE) AS d,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  ('0x' || substr(md5('mv:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 10 AS split
        | FROM events),
        |surv AS (
        | SELECT * FROM r WHERE split = 9
        | UNION ALL
        | SELECT * FROM r WHERE split < 9 AND
        |  ('0x' || substr(md5('mvdel:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 7 <> 0)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS d,
        | CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        | min(cents) AS min_cents, max(cents) AS max_cents
        |FROM surv GROUP BY 1, 2""".stripMargin)
}
