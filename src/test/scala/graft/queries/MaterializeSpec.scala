package graft.queries

import graft.SparkTestBase
import java.sql.Date

class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private val d1 = Date.valueOf("2024-03-01")
  private val d2 = Date.valueOf("2024-03-02")

  test("q215: dirty keys recompute extrema; clean keys merge; empty keys drop") {
    // key (a, d1): base {1:10, 2:50}, delete row 1 (the min) -> min must
    //   become 50 (stored min 10 is stale) ; insert 3:70 -> max 70
    // key (b, d1): base {4:30}, no deletes, insert 5:5 -> clean merge
    //   min 5 / max 30
    // key (c, d2): base {6:99}, delete row 6 -> key vanishes
    val base = Seq(
      (1L, "a", d1, 10L), (2L, "a", d1, 50L),
      (4L, "b", d1, 30L), (6L, "c", d2, 99L))
      .toDF("event_id", "event_type", "d", "cents")
    val ins = Seq((3L, "a", d1, 70L), (5L, "b", d1, 5L))
      .toDF("event_id", "event_type", "d", "cents")
    val del = base.where($"event_id".isin(1L, 6L))

    val got = Materialize.incrementalAggOn(base, ins, del).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("a", "2024-03-01")) == (2L, 120L, 50L, 70L), s"dirty key: $got")
    assert(got(("b", "2024-03-01")) == (2L, 35L, 5L, 30L), s"clean key: $got")
    assert(got.size == 2, s"deleted-out key survived: $got")
  }

  test("q215: insert-only delta creates a brand-new key") {
    val base = Seq((1L, "a", d1, 10L)).toDF("event_id", "event_type", "d", "cents")
    val ins = Seq((2L, "z", d2, 7L)).toDF("event_id", "event_type", "d", "cents")
    val del = base.limit(0)
    val got = Materialize.incrementalAggOn(base, ins, del).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("z", "2024-03-02")) == (1L, 7L, 7L, 7L))
    assert(got(("a", "2024-03-01")) == (1L, 10L, 10L, 10L))
  }

  test("q215: incremental result equals brute-force recompute on real data") {
    val dir = "/root/testdata/sf0.001"
    val inc = graft.SparkEntry.queries("q215_incremental_agg")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute force: survivors aggregated from scratch
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => T}
    val r = graft.sources.Tables.events(spark, dir).select(
      col("event_id"), col("event_type"),
      date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
      expr("cast(round(value * 100) as bigint)").as("cents"),
      T.hashMod("mv:", col("event_id"), 10).as("split"),
      T.hashMod("mvdel:", col("event_id"), 7).as("delDraw"))
    val surv = r.where(col("split") === 9)
      .unionByName(r.where(col("split") < 9 && col("delDraw") =!= 0))
    val brute = surv.groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        min("cents").as("m"), max("cents").as("x"))
      .collect().map(r0 => (r0.getString(0), r0.getString(1)) ->
        (r0.getLong(2), r0.getLong(3), r0.getLong(4), r0.getLong(5))).toMap
    assert(inc == brute, s"incremental != recompute (${inc.size} vs ${brute.size})")
  }
}
