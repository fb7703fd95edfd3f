package graft.plans

import org.apache.spark.sql.functions._

/** The native as-of join: exact backward-join semantics on constructed
  * frames (latest-at-or-before, ties included, no-match nulls, null
  * keys), the physical plan actually being [[AsOfJoinExec]], and
  * equivalence with the q75 window composition on real data. */
class AsOfJoinSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def installed(): Unit = AsOfJoinPlan.install(spark)

  test("backward as-of: latest at-or-before wins; ties included; misses null") {
    installed()
    val probes = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
      (2L, 100L, "d"), // key with no right rows at all
      (3L, 100L, "e")) // key whose only right row is later
      .toDF("k", "t", "tag")
    val quotes = Seq(
      (1L, 90L, 11L), (1L, 100L, 12L), (1L, 150L, 13L),
      (3L, 500L, 31L),
      (4L, 10L, 41L)) // right-only key
      .toDF("k2", "t2", "v")
    val got = probes
      .join(quotes, expr("k = k2 AND graft_asof(t, t2)"), "left")
      .select($"tag", $"t2", $"v")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      ("a", Some(100L), Some(12L)), // tie at t=100 included
      ("b", Some(150L), Some(13L)),
      ("c", None, None),            // all right rows are later
      ("d", None, None),
      ("e", None, None)))
  }

  test("forward as-of: earliest at-or-after wins; ties included; misses null") {
    installed()
    val probes = Seq(
      (1L, 50L, "a"),  // earliest later quote is t=90
      (1L, 100L, "b"), // tie at t=100 included
      (1L, 200L, "c"), // all quotes are earlier
      (2L, 100L, "d")) // key with no right rows
      .toDF("k", "t", "tag")
    val quotes = Seq((1L, 90L, 11L), (1L, 100L, 12L), (1L, 150L, 13L))
      .toDF("k2", "t2", "v")
    val got = probes
      .join(quotes, expr("k = k2 AND graft_asof_fwd(t, t2)"), "left")
      .select($"tag", $"t2", $"v")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      ("a", Some(90L), Some(11L)),
      ("b", Some(100L), Some(12L)),
      ("c", None, None),
      ("d", None, None)))
  }

  test("the plan is AsOfJoinExec, not a window or a nested-loop join") {
    installed()
    val l = spark.range(100).select($"id".as("k"), ($"id" * 10).as("t"))
    val r = spark.range(50).select($"id".as("k2"), ($"id" * 7).as("t2"))
    val j = l.join(r, expr("k = k2 AND graft_asof(t, t2)"), "left")
    val plan = j.queryExecution.executedPlan.toString
    // SparkPlan nodeName strips the Exec suffix, so the physical node
    // renders as "AsOfJoin" in the executed plan
    assert(plan.contains("AsOfJoin"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"plan degraded to pair blow-up:\n$plan")
    // and it actually runs
    assert(j.count() == 100L)
  }

  test("null left keys/times emit with nulls; null right rows match nothing") {
    installed()
    val l = Seq((Some(1L), Some(100L), "x"), (None, Some(100L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(50L), 7L), (None, Some(40L), 8L),
      (Some(1L), None, 9L)).toDF("k2", "t2", "v")
    val got = l.join(r, expr("k = k2 AND graft_asof(t, t2)"), "left")
      .select($"tag", $"v").as[(String, Option[Long])].collect().toSet
    assert(got == Set(("x", Some(7L)), ("nullkey", None), ("nulltime", None)))
  }

  test("unsupported shapes are refused and the marker fails loudly") {
    installed()
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 50L)).toDF("k2", "t2")
    // inner join type: not the defined as-of surface
    val inner = l.join(r, expr("k = k2 AND graft_asof(t, t2)"))
    val e = intercept[Exception] { inner.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("graft_asof is a join marker")),
      s"wrong failure: $e")
  }

  test("equivalent to the q75 window composition on real events") {
    installed()
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
    val purch = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), unix_micros($"ts").as("p_us"))
    val native = clicks
      .join(purch, expr("c_user = p_user AND graft_asof(c_us, p_us)"), "left")
      .select($"event_id", $"p_us")
      .as[(Long, Option[Long])].collect().toMap
    // q75's formulation: last purchase ts at-or-before, via one window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Long.MinValue, 0)
    val windowed = ev
      .withColumn("p_ts",
        last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true).over(w))
      .where($"event_type" === "click")
      .select($"event_id", unix_micros($"p_ts"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.size == windowed.size && native.nonEmpty)
    assert(native == windowed)
  }
}
