package graft.queries

import graft.SparkTestBase

/** Behavioral invariants for q142 co-occurrence/PMI beyond the DuckDB
  * oracle equivalence the driver checks. */
class BehavioralSpec extends SparkTestBase {

  test("q142: planted association is positive, planted avoidance negative, counts exact") {
    import spark.implicits._
    // 40 users: 1-20 always pair x+y (associated); z appears for 21-40
    // only (never with x/y); w appears for everyone (independent-ish)
    val rows =
      (1 to 20).flatMap(u => Seq((u.toLong, "x"), (u.toLong, "y"), (u.toLong, "w"))) ++
      (21 to 40).flatMap(u => Seq((u.toLong, "z"), (u.toLong, "w")))
    val out = Behavioral.q142CooccurrencePmiOn(rows.toDF("user_id", "event_type"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // never-co-occurring pairs emit no row at all
    assert(!out.contains(("x", "z")) && !out.contains(("y", "z")))
    // x+y: c_pair = c_a = c_b = 20, N = 40 -> PMI = ln(40*20/400) = ln 2
    val (ca, cb, cp, pmi) = out(("x", "y"))
    assert((ca, cb, cp) == (20L, 20L, 20L))
    assert(pmi == math.round(math.log(2.0) * 1e6))
    // w co-occurs with everything it can: PMI(w, x) = ln(40*20/(40*20)) = 0
    assert(out(("w", "x"))._4 == 0L)
    // z only within its half: PMI(w, z) = ln(40*20/(40*20)) = 0
    assert(out(("w", "z"))._4 == 0L)
  }

  test("q142: duplicate events do not inflate counts (distinct user-type)") {
    import spark.implicits._
    val rows = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val out = Behavioral.q142CooccurrencePmiOn(rows.toDF("user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(out.toSeq == Seq(("x", "y", 2L)))
  }
}
