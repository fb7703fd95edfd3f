package graft.queries

import graft.SparkTestBase

/** Markov removal-effect attribution: a hand-simulated chain where the
  * CHOKEPOINT channel (click — every conversion routes through it)
  * must out-earn the more-touched channel (view), the exact opposite
  * of what touch counting says; plus journey truncation at the first
  * conversion. */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  test("q221: chokepoint beats touch count; truncation hides post-conversion events") {
    // u1: click -> purchase (then a post-conversion 'error' that MUST
    //     be truncated away — 'error' may not become a channel)
    // u2: view (no conversion -> NULL)
    // u3: view -> click -> purchase
    // Chain: START->{click:1, view:2}, click->purchase:2,
    //        view->{click:1, NULL:1}
    // Hand-run reach (ppm, floor div): click=1e6, view=5e5,
    //   START=(1e6+2*5e5) div 3 = 666666
    // remove click: everything dies -> 0;  remove view: START=333333
    val ev = Seq(
      (1L, 1L, "click", 10L), (1L, 2L, "purchase", 20L),
      (1L, 7L, "error", 30L),
      (2L, 3L, "view", 10L),
      (3L, 4L, "view", 10L), (3L, 5L, "click", 20L),
      (3L, 6L, "purchase", 30L))
      .toDF("user_id", "event_id", "event_type", "us")
    val got = Attribution.markovAttributionOn(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set("click", "view"),
      s"post-conversion event leaked into the chain: ${got.keySet}")
    assert(got("click") == (666666L, 0L, 666666L), s"click: $got")
    assert(got("view") == (666666L, 333333L, 333333L), s"view: $got")
    assert(got("click")._3 > got("view")._3,
      "chokepoint must out-earn the more-touched channel")
  }

  test("q221: single-path chain attributes everything to its only channel") {
    val ev = Seq((1L, 1L, "click", 1L), (1L, 2L, "purchase", 2L))
      .toDF("user_id", "event_id", "event_type", "us")
    val got = Attribution.markovAttributionOn(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map("click" -> (1000000L, 0L, 1000000L)), s"$got")
  }
}
