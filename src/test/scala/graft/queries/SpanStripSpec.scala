package graft.queries

import graft.SparkTestBase

/** q150 semantics pinned on a planted fixture: canonical-first-occurrence
  * survival, cross-doc and intra-doc removal, sub-SpanK docs untouched,
  * full-doc elimination, null-text exclusion. (The DuckDB oracle checks
  * the same query on the real corpus; this spec makes the RULES legible.) */
class SpanStripSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicate spans keep their first (doc_id, position) occurrence only") {
    val docs = Seq(
      (0L, "a b c d e f g h X1 X2"),             // canonical holder of a..h
      (1L, "y1 a b c d e f g h y2"),              // later copy: span cut
      (2L, "a b c d e f g h"),                    // the whole doc IS the span
      (3L, "p q r s t u v w"),                    // unique 8 tokens
      (4L, "m1 m2 m3 m4 m5"),                     // shorter than SpanK
      (5L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"), // intra-doc repeat
      (6L, null.asInstanceOf[String]))            // excluded
      .toDF("doc_id", "text")
    val out = Curation.q150SpanStripOn(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out.size == 6, "null-text doc must be excluded")
    assert(out(0L) == ((10, 10, 0, "a b c d e f g h X1 X2")))
    assert(out(1L) == ((10, 2, 8, "y1 y2")))
    assert(out(2L) == ((8, 0, 8, "")))
    assert(out(3L) == ((8, 8, 0, "p q r s t u v w")))
    assert(out(4L) == ((5, 5, 0, "m1 m2 m3 m4 m5")))
    assert(out(5L) == ((16, 8, 8, "r1 r2 r3 r4 r5 r6 r7 r8")))
  }

  test("overlapping duplicated spans compose: removal is the union of covers") {
    // w1..w9 repeats: the 9-token region yields TWO overlapping dup
    // spans (pos 1..8 and 2..9 of the repeat); all 9 tokens must go
    val nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val docs = Seq(
      (0L, s"$nine END"),
      (1L, s"HEAD $nine"))
      .toDF("doc_id", "text")
    val out = Curation.q150SpanStripOn(docs)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(4))).toMap
    assert(out(0L) == ((10, s"$nine END")))
    assert(out(1L) == ((1, "HEAD")))
  }
}
