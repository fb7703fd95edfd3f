package graft.queries

import graft.SparkTestBase

/** q153 behavioral contract (rows-only — deflate byte counts have no
  * cross-engine oracle): redundant text compresses far below diverse
  * text, the ratio orders corpora by redundancy, and degenerate rows
  * (null/empty) are excluded rather than dividing by zero. */
class CompressionSignalSpec extends SparkTestBase {
  import spark.implicits._

  // incompressible-ish filler: chained md5 hex (no repeated structure)
  private def noise(seed: String, n: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Iterator.iterate(seed)(s =>
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .drop(1).take(n).mkString(" ")
  }

  test("ratio orders redundancy: boilerplate < half-repeated < noise") {
    val docs = Seq(
      (0L, "all work and no play " * 200),            // pure boilerplate
      (1L, noise("a", 20) + " " + (noise("a", 20) + " ") * 9), // same block ×10
      (2L, noise("b", 200)),                          // diverse
      (3L, ""),                                       // excluded: empty
      (4L, null.asInstanceOf[String]))                // excluded: null
      .toDF("doc_id", "text")
    val out = Curation.q153CompressionSignalOn(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L), s"degenerate rows leaked: ${out.keySet}")
    val (r0, r1, r2) = (out(0L)._2, out(1L)._2, out(2L)._2)
    assert(r0 < 0.1, s"boilerplate ratio $r0 not tiny")
    assert(r2 > 0.4, s"noise ratio $r2 not high")
    assert(r0 < r1 && r1 < r2, s"ordering violated: $r0, $r1, $r2")
    // deflate never exceeds input + small header on these sizes
    assert(out.values.forall(_._2 < 1.2))
  }
}
