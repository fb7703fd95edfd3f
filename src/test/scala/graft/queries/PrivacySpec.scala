package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy / release-gate family (q175–q177): the DP release against
  * its mechanism contract (released = max(0, n + noise), noise the
  * seeded discrete Laplace, bit-reproducible), l-diversity against
  * hand-built classes, and PSI against a hand-computed value plus the
  * planted-shift discrimination both ways. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, Long)]): DataFrame =
    rows.map { case (id, src, lang, nc) => (id, s"t$id", lang, src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // --- q175 DP release ----------------------------------------------

  test("q175: released = max(0, n + noise) and the release is reproducible") {
    val d = docs((1L to 40L).map(i =>
      (i, if (i % 2 == 0) "web" else "books", if (i % 3 == 0) "de" else "en", 100L)))
    val r1 = Privacy.q175DpReleaseOn(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(r1.nonEmpty)
    r1.foreach { case (_, _, n, noise, released) =>
      assert(released == math.max(0L, n + noise))
    }
    // pure function of the key: a second run (fresh plan) is bit-identical
    val r2 = Privacy.q175DpReleaseOn(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(r1.sortBy(t => (t._1, t._2)).toSeq == r2.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("q175: noise equals the driver-side inverse-CDF replica per key") {
    val d = docs((1L to 30L).map(i => (i, s"s${i % 7}", "en", 50L)))
    def geo(salt: String, key: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val m = java.lang.Long.parseLong(md5.substring(0, 8), 16) % 1000000L
      val l2max = math.round(math.log(1000000.0) / math.log(2.0) * 1e6)
      val l2x = math.round(math.log((1000000L - m).toDouble) / math.log(2.0) * 1e6)
      (l2max - l2x) / 1000000L
    }
    Privacy.q175DpReleaseOn(d).collect().foreach { r =>
      val key = s"${r.getString(0)}|${r.getString(1)}"
      val expected = geo("dpA:", key) - geo("dpB:", key)
      assert(r.getLong(3) == expected, s"noise mismatch for $key")
    }
  }

  // --- q176 l-diversity ---------------------------------------------

  test("q176: homogeneous class flags at l=1, diverse class does not") {
    // QI class (nat=1, bal_k=0): 3 members, ALL segment A  -> l=1 at risk
    // QI class (nat=2, bal_k=0): 3 members, segments A,B,C -> l=3 safe
    // QI class (nat=3, bal_k=5): 2 members, segments A,B   -> l=2 at risk
    val cust = Seq(
      (1L, 1L, "A", 100.0), (2L, 1L, "A", 200.0), (3L, 1L, "A", 300.0),
      (4L, 2L, "A", 100.0), (5L, 2L, "B", 200.0), (6L, 2L, "C", 300.0),
      (7L, 3L, "A", 5100.0), (8L, 3L, "B", 5900.0)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Privacy.q176LDiversityOn(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, 1L, 3L, true),   // one l=1 class of 3 rows
      (3L, 1L, 3L, false),  // one l=3 class of 3 rows
      (2L, 1L, 2L, true)))  // one l=2 class of 2 rows
  }

  // --- q177 PSI split drift -----------------------------------------

  /** Driver-side PSI replica with the same integer scheme. */
  private def psiReplica(c: Seq[Long], d: Seq[Long]): (Seq[Long], Long) = {
    val cs = c.map(_ + 1); val ds = d.map(_ + 1)
    val np = cs.sum; val nq = ds.sum
    def ln6(x: Long) = math.round(math.log(x.toDouble) * 1e6)
    val terms = cs.zip(ds).map { case (ci, di) =>
      val num = (BigInt(ci) * nq - BigInt(di) * np) *
        BigInt(ln6(ci) - ln6(np) - ln6(di) + ln6(nq))
      val clamped = num.max(BigInt(0))
      (clamped / (BigInt(np) * nq)).toLong
    }
    (terms, terms.sum)
  }

  test("q177: hash split is stable, planted length-shifted holdout is not") {
    // lengths spread across bins; the hash split should mix them evenly.
    // PSI needs a non-trivial holdout mass: at 5000 docs the ~10%
    // holdout holds ~50 docs per bin, putting sampling noise well under
    // the 0.1 stability line (at 400 docs the metric CORRECTLY reports
    // the 40-doc holdout as unstable — that is PSI working, not noise)
    val stable = docs((1L to 5000L).map(i => (i, "web", "en", (i % 10) * 500L + 10L)))
    val psiStable = Privacy.q177PsiSplitDriftOn(stable)
      .select("psi_micro").as[Long].head()

    // adversarial frame: same docs, but n_chars rewritten so that the
    // ~10% holdout side (by the q98 hash) sits in DIFFERENT bins than
    // train — the distribution shift a time-ordered split causes
    val pct = pmod(conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(100))
    val shifted = stable.withColumn("n_chars",
      when(pct < 90, (col("doc_id") % 3) * 500L + 10L)   // train: bins 0-2
        .otherwise((col("doc_id") % 3) * 500L + 3510L))  // holdout: bins 7-9
    val psiShifted = Privacy.q177PsiSplitDriftOn(shifted)
      .select("psi_micro").as[Long].head()

    // PSI convention: < 0.1 stable, > 0.25 action required
    assert(psiStable < 100000L, s"hash split PSI=$psiStable should be < 0.1")
    assert(psiShifted > 250000L, s"shifted PSI=$psiShifted should be > 0.25")
  }

  test("q177: per-bin terms and total equal the driver-side integer replica") {
    val d = docs((1L to 120L).map(i => (i, "web", "en", (i % 7) * 600L + 5L)))
    val rows = Privacy.q177PsiSplitDriftOn(d)
      .orderBy("bin").collect()
    val cTrain = rows.map(_.getLong(1)).toSeq
    val cHold = rows.map(_.getLong(2)).toSeq
    val (terms, total) = psiReplica(cTrain, cHold)
    assert(rows.map(_.getLong(3)).toSeq == terms)
    assert(rows.map(_.getLong(4)).distinct.toSeq == Seq(total))
    assert(rows.length == Privacy.PsiBins)
  }

  test("q240: a uniform grid splits into balanced k-sized classes") {
    import spark.implicits._
    // 4 x 10 grid, one row per cell, k=10 -> 4 classes of exactly 10
    val rows = (for (a <- 1L to 4L; b <- 1L to 10L) yield (a, b))
      .toDF("q1", "q2")
    val got = Privacy.mondrianOn(spark, rows, 10).collect()
    assert(got.length == 4, s"classes: ${got.length}")
    assert(got.map(_.getLong(5)).forall(_ == 10L))
    assert(got.map(_.getLong(5)).sum == 40L)
  }

  test("q240: every class meets k on the real table; mass conserved") {
    val dir = "/root/testdata/sf0.001"
    val got = Privacy.q240MondrianKAnon(spark, dir).collect()
    val total = graft.sources.Tables.customer(spark, dir).count()
    assert(got.map(_.getLong(5)).sum == total)
    assert(got.forall(_.getLong(5) >= Privacy.MondrianK),
      s"class below k: ${got.filter(_.getLong(5) < Privacy.MondrianK).toList}")
    // classes must not overlap on the split structure: ids unique
    assert(got.map(_.getLong(0)).distinct.length == got.length)
  }

  test("q240: identical QIs and k > n both collapse to one class") {
    import spark.implicits._
    val same = Seq.fill(25)((7L, 7L)).toDF("q1", "q2")
    val one = Privacy.mondrianOn(spark, same, 10).collect()
    assert(one.length == 1 && one.head.getLong(5) == 25L)
    val tiny = (1L to 5L).map(i => (i, i)).toDF("q1", "q2")
    val leaf = Privacy.mondrianOn(spark, tiny, 10).collect()
    assert(leaf.length == 1 && leaf.head.getLong(5) == 5L)
  }
}
