package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistCumSumSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("matches the single-partition global window on a skewed histogram") {
    // heavy skew + gaps: value v appears ~v%7+1 times in the base data
    val hist = (1 to 5000).map(v => (v.toLong * 13 % 9973, (v % 7 + 1).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
      .toDF("k", "c")
    val want = hist.withColumn("cum", sum("c").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = DistCumSum.overDomain(hist, "k", "c")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("string keys use sampled cuts and match the global window") {
    val hist = (1 to 500).map(v => (f"k${v * 13 % 997}%04d", (v % 5 + 1).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
      .toDF("k", "c")
    val want = hist.withColumn("cum", sum("c").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(String, Long)].collect().sortBy(_._1).toSeq
    val got = DistCumSum.overDomain(hist, "k", "c")
      .select("k", "cum").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("randomized sweep: 20 adversarial histograms match the global window") {
    val rnd = new scala.util.Random(2026L)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(400)
      // adversarial domains: negatives, clustered values, huge gaps
      val keys = Seq.fill(n * 2)(rnd.nextInt(5) match {
        case 0 => rnd.nextInt(10).toLong - 5          // dense cluster
        case 1 => rnd.nextLong() % 1000000007L        // wide spread, negatives
        case _ => (rnd.nextInt(50) * 1000003).toLong  // regular gaps
      }).distinct.take(n)
      val hist = keys.map(k => (k, (math.abs(k) % 9 + 1))).toDF("k", "c")
      val want = hist.withColumn("cum", sum("c").over(
          Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
      val got = DistCumSum.overDomain(hist, "k", "c")
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"trial $trial (n=$n) diverged")
    }
  }

  test("null key gets the lowest rank; plan has no unpartitioned window") {
    val hist = Seq((Some(5L), 2L), (None, 3L), (Some(1L), 1L))
      .toDF("k", "c")
    val out = DistCumSum.overDomain(hist, "k", "c")
    val rows = out.select("k", "cum").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toMap
    assert(rows(-1L) == 3L) // null first
    assert(rows(1L) == 4L)
    assert(rows(5L) == 6L)
    val plan = out.queryExecution.executedPlan.toString
    // the whole point: every Window node must carry a partition spec
    assert(!plan.contains("windowspecdefinition(k"),
      s"unpartitioned window survived:\n$plan")
  }
}
