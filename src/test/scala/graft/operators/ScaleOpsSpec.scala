package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** 90% of fact rows share one key — the classic skew shape. */
  private def skewed() = {
    val fact = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"w$i"))).toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    (fact, dim)
  }

  test("salted join returns exactly the plain join's rows") {
    val (fact, dim) = skewed()
    val plain = fact.join(dim, "k")
      .select($"k", $"payload", $"name").as[(Long, String, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", buckets = 8)
      .select(fact("k"), $"payload", $"name").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("salted count matches exact counts") {
    val (fact, _) = skewed()
    val exact = fact.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = SkewJoin.saltedCount(fact, $"k", buckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted == exact)
  }
}

class ApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL distinct estimate within 5% of exact; approx p50 near median") {
    val df = (1 to 20000).map(i => (i % 2357, i * 0.5)).toDF("id", "v")
    val exact = df.select(countDistinct($"id")).as[Long].collect().head
    val approx = df.select(approx_count_distinct($"id", 0.01)).as[Long].collect().head
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
    val p50 = df.select(percentile_approx($"v", lit(0.5), lit(10000)))
      .as[Double].collect().head
    assert(math.abs(p50 - 5000.0) < 100)
  }
}

/** Bucketed tables join without a shuffle — the co-located-join scale
  * pattern (pre-shuffle once at write time, join for free forever). */
class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      a.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/ta").mode("overwrite").saveAsTable("ta")
      b.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/tb").mode("overwrite").saveAsTable("tb")
      val joined = spark.table("ta").join(spark.table("tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ta")
      spark.sql("DROP TABLE IF EXISTS tb")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
