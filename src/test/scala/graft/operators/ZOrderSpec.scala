package graft.operators

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: both interleave correctness and the property that
  * justifies it — per-file spans stay tight on BOTH dimensions, where a
  * linear sort is tight on one and unbounded on the other. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave is the Morton code (known values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 8).as("z"))
      .as[Long].collect()
    // morton(5=101, 3=011) : a bits at even positions 100011, b bits at
    // odd positions 001101 -> z = 0b011111 = 27+... compute: a=101 ->
    // bits 0,2 set -> z bits 0,4; b=011 -> bits 0,1 set -> z bits 1,3;
    // z = 1 + 16 + 2 + 8 = 27
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("nullable key columns lose no rows; NULL keys rank lowest") {
    val dir = Files.createTempDirectory("zorder_null").toString
    val df = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 5L, "null-a"), (10L, null, "null-b"), (null, null, "null-ab"),
      (1L, 1L, "r1"), (2L, 2L, "r2"), (3L, 3L, "r3"))
      .toDF("a", "b", "tag")
    val ranked = ZOrder.rankNormalize(df, "a", bits = 4)
    assert(ranked.count() == 6L, "rankNormalize must keep every input row")
    // NULLs sort first in the histogram window → rank bucket 0
    assert(ranked.where(col("a").isNull).select("__z_a").as[Long]
      .collect().forall(_ == 0L))
    ZOrder.writeZOrdered(df, "a", "b", s"$dir/z", numFiles = 2)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 6L, "write must keep NULL-keyed rows")
    assert(back.where(col("tag").startsWith("null")).count() == 3L)
  }

  test("z-order layout keeps BOTH dimensions' file spans tight; linear sort does not") {
    val dir = Files.createTempDirectory("zorder").toString
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val nFiles = 16

    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", s"$dir/z", nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def meanSpan(path: String, c: String): Double = {
      val domain = li.agg((max(col(c)) - min(col(c))).cast("double")).as[Double].head()
      val spans = ZOrder.fileSpans(spark.read.parquet(path), c)
        .select(((col("hi") - col("lo")) / domain).as("s")).as[Double].collect()
      spans.sum / spans.length
    }

    val zPart = meanSpan(s"$dir/z", "l_partkey")
    val zSupp = meanSpan(s"$dir/z", "l_suppkey")
    val linPart = meanSpan(s"$dir/linear", "l_partkey")
    val linSupp = meanSpan(s"$dir/linear", "l_suppkey")

    // linear layout: near-perfect on the sort key, useless (~full domain)
    // on the other; z-order: materially tight on BOTH
    assert(linPart < 0.2, s"sanity: linear sort tight on its key ($linPart)")
    assert(linSupp > 0.8, s"sanity: linear sort useless on the other key ($linSupp)")
    assert(zPart < 0.5 && zSupp < 0.5,
      s"z-order must bound both dimensions' spans: part=$zPart supp=$zSupp")
    assert(zPart + zSupp < linPart + linSupp,
      "z-order must beat linear overall")
  }
}
