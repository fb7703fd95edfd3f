package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q233 stable ids: exact equality with the global-window rank on
  * shuffled input, and invariance to the input's physical
  * partitioning (the property that makes the ids stable across
  * cluster layouts). */
class StableIdsSpec extends SparkTestBase {
  import spark.implicits._

  test("ids equal the global rank on adversarially shuffled input") {
    val keys = scala.util.Random.shuffle((1L to 1000L).toList)
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v").repartition(13)
    val got = StableIds.withStableIds(df, col("k"))
      .select("k", "stable_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 1000L).foreach(k => assert(got(k) == k, s"k=$k got ${got(k)}"))
  }

  test("ids are invariant to the input partition count") {
    val rows = (1L to 257L).map(k => (k * 7 % 263, k)).toDF("k", "payload")
    def run(parts: Int) = StableIds
      .withStableIds(rows.repartition(parts), col("k"))
      .select("k", "stable_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(run(1) == run(5) && run(5) == run(64))
    // dense 1..n with no gaps or dups
    assert(run(5).map(_._2) == (1L to 257L).toList)
  }
}
