package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ORC and JSON-lines round-trips: values survive, and the ORC path
  * keeps the columnar contract (partition pruning + predicate pushdown)
  * that makes it a legitimate landing-zone format. */
class OrcJsonRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta", "en", 10L),
    (2L, "gamma delta", "fr", 11L),
    (3L, "epsilon zeta", "en", 12L)).toDF("doc_id", "text", "lang", "n_chars")

  test("ORC round-trip preserves values; lang partitions prune; filters push") {
    val dir = Files.createTempDirectory("orc_rt").toString
    Sinks.orc(docs, dir, partitionBy = Seq("lang"))
    val back = Sources.orc(spark, dir)
    assert(back.select("doc_id", "text", "n_chars").as[(Long, String, Long)]
      .collect().toSet ==
      docs.select("doc_id", "text", "n_chars").as[(Long, String, Long)]
        .collect().toSet)
    val pruned = back.where(col("lang") === "en" && col("n_chars") > 10L)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p.take(600))
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"),
      p.take(600))
    assert(pruned.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("JSON-lines round-trip under an explicit schema; junk rows quarantine") {
    val dir = Files.createTempDirectory("json_rt").toString
    Sinks.jsonLines(docs, dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    // corrupt-col-only queries on raw JSON are disallowed — cache the
    // parsed frame first (the documented pattern)
    val back = Sources.jsonLines(spark, dir, schema).cache()
    back.count()
    assert(back.where(col("_corrupt_record").isNotNull).isEmpty)
    assert(back.select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet ==
      docs.as[(Long, String, String, Long)].collect().toSet)

    // a malformed line lands intact in the quarantine column, not dropped
    val junkDir = Files.createTempDirectory("json_junk").toString
    Files.write(java.nio.file.Paths.get(junkDir, "part-0.json"),
      "{\"doc_id\": 9, \"text\": \"ok\", \"lang\": \"en\", \"n_chars\": 2}\nnot json at all\n"
        .getBytes("UTF-8"))
    val audited = Sources.jsonLines(spark, junkDir, schema).cache()
    assert(audited.where(col("_corrupt_record").isNotNull).count() == 1)
    assert(audited.where(col("_corrupt_record").isNull)
      .select("doc_id").as[Long].collect().toSeq == Seq(9L))
  }
}
