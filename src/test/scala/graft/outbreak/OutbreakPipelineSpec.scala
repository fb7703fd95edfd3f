package graft.outbreak

import java.sql.Date

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden end-to-end test (SURVEY §5.2): a deterministic synthetic
  * data.csv-shaped fixture with a planted multi-term outbreak must come out
  * the other end as the flagged anomaly, in the reference's output shape
  * `(date, region, score)`. */
class OutbreakPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val terms = Seq("Influenza", "Common cold", "Sore throat", "Fever")

  /** 2 regions × 4 terms × 120 days of deterministic seasonal-ish signal;
    * days 100-104 in region US spike 8× across all terms (the outbreak). */
  private def fixture() = {
    val rows = for {
      region <- Seq("US", "IL")
      term <- terms
      day <- 1 to 120
    } yield {
      val base = 40.0 + 10.0 * math.sin(day / 9.0 + term.length) +
        (if (region == "US") 5.0 else -3.0)
      val spike = if (region == "US" && day >= 100 && day <= 104) 8.0 else 1.0
      (Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(day - 1)),
        term, region, base * spike)
    }
    rows.toDF("date", "kw", "region", "value")
  }

  test("planted outbreak days are exactly the |z|>2 anomalies, in US only") {
    val out = OutbreakPipeline.anomalies(spark, fixture(), terms, seed = 1L)
      .select(date_format($"date", "yyyy-MM-dd"), $"region")
      .as[(String, String)].collect().toSet
    val outbreakDays = (100 to 104).map(d =>
      java.time.LocalDate.of(2020, 1, 1).plusDays(d - 1).toString).toSet
    assert(out.nonEmpty)
    assert(out.forall(_._2 == "US"), s"non-US anomalies: $out")
    assert(out.map(_._1).subsetOf(outbreakDays), s"false positives: $out")
    assert(out.size >= 3, s"missed most of the outbreak: $out")
  }

  test("output matches the reference artifact schema (date, region, score)") {
    val df = OutbreakPipeline.anomalies(spark, fixture(), terms, seed = 1L)
    assert(df.columns.toSeq == Seq("date", "region", "score"))
  }

  test("golden-artifact shape check vs the reference's shipped CSV") {
    // The one artifact the reference repo ships is the exported anomaly
    // table (`anomalies_final_2020_2009.csv`, pandas to_csv: unnamed
    // index + date,region,score). Our EP3 export must stay column- and
    // dtype-compatible with it — checked against the FILE, not a
    // transcription, so reference drift fails the build. (SURVEY §5
    // item 2 / VERDICT r5 task #6.)
    val ref = new java.io.File("/root/reference/anomalies_final_2020_2009.csv")
    assume(ref.exists, "reference artifact not mounted")
    val header = {
      val src = scala.io.Source.fromFile(ref)
      try src.getLines().next() finally src.close()
    }
    assert(header == ",date,region,score", s"reference header drifted: $header")
    val df = OutbreakPipeline.anomalies(spark, fixture(), terms, seed = 1L)
    // our export = the reference's columns minus the pandas write index
    assert(df.columns.toSeq == header.split(",").toSeq.filter(_.nonEmpty))
    // dtypes line up with what the artifact's rows actually parse as
    val parsed = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(ref.getPath)
    val refTypes = parsed.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(refTypes("date") == org.apache.spark.sql.types.DateType ||
      refTypes("date") == org.apache.spark.sql.types.TimestampType ||
      refTypes("date") == org.apache.spark.sql.types.StringType)
    assert(df.schema("date").dataType == org.apache.spark.sql.types.DateType)
    assert(df.schema("region").dataType == org.apache.spark.sql.types.StringType
      && refTypes("region") == org.apache.spark.sql.types.StringType)
    assert(df.schema("score").dataType == org.apache.spark.sql.types.DoubleType
      && refTypes("score") == org.apache.spark.sql.types.DoubleType)
    // and the CSV writer emits exactly the reference's value shapes:
    // ISO dates, bare region codes, full-precision doubles
    val row = parsed.orderBy("date", "region").limit(1)
      .select(date_format(col("date").cast("date"), "yyyy-MM-dd"), col("region"))
      .collect().head
    assert(row.getString(0).matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(row.getString(1).matches("[A-Z]{2}"))
  }

  test("pipeline is deterministic under a fixed seed") {
    def run() = OutbreakPipeline.scores(spark, fixture(), terms, seed = 1L)
      .orderBy("date", "region").select("score").as[Double].collect().toSeq
    assert(run() == run())
  }
}
