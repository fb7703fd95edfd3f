package graft.outbreak

import java.sql.Date

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RegionScorersSpec extends SparkTestBase {
  import spark.implicits._

  /** 30 calm days per region, then a score day; region B's score day is a
    * planted anomaly. */
  private def wide() = {
    val rows =
      (1 to 30).flatMap(i => Seq(
        (f"2020-01-$i%02d", "A", 1.0 + 0.01 * (i % 3), 2.0),
        (f"2020-01-$i%02d", "B", 5.0 + 0.01 * (i % 3), 1.0))) ++
      Seq(("2020-01-31", "A", 1.01, 2.0), ("2020-01-31", "B", 99.0, -40.0)) ++
      Seq(("2020-01-31", "C", 1.0, 1.0)) // C has no history: must be skipped
    rows.toDF("d", "region", "f1", "f2")
      .select(to_date($"d").as("date"), $"region", $"f1", $"f2")
  }

  test("fits per region, scores only the score date, flags the anomaly") {
    val out = RegionScorers.isolationForestScores(
      spark, wide(), Seq("f1", "f2"), Date.valueOf("2020-01-31"))
      .collect().map(r => r.getAs[String]("region") ->
        (r.getAs[Date]("date"), r.getAs[Double]("outlierScore"),
          r.getAs[Double]("predictedLabel"))).toMap
    assert(out.keySet == Set("A", "B")) // C skipped (no history)
    assert(out.values.forall(_._1 == Date.valueOf("2020-01-31")))
    assert(out("B")._2 > out("A")._2) // planted anomaly scores higher
    assert(out("B")._2 > 0.5) // above the iForest "unremarkable" midpoint
    assert(out.values.forall(_._3 == 0.0)) // contamination=0
  }

  test("latestDate finds the max date without relying on row order") {
    assert(RegionScorers.latestDate(wide().orderBy(rand(1))) ==
      Date.valueOf("2020-01-31"))
  }
}
