package graft.outbreak

import java.sql.Date

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnomalyScorerSpec extends SparkTestBase {
  import spark.implicits._

  /** Two tight clusters + one far outlier day. */
  private def featureTable() = {
    val rows =
      (1 to 10).map(i => (f"2020-01-$i%02d", "US", 1.0 + 0.01 * i, 2.0)) ++
      (11 to 20).map(i => (f"2020-01-$i%02d", "US", 10.0 + 0.01 * i, 9.0)) :+
      (("2020-02-01", "US", 100.0, 100.0))
    rows.toDF("d", "region", "f1", "f2")
      .select(to_date($"d").as("date"), $"region", $"f1", $"f2")
  }

  test("kmeansScores: z-scored distances have ~zero mean and flag the planted outlier") {
    val assembled = AnomalyScorer.assemble(featureTable(), Seq("f1", "f2"))
    val scores = AnomalyScorer.kmeansScores(spark, assembled, k = 2, seed = 1L).cache()
    val collected = scores.collect()
    assert(collected.length == 21)
    val mean = collected.map(_.getAs[Double]("score")).sum / collected.length
    assert(math.abs(mean) < 1e-9) // z-scores are centered
    val outliers = AnomalyScorer.outliers(scores, 2.0)
      .select("date").as[Date].collect()
    assert(outliers.map(_.toString).toSet == Set("2020-02-01"))
  }

  test("kmeansScores: deterministic under fixed seed") {
    val assembled = AnomalyScorer.assemble(featureTable(), Seq("f1", "f2"))
    def run() = AnomalyScorer.kmeansScores(spark, assembled, k = 2, seed = 1L)
      .orderBy("date").select("score").as[Double].collect().toSeq
    assert(run() == run())
  }

  test("selectK finds the obvious 2-cluster structure") {
    val assembled = AnomalyScorer.assemble(
      featureTable().where($"f1" < 50), Seq("f1", "f2"))
    assert(AnomalyScorer.selectK(assembled, 2 to 4, seed = 1L) == 2)
  }

  test("assemble keeps id columns alongside the features vector") {
    val assembled = AnomalyScorer.assemble(featureTable(), Seq("f1", "f2"))
    assert(assembled.columns.toSet ==
      Set("date", "region", "f1", "f2", "features"))
  }
}
