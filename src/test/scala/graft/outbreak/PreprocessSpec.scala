package graft.outbreak

import java.sql.Date

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PreprocessSpec extends SparkTestBase {
  import spark.implicits._

  private def daily(rows: (String, String, String, Double)*) =
    rows.toDF("d", "region", "kw", "value")
      .select(to_date($"d").as("date"), $"region", $"kw", $"value")

  test("detrend: constant series becomes exactly 1.0 everywhere") {
    val in = daily((1 to 10).map(i => (f"2020-01-$i%02d", "US", "Cough", 5.0)): _*)
    val out = Preprocess.detrend(in).select("value").as[Double].collect()
    assert(out.length == 10)
    assert(out.forall(_ == 1.0))
  }

  test("detrend: first row of any series is 1.0 (value / itself)") {
    val in = daily(("2020-01-01", "US", "Cough", 42.0), ("2020-01-02", "US", "Cough", 84.0))
    val out = Preprocess.detrend(in).orderBy("date").as[(Date, String, String, Double)].collect()
    assert(out(0)._4 == 1.0)
    // second: 84 / avg(42, 84) = 84 / 63
    assert(math.abs(out(1)._4 - 84.0 / 63.0) < 1e-12)
  }

  test("detrend: zero-history series repairs to 1.0, not NaN") {
    val in = daily(("2020-01-01", "US", "Cough", 0.0), ("2020-01-02", "US", "Cough", 0.0))
    val out = Preprocess.detrend(in).select("value").as[Double].collect()
    assert(out.forall(_ == 1.0))
  }

  test("detrend partitions by (kw, region): series do not bleed") {
    val in = daily(
      ("2020-01-01", "US", "Cough", 10.0), ("2020-01-02", "US", "Cough", 10.0),
      ("2020-01-01", "IL", "Cough", 999.0), ("2020-01-01", "US", "Fever", 7.0))
    val us = Preprocess.detrend(in)
      .where($"region" === "US" && $"kw" === "Cough")
      .select("value").as[Double].collect()
    assert(us.forall(_ == 1.0)) // IL's 999 must not affect US's average
  }

  test("pivotWide: static vocabulary, missing cells filled with 0") {
    val in = daily(("2020-01-01", "US", "Cough", 3.0), ("2020-01-01", "US", "Fever", 4.0))
    val out = Preprocess.pivotWide(in, Seq("Cough", "Fever", "Virus"))
    assert(out.columns.toSeq == Seq("date", "region", "Cough", "Fever", "Virus"))
    val row = out.collect()(0)
    assert(row.getAs[Double]("Cough") == 3.0)
    assert(row.getAs[Double]("Virus") == 0.0)
  }

  test("withMonthOneHot: exactly one indicator set, matching the month") {
    val in = daily(("2020-03-15", "US", "Cough", 1.0)).select("date", "region")
    val out = Preprocess.withMonthOneHot(in).collect()(0)
    Preprocess.MonthNames.zipWithIndex.foreach { case (m, i) =>
      assert(out.getAs[Long](s"is_$m") == (if (i == 2) 1L else 0L), s"is_$m")
    }
  }

  test("sanitizeTerms: spaces become underscores") {
    val in = daily(("2020-01-01", "US", "Sore throat", 1.0))
    assert(Preprocess.sanitizeTerms(in).select("kw").as[String].collect()
      .head == "Sore_throat")
  }
}
