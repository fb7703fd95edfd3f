package graft.app

import java.nio.file.Files

import graft.SparkTestBase

/** End-to-end application test: JSON file-stream → daily landing →
  * anomaly scores, with a planted spike that must be detected. Codifies
  * the manual drive of `graft.app.Main --once`. */
class MainSpec extends SparkTestBase {
  import spark.implicits._

  test("--once run lands daily rows and flags the planted outbreak") {
    val in = Files.createTempDirectory("app-in").toString
    val out = Files.createTempDirectory("app-out").toString
    val lines = (for {
      day <- 1 to 40
      region <- Seq("US", "IL")
      kw <- Seq("Cough", "Fever")
      hh <- Seq("06", "18")
    } yield {
      val base = 40.0 + (day % 7) + (if (region == "US") 5 else 0)
      val spike = if (region == "US" && day >= 36 && day <= 38) 8.0 else 1.0
      val date = java.time.LocalDate.of(2020, 1, 1).plusDays(day - 1)
      s"""{"datetime":"${date}T$hh:00:00","kw":"$kw","region":"$region","value":${base * spike / 2}}"""
    })
    Files.write(java.nio.file.Paths.get(s"$in/events.json"),
      lines.mkString("\n").getBytes)

    Main.main(Array("--json-dir", in, "--landing", s"$out/landing",
      "--scores", s"$out/scores", "--checkpoint", s"$out/ckpt",
      "--terms", "Cough,Fever", "--once"))

    val landing = spark.read.parquet(s"$out/landing")
    // 40 days x 2 regions x 2 kw, minus the last (still-open) day
    assert(landing.count() == 39L * 2 * 2)
    val anomalies = spark.read.parquet(s"$out/scores")
      .select($"region", $"date".cast("string")).as[(String, String)]
      .collect().toSet
    assert(anomalies.nonEmpty)
    assert(anomalies.forall(_._1 == "US"), s"non-US anomaly: $anomalies")
    val spikeDays = (36 to 38).map(d =>
      java.time.LocalDate.of(2020, 1, 1).plusDays(d - 1).toString).toSet
    assert(anomalies.map(_._2).subsetOf(spikeDays), s"false positive: $anomalies")
  }
}
