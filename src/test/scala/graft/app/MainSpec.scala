package graft.app

import java.nio.file.Files

import graft.SparkTestBase

/** End-to-end application test: JSON file-stream → daily landing →
  * anomaly scores, with a planted spike that must be detected. Codifies
  * the manual drive of `graft.app.Main --once`. */
class MainSpec extends SparkTestBase {
  import spark.implicits._

  private def eventLines(days: Range, spikeDays: Set[Int]): Seq[String] =
    (for {
      day <- days
      region <- Seq("US", "IL")
      kw <- Seq("Cough", "Fever")
      hh <- Seq("06", "18")
    } yield {
      val base = 40.0 + (day % 7) + (if (region == "US") 5 else 0)
      val spike = if (region == "US" && spikeDays(day)) 8.0 else 1.0
      val date = java.time.LocalDate.of(2020, 1, 1).plusDays(day - 1)
      s"""{"datetime":"${date}T$hh:00:00","kw":"$kw","region":"$region","value":${base * spike / 2}}"""
    })

  private def dayStr(day: Int): String =
    java.time.LocalDate.of(2020, 1, 1).plusDays(day - 1).toString

  test("--once run lands daily rows and flags the planted outbreak; " +
      "a second run scores only the new days incrementally") {
    val in = Files.createTempDirectory("app-in").toString
    val out = Files.createTempDirectory("app-out").toString
    val appArgs = Array("--json-dir", in, "--landing", s"$out/landing",
      "--scores", s"$out/scores", "--checkpoint", s"$out/ckpt",
      "--terms", "Cough,Fever", "--once")

    // ---- run 1: days 1..40, spike on 36..38 (full fit: batch 0)
    Files.write(java.nio.file.Paths.get(s"$in/events.json"),
      eventLines(1 to 40, Set(36, 37, 38)).mkString("\n").getBytes)
    Main.main(appArgs)

    val landing = spark.read.parquet(s"$out/landing")
    // 40 days x 2 regions x 2 kw, minus the last (still-open) day
    assert(landing.count() == 39L * 2 * 2)
    val anomalies = spark.read.parquet(s"$out/scores")
      .select($"region", $"date".cast("string")).as[(String, String)]
      .collect().toSet
    assert(anomalies.nonEmpty)
    assert(anomalies.forall(_._1 == "US"), s"non-US anomaly: $anomalies")
    val spikeDays = (36 to 38).map(dayStr).toSet
    assert(anomalies.map(_._2).subsetOf(spikeDays), s"false positive: $anomalies")
    assert(new java.io.File(s"$out/ckpt/graft-state/model").exists(),
      "full fit must persist incremental state")

    // snapshot run-1 score partitions: content and file mtimes
    def partitionFiles(): Map[String, Long] = {
      val base = new java.io.File(s"$out/scores")
      base.listFiles().filter(_.getName.startsWith("date="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())).toMap
    }
    val before = partitionFiles()

    // ---- run 2: days 41..46 arrive, spike on 43 (incremental: batch 1)
    Files.write(java.nio.file.Paths.get(s"$in/events2.json"),
      eventLines(41 to 46, Set(43)).mkString("\n").getBytes)
    Main.main(appArgs)

    // landing advanced to 45 closed days
    assert(spark.read.parquet(s"$out/landing").count() == 45L * 2 * 2)
    val after = spark.read.parquet(s"$out/scores")
      .select($"region", $"date".cast("string")).as[(String, String)]
      .collect().toSet
    // old anomalies still present, new spike flagged, nothing else added
    assert(anomalies.subsetOf(after), "run 2 dropped run-1 anomalies")
    assert(after.contains(("US", dayStr(43))), s"new spike not flagged: $after")
    assert(after.map(_._2).subsetOf(spikeDays + dayStr(43)),
      s"false positive in run 2: $after")
    // incremental proof: run 2 did not rewrite run-1 date partitions
    val unchanged = partitionFiles().filter { case (p, _) => before.contains(p) }
    assert(unchanged == before,
      "run 2 rewrote old score partitions - incremental path not taken")
  }
}
