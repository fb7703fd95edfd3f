package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-row audit on the CSV scan: bad rows must land in the
  * quarantine column, never silently null-out or kill the job. */
class CsvAuditSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType)))

  test("clean rows parse; malformed rows are captured verbatim, one pass") {
    val dir = Files.createTempDirectory("csvaudit").toString
    Files.write(Paths.get(s"$dir/in.csv"),
      """id,score
        |# comment survives
        |1,0.5
        |2,not_a_number
        |3,1.5
        |""".stripMargin.getBytes)
    val df = Sources.csvAudited(spark, s"$dir/in.csv", schema).cache()
    val clean = df.where(col("_corrupt_record").isNull)
    val quarantine = df.where(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(clean.agg(sum("score")).head().getDouble(0) == 2.0)
    assert(quarantine.count() == 1)
    assert(quarantine.select("_corrupt_record").head().getString(0)
      == "2,not_a_number", "raw line preserved for replay")
    df.unpersist()
  }
}
