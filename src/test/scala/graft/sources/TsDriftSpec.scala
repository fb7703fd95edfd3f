package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for the events loader (VERDICT r5 task #2).
  *
  * The driver's testdata has shipped `ts` as parquet TIMESTAMP(NANOS) and
  * later TIMESTAMP(MICROS, isAdjustedToUTC=false); at 100 TB mixed physical
  * encodings across files are routine. `Tables.events` must load every
  * encoding to the same epoch instants with the same TimestampType schema —
  * this spec reads three fixture files carrying identical logical values in
  * the three encodings Spark distinguishes (nanos→LongType via nanosAsLong,
  * micros-NTZ→TimestampNTZType, micros-UTC→TimestampType) and asserts the
  * loader converges them.
  */
class TsDriftSpec extends SparkTestBase {
  private def fixture(name: String): String =
    getClass.getResource(s"/tsdrift/$name").getPath

  test("Tables.events converges nanos / micros-ntz / micros-utc encodings") {
    val encodings = Seq("nanos", "micros_ntz", "micros_utc")
    val loaded = encodings.map { e =>
      val df = Tables.events(spark, fixture(e))
      assert(df.schema("ts").dataType == TimestampType,
        s"$e: loader must land on TimestampType, got ${df.schema("ts").dataType}")
      e -> df.selectExpr("event_id", "unix_micros(ts) as us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }.toMap
    val expected = Seq(
      (1L, 1577836800000000L), (2L, 1577923200123456L), (3L, 1609459199999999L))
    encodings.foreach { e =>
      assert(loaded(e) == expected, s"$e: values drifted: ${loaded(e)}")
    }
  }
}
