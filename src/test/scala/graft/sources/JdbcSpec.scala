package graft.sources

import graft.SparkTestBase
import graft.sinks.Sinks
import org.apache.spark.sql.functions._

/** JDBC source/sink round-trip against embedded Derby (SURVEY S2/K2 — the
  * reference's MySQL paths, driven against a real JDBC engine offline). */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("append-write then read back; predicate pushes into the remote query") {
    val daily = Seq(
      ("2020-01-01", "US", "Cough", 3.0),
      ("2020-01-02", "US", "Cough", 4.0),
      ("2020-01-01", "IL", "Fever", 5.0)).toDF("d", "region", "kw", "value")
    // Derby maps StringType to CLOB (not comparable) — give explicit
    // VARCHAR DDL types, as a production MySQL deployment would
    Sinks.jdbcAppend(daily, url, "daily_tbl", props +
      ("createTableColumnTypes" ->
        "d VARCHAR(16), region VARCHAR(8), kw VARCHAR(32)"))
    Sinks.jdbcAppend(daily.limit(1), url, "daily_tbl", props) // append again

    val back = Sources.jdbc(spark, url, "daily_tbl", props)
    assert(back.count() == 4)

    val filtered = back.where($"region" === "US")
    // JDBCRelation must push the predicate into the remote WHERE clause
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("region"), scan)
    assert(filtered.count() == 3)
  }

  test("range-partitioned parallel scan returns the same rows") {
    val rows = (1L to 100L).map(i => (i, s"name$i", i * 1.5))
      .toDF("id", "name", "score")
    Sinks.jdbcAppend(rows, url, "part_tbl", props)
    val parallel = Sources.jdbc(spark, url, "part_tbl", props,
      partitionColumn = Some(("id", 1L, 100L, 4)))
    assert(parallel.rdd.getNumPartitions == 4)
    assert(parallel.agg(sum("id")).as[Long].collect().head == 5050L)
  }
}
