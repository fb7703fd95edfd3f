package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `ALTER TABLE … SET TBLPROPERTIES` as the SQL surface of the
  * time-travel retention policy (round 12): the same operators who own
  * maintenance cadence through `CALL graft.compact/vacuum` can declare
  * retention without a Scala hook. The ALTER route writes the SAME
  * marker bytes as `CALL graft.set_retention(_ms)`, invalid values
  * refuse with the property named, `UNSET` clears, SHOW TBLPROPERTIES
  * reads the declared state back — and the policy declared via ALTER
  * is HONORED by maintenance exactly like the procedure's (a protected
  * version still row-reads after compaction). */
class AlterRetentionSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Day = 86400000000L

  private def writeDay(dir: String, id: Long, cents: Long): Unit =
    Seq((id, id, 7L, "a", cents))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .coalesce(1)
      .write.format("graft-eventlog").mode("append").save(dir)

  private def registered(): (String, String) = {
    val dir = Files.createTempDirectory("gelalt").toString
    writeDay(dir, 1L, 10L)
    val name = s"alt_${Integer.toHexString(dir.hashCode)}_" +
      Integer.toHexString(scala.util.Random.nextInt())
    GraftCatalog.register(spark, name, dir)
    (name, dir)
  }

  private def markerBytes(dir: String): Seq[Byte] =
    java.nio.file.Files.readAllBytes(
      new java.io.File(dir, EventLog.RetentionName).toPath).toSeq

  test("SET TBLPROPERTIES('retention.versions') writes the procedure's exact marker") {
    val (name, dir) = registered()
    spark.sql(
      s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.versions'='3')")
    assert(EventLog.readRetention(dir)
      .contains(EventLog.Retention.Versions(3)))
    // byte-identical to the CALL route on a twin store
    val (twinName, twinDir) = registered()
    spark.sql(s"CALL graft.set_retention('$twinName', 3)")
    assert(markerBytes(dir) == markerBytes(twinDir),
      "ALTER and CALL produced different retention markers")
    // SHOW TBLPROPERTIES reads the declared state back
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.$name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("retention.versions").contains("3"), props.toString)
  }

  test("SET TBLPROPERTIES('retention.ms') matches set_retention_ms; '0' clears") {
    val (name, dir) = registered()
    spark.sql(
      s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.ms'='604800000')")
    assert(EventLog.readRetention(dir)
      .contains(EventLog.Retention.Millis(604800000L)))
    val (twinName, twinDir) = registered()
    spark.sql(s"CALL graft.set_retention_ms('$twinName', 604800000)")
    assert(markerBytes(dir) == markerBytes(twinDir))
    // '0' clears, like the procedure's documented contract
    spark.sql(s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.ms'='0')")
    assert(EventLog.readRetention(dir).isEmpty)
    assert(!new java.io.File(dir, EventLog.RetentionName).isFile)
  }

  test("UNSET TBLPROPERTIES clears the policy") {
    val (name, dir) = registered()
    spark.sql(
      s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.versions'='5')")
    assert(EventLog.readRetention(dir).nonEmpty)
    spark.sql(
      s"ALTER TABLE graft.$name UNSET TBLPROPERTIES('retention.versions')")
    assert(EventLog.readRetention(dir).isEmpty)
  }

  test("invalid values refuse with the property named; nothing lands") {
    val (name, dir) = registered()
    val e1 = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.versions'='abc')")
    }
    assert(e1.getMessage.contains("retention.versions"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.ms'='-1')")
    }
    assert(e2.getMessage.contains("retention.ms"), e2.getMessage)
    assert(EventLog.readRetention(dir).isEmpty, "a refused value landed")
    // an unrelated property refuses loudly too (no silent swallowing)
    val e3 = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.$name SET TBLPROPERTIES('owner'='me')")
    }
    assert(e3 != null)
  }

  test("the ALTER-declared policy is honored by maintenance (q294-style truth)") {
    val (name, dir) = registered()
    spark.sql(
      s"ALTER TABLE graft.$name SET TBLPROPERTIES('retention.versions'='8')")
    writeDay(dir, 2L, 20L)
    val vPre = EventLog.currentVersion(dir)
    EventLogCompact.compact(spark, dir)
    // current read serves the compacted layout, the protected version
    // still ROW-reads — identical to EventLogRetentionSpec's
    // procedure-declared behavior
    assert(spark.read.format("graft-eventlog").load(dir)
      .agg(sum("cents")).head.getLong(0) == 30L)
    val pre = spark.read.format("graft-eventlog")
      .option("version", vPre.toString).load(dir)
      .select("event_id", "cents").as[(Long, Long)].collect().toMap
    assert(pre == Map(1L -> 10L, 2L -> 20L),
      s"ALTER-declared retention was not honored: $pre")
  }
}
