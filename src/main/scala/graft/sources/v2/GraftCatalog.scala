package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal V2 `TableCatalog` + `FunctionCatalog` for eventlog stores —
  * the missing rung that makes STORAGE-PARTITIONED JOINS reachable:
  * Spark only resolves a scan's reported `KeyGroupedPartitioning` over a
  * `bucket(...)` transform when the relation came through a catalog that
  * can also load the `bucket` function (path-based
  * `.format(...).load(...)` relations carry no function catalog, so
  * their reported partitioning is ignored and every join re-shuffles).
  * Register a store under a name, read it with
  * `spark.table("graft.<name>")`, and a join of two reads bucketed the
  * same way plans with NO exchange above either scan.
  *
  * Driver-side registry (a `ConcurrentHashMap`), not a metastore: the
  * catalog's job here is only to carry the function-resolution
  * capability and the name→path mapping for the session; persistence is
  * the store directory itself. DDL through this catalog is refused
  * loudly — stores are created by the V2 writer, not `CREATE TABLE`. */
class GraftCatalog extends TableCatalog with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    import scala.jdk.CollectionConverters._
    GraftCatalog.registry.keySet().asScala.toArray
      .map(Identifier.of(namespace, _))
  }

  private def pathOf(ident: Identifier): String = {
    val path = GraftCatalog.registry.get(ident.name())
    if (path == null) throw new NoSuchTableException(
      Seq(catalogName, ident.name()))
    path
  }

  override def loadTable(ident: Identifier): Table =
    new EventLogTable(pathOf(ident))

  /** `SELECT … FROM graft.<store> VERSION AS OF n` — the SQL surface of
    * the manifest log's versions ([[EventLog.readManifestAsOf]]): the
    * loaded table is PINNED to the version and read-only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-eventlog: versions are manifest commit numbers, got " +
          s"'$version'")
    }
    new EventLogTable(pathOf(ident), EventLog.TimeView.AsOf(v))
  }

  /** `TIMESTAMP AS OF` — Spark hands epoch MICROseconds; resolved to
    * the version live at that wall-clock instant via segment-file
    * mtimes ([[EventLog.versionAt]], the Delta convention). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    new EventLogTable(path,
      EventLog.TimeView.AsOf(EventLog.versionAt(path, timestampMicros)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog: stores are created by the V2 writer " +
        "(df.write.format(\"graft-eventlog\")), then registered — not by DDL")

  /** `ALTER TABLE graft.<store> ADD COLUMN <name> <BIGINT|DOUBLE|
    * STRING>` — the SQL surface of the schema registry
    * ([[EventLogSchema.addColumn]]): additive nullable columns of the
    * three types the fixed-width wire carries exactly; drops, retypes,
    * renames, and other types refuse with the wire contract named.
    *
    * `ALTER TABLE graft.<store> SET TBLPROPERTIES(
    * 'retention.versions' = 'N' | 'retention.ms' = 'T')` — the SQL
    * surface of the time-travel retention policy (round 12), writing
    * the SAME marker as `CALL graft.set_retention(_ms)`: the
    * SQL-only operators who own maintenance cadence can declare the
    * policy without a Scala hook. `UNSET TBLPROPERTIES` (or setting
    * '0') clears it; non-numeric or negative values refuse with the
    * property named. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    def numeric(p: TableChange.SetProperty): Long =
      try p.value.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-eventlog: table property '${p.property}' takes a " +
            s"non-negative integer, got '${p.value}'")
      }
    changes.foreach {
      case p: TableChange.SetProperty if p.property == "retention.versions" =>
        val n = numeric(p)
        require(0 <= n && n <= Int.MaxValue,
          s"graft-eventlog: 'retention.versions' must be in " +
            s"[0, ${Int.MaxValue}], got $n")
        EventLog.setRetention(path, n.toInt)
      case p: TableChange.SetProperty if p.property == "retention.ms" =>
        val ms = numeric(p)
        require(ms >= 0,
          s"graft-eventlog: 'retention.ms' must be >= 0, got $ms")
        EventLog.setRetentionMs(path, ms)
      case r: TableChange.RemoveProperty
          if r.property == "retention.versions" ||
             r.property == "retention.ms" =>
        EventLog.setRetention(path, 0) // clears the one shared marker
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft-eventlog: nested columns do not exist in this format")
        require(EventLogSchema.SupportedTypes.contains(add.dataType()),
          s"graft-eventlog: added columns are nullable BIGINT, DOUBLE, " +
            s"or STRING by the fixed-width wire contract; got " +
            s"${add.dataType().simpleString}")
        EventLogSchema.addColumn(path, add.fieldNames().head,
          add.dataType())
      case del: TableChange.DeleteColumn =>
        EventLogSchema.dropColumn(path, del.fieldNames().mkString("."))
      case t: TableChange.UpdateColumnType =>
        EventLogSchema.retypeColumn(path, t.fieldNames().mkString("."))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported table change $other — the eventlog " +
          "schema grows by ADD COLUMN <name> BIGINT|DOUBLE|STRING only")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.registry.remove(ident.name()) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: rename the registration, not the store")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new NoSuchFunctionException(ident)

  // --- ProcedureCatalog: the SQL CALL surface for maintenance ops ---

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.identifiers(namespace)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident)
}

object GraftCatalog {
  private[v2] val registry = new ConcurrentHashMap[String, String]()

  /** Register `path` as `graft.<name>` in `spark`, installing the
    * catalog and the V2-bucketing confs a storage-partitioned join
    * needs. Idempotent; last registration of a name wins. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    // both sides of an SPJ must agree on partition VALUES; pushPartValues
    // lets Spark align sides whose occupied buckets differ (a type filter
    // can empty a bucket on one side only)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "true")
    registry.put(name, path)
  }
}

/** The catalog's `bucket(n, user_id)` function — the SAME routing the
  * bucketed writer applies (`floorMod(user_id, n)`), exposed so Catalyst
  * can resolve the scan's reported `bucket` transform into a
  * `TransformExpression` and prove two scans co-partitioned. The
  * semantics live HERE and in [[EventLogDataWriter]]'s routing; they
  * must never diverge, which is why both call [[GraftBucketFunction
  * .bucketOf]]. */
object GraftBucketFunction extends UnboundFunction {
  /** The one routing rule: non-negative floor-mod of the user id. */
  def bucketOf(userId: Long, n: Int): Int = Math.floorMod(userId, n.toLong).toInt

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, user_id) -> floorMod(user_id, n): graft-eventlog bucket routing"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType,
      s"graft bucket() binds as (INT numBuckets, BIGINT user_id); got " +
        inputType.simpleString)
    Bound
  }

  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      bucketOf(input.getLong(1), input.getInt(0))
  }
}
