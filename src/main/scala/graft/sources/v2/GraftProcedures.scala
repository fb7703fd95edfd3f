package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}

/** The SQL `CALL` surface for eventlog MAINTENANCE ops — Spark 4's
  * `ProcedureCatalog` ladder (the `CALL catalog.proc(...)` analyzer
  * path Iceberg pioneered), served by [[GraftCatalog]]:
  *
  * {{{
  *   CALL graft.compact('store')                        -- day merge
  *   CALL graft.compact('store', true)                  -- Z-order
  *   CALL graft.vacuum('store', 0)                      -- orphan sweep
  *   CALL graft.build_blooms('store')                   -- key sidecars
  * }}}
  *
  * WHY a SQL surface: at 100 TB the maintenance cadence (nightly
  * compaction, clustering after backfills, bloom refresh behind merges)
  * is owned by schedulers and SQL-only operators, not people holding a
  * Scala REPL — `CALL` is the contract every table format grew for
  * exactly this reason. Each procedure returns its summary as a result
  * ROW (files before/after, swept count, sidecars built), so the
  * scheduler's run log records what the op did, not just that it ran.
  *
  * Store arguments are the catalog's registered names (the same names
  * `spark.table("graft.<name>")` reads); an unregistered name refuses
  * with the catalog's own missing-table error. The ops themselves are
  * the library entry points ([[EventLogCompact.compact]],
  * [[EventLog.vacuum]], [[EventLogBloom.build]]) — the procedure layer
  * adds no second implementation, so the SQL and Scala paths cannot
  * diverge. */
object GraftProcedures {

  def identifiers(namespace: Array[String]): Array[Identifier] =
    Array("compact", "vacuum", "build_blooms", "set_retention",
        "set_retention_ms")
      .map(Identifier.of(namespace, _))

  def load(ident: Identifier): UnboundProcedure = ident.name() match {
    case "compact" => Compact
    case "vacuum" => Vacuum
    case "build_blooms" => BuildBlooms
    case "set_retention" => SetRetention
    case "set_retention_ms" => SetRetentionMs
    case other => throw new UnsupportedOperationException(
      s"graft catalog: no procedure '$other' — available: " +
        "compact(store, zorder, max_records_per_file), " +
        "vacuum(store, grace_ms), build_blooms(store), " +
        "set_retention(store, keep_versions), " +
        "set_retention_ms(store, keep_ms)")
  }

  private def pathOf(store: String): String = {
    val p = GraftCatalog.registry.get(store)
    require(p != null,
      s"graft catalog: no registered store '$store' — register it with " +
        "GraftCatalog.register(spark, name, path) first")
    p
  }

  /** One-result-row procedure plumbing: bind is identity (parameters
    * are declared, Spark coerces), call runs the op and hands the
    * summary back as a [[LocalScan]]. */
  private abstract class GraftProcedure(
      procName: String,
      procDescription: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // mutates the store
    protected def run(spark: SparkSession, in: InternalRow): InternalRow
    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val out = run(SparkSession.active, in)
      java.util.Collections.singletonList(new LocalScan {
        override def rows(): Array[InternalRow] = Array(out)
        override def readSchema(): StructType = resultSchema
      }: Scan).iterator()
    }
  }

  private object Compact extends GraftProcedure(
    "compact",
    "merge each day's fragments (zorder=true re-clusters along the " +
      "(ts, user) Z-curve); exactly-once under the intent journal",
    Array(
      ProcedureParameter.in("store", StringType).build(),
      ProcedureParameter.in("zorder", BooleanType)
        .defaultValue("false").build(),
      ProcedureParameter.in("max_records_per_file", IntegerType)
        .defaultValue((8 * 1024 * 1024).toString).build()),
    StructType(Seq(
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("groups_merged", IntegerType, nullable = false),
      StructField("intents_recovered", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): InternalRow = {
      val st = EventLogCompact.compact(spark, pathOf(in.getUTF8String(0).toString),
        maxRecordsPerFile = in.getInt(2), zorder = in.getBoolean(1))
      new GenericInternalRow(Array[Any](st.filesBefore, st.filesAfter,
        st.groupsMerged, st.recovered))
    }
  }

  private object Vacuum extends GraftProcedure(
    "vacuum",
    "sweep .inprogress temps older than grace_ms; intent-referenced " +
      "temps always survive",
    Array(
      ProcedureParameter.in("store", StringType).build(),
      ProcedureParameter.in("grace_ms", LongType)
        .defaultValue((24L * 3600 * 1000).toString).build()),
    StructType(Seq(
      StructField("swept", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): InternalRow =
      new GenericInternalRow(Array[Any](
        EventLog.vacuum(pathOf(in.getUTF8String(0).toString), in.getLong(1))))
  }

  private object SetRetention extends GraftProcedure(
    "set_retention",
    "keep the last keep_versions manifest versions row-readable: " +
      "rewrites defer their input unlinks and the checkpoint fold " +
      "defers absorbing protected segments until expiry; 0 clears",
    Array(
      ProcedureParameter.in("store", StringType).build(),
      ProcedureParameter.in("keep_versions", IntegerType).build()),
    StructType(Seq(
      StructField("keep_versions", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): InternalRow = {
      EventLog.setRetention(pathOf(in.getUTF8String(0).toString),
        in.getInt(1))
      new GenericInternalRow(Array[Any](in.getInt(1)))
    }
  }

  private object SetRetentionMs extends GraftProcedure(
    "set_retention_ms",
    "keep versions committed within the last keep_ms milliseconds " +
      "row-readable (age judged from manifest segment mtimes); 0 clears",
    Array(
      ProcedureParameter.in("store", StringType).build(),
      ProcedureParameter.in("keep_ms", LongType).build()),
    StructType(Seq(
      StructField("keep_ms", LongType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): InternalRow = {
      EventLog.setRetentionMs(pathOf(in.getUTF8String(0).toString),
        in.getLong(1))
      new GenericInternalRow(Array[Any](in.getLong(1)))
    }
  }

  private object BuildBlooms extends GraftProcedure(
    "build_blooms",
    "write per-file event_id bloom sidecars for files lacking a " +
      "current one; sweeps orphans",
    Array(ProcedureParameter.in("store", StringType).build()),
    StructType(Seq(
      StructField("built", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): InternalRow =
      new GenericInternalRow(Array[Any](
        EventLogBloom.build(spark, pathOf(in.getUTF8String(0).toString))))
  }
}
