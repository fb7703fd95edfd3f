package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout effectiveness audit — the write-side half of the scan
  * story. Every read-side query in this engine leans on parquet
  * min/max pruning (PushedFilters) working; whether it CAN work is
  * decided when the data is written, by how rows are clustered into
  * files. q198 measures that decision: it lays the events table out
  * two ways — Z-order (Morton-interleaved (user, day) bits) vs
  * insertion order — and reports, per would-be file, the bounding box
  * a reader's min/max skipping would see. At 100 TB the difference is
  * not cosmetic: an insertion-ordered file spans ~every user (no
  * point-lookup ever prunes), a Z-ordered file covers ~1/files of the
  * (user × day) plane, so single-user and single-day scans skip
  * all-but-a-few files on BOTH dimensions from ONE sort key.
  *
  * [[graft.operators.ZOrder]] is the actual WRITER (rank-normalize →
  * interleave → `repartitionByRange`, verified on real parquet by
  * ZOrderSpec); this query is its oracle-checkable audit twin — the
  * same Morton math expressed as pure integer div/mod SQL both engines
  * can run (the two interleaves assign x/y to opposite parities, which
  * is irrelevant to the box geometry being audited).
  */
object Layout {

  /** Bits per dimension (256 quantization buckets, 16-bit Z values). */
  val ZBits = 8

  /** Files the audit lays the table into. */
  val ZFiles = 16

  /** Morton interleave as a SQL expression string over integer columns
    * `xq`/`yq` ∈ [0, 2^ZBits): bit k of x lands at position 2k+1, of y
    * at 2k. Pure integer div/mod arithmetic, identical text in both
    * engines (`div` spelled per dialect) — no native bit intrinsics
    * whose width/sign rules could differ. */
  private[graft] def mortonExpr(idiv: String): String =
    (0 until ZBits).map { k =>
      val p = 1L << k
      s"((xq $idiv $p) % 2) * ${1L << (2 * k + 1)} + " +
        s"((yq $idiv $p) % 2) * ${1L << (2 * k)}"
    }.mkString("(", " + ", ")")

  /** q198 — Z-order vs insertion-order layout audit on events, keyed
    * (user_id, event day): both dims min/max-quantized to 8 bits from
    * the data's own bounds, Morton-interleaved, range-cut into 16
    * files; the insertion layout range-cuts event_id (arrival order)
    * into the same 16. Per (layout, file): row count, the per-dim
    * min/max a parquet footer would carry, the bounding-box area as
    * ppm of the full plane, and the layout's average box — the number
    * that says "a predicate on either key prunes N× better Z-ordered".
    *
    * Scale shape: one scan computes global bounds (6-long single-row
    * agg, broadcast back), a second scan assigns (z, file) as pure
    * projections — the real write path would range-partition on z
    * here — and the audit aggregates 2×16 groups with map-side
    * combine. The file spine is a constant; windows run on 16 rows. */
  def q198ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), to_date(col("ts")).as("d"))
    val bounds = e.agg(
      min("user_id").as("umin"), max("user_id").as("umax"),
      min("d").as("dmin"), max("d").as("dmax"),
      min("event_id").as("emin"), max("event_id").as("emax"))
    val q = e.crossJoin(broadcast(bounds))
      .withColumn("xq", expr(
        s"(user_id - umin) * ${1L << ZBits} div (umax - umin + 1)"))
      .withColumn("yq", expr(
        s"(datediff(d, dmin) * ${1L << ZBits}) div (datediff(dmax, dmin) + 1)"))
      .withColumn("z", expr(mortonExpr("div")))
      .withColumn("zfile", expr(s"z div ${(1L << (2 * ZBits)) / ZFiles}"))
      .withColumn("rfile", expr(
        s"(event_id - emin) * $ZFiles div (emax - emin + 1)"))

    val lanes = q.select(lit("zorder").as("layout"), col("zfile").as("file_id"),
        col("xq"), col("yq"))
      .unionByName(q.select(lit("rowid").as("layout"), col("rfile").as("file_id"),
        col("xq"), col("yq")))
    val perFile = lanes.groupBy("layout", "file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("xq").as("x_min"), max("xq").as("x_max"),
        min("yq").as("y_min"), max("yq").as("y_max"))
      .withColumn("span_ppm", expr(
        s"(x_max - x_min + 1) * (y_max - y_min + 1) * 1000000 div ${1L << (2 * ZBits)}"))
    perFile.withColumn("avg_span_ppm", expr(
      "sum(span_ppm) over (partition by layout) div count(1) over (partition by layout)"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_zorder_layout" -> (q198ZorderLayout _))

  val oracles: Map[String, String] = Map(
    "q198_zorder_layout" -> {
      val morton = mortonExpr("//")
      s"""WITH e AS (
         | SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events),
         |bounds AS (
         | SELECT min(user_id) AS umin, max(user_id) AS umax,
         |  min(d) AS dmin, max(d) AS dmax,
         |  min(event_id) AS emin, max(event_id) AS emax FROM e),
         |q AS (
         | SELECT
         |  (user_id - umin) * ${1L << ZBits} // (umax - umin + 1) AS xq,
         |  (date_diff('day', dmin, d) * ${1L << ZBits})
         |    // (date_diff('day', dmin, dmax) + 1) AS yq,
         |  event_id, emin, emax
         | FROM e CROSS JOIN bounds),
         |z AS (
         | SELECT xq, yq,
         |  $morton // ${(1L << (2 * ZBits)) / ZFiles} AS zfile,
         |  (event_id - emin) * $ZFiles // (emax - emin + 1) AS rfile
         | FROM q),
         |lanes AS (
         | SELECT 'zorder' AS layout, zfile AS file_id, xq, yq FROM z
         | UNION ALL
         | SELECT 'rowid' AS layout, rfile AS file_id, xq, yq FROM z),
         |per_file AS (
         | SELECT layout, file_id, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(xq) AS x_min, max(xq) AS x_max,
         |  min(yq) AS y_min, max(yq) AS y_max
         | FROM lanes GROUP BY layout, file_id)
         |SELECT layout, file_id, n_rows, x_min, x_max, y_min, y_max,
         | (x_max - x_min + 1) * (y_max - y_min + 1) * 1000000
         |   // ${1L << (2 * ZBits)} AS span_ppm,
         | CAST(sum((x_max - x_min + 1) * (y_max - y_min + 1) * 1000000
         |   // ${1L << (2 * ZBits)}) OVER (PARTITION BY layout)
         |  // count(*) OVER (PARTITION BY layout) AS BIGINT) AS avg_span_ppm
         |FROM per_file""".stripMargin
    })
}
