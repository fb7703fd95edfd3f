package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Loud-failure discipline for persisted micro-batch stores, shared by
  * every foreachBatch ingest that read-modify-appends an on-disk index
  * ([[PrunedDedupIngest]], [[DedupIngest]], [[CurationGate]]).
  *
  * The r5 lesson this encodes: a broad `catch AnalysisException → empty`
  * around a store read converts schema drift into silent data corruption
  * (dedup admits everything, curation forgets every committed span). The
  * correct split is three-way:
  *   - store ABSENT (explicit FileSystem check) ⇒ genuinely first batch,
  *     proceed with the empty-history path;
  *   - store present but FOOTERLESS (a lister catching a concurrent
  *     writer mid-commit) ⇒ a declared-schema read returns the zero
  *     committed rows that exist — the drift gate skips, nothing to
  *     mis-read;
  *   - store present with footers ⇒ the footer schema MUST match the
  *     writer-derived expectation on the data columns, else throw.
  */
object StoreGuard {

  /** Explicit existence check — the store-absent leg. Never used to
    * swallow read errors; only to pick the first-batch path. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Loud schema-drift gate for a persisted store: compares the on-disk
    * FOOTER schema (when any footers are committed) against the
    * writer-derived expectation on the data columns — partition columns
    * are excluded because directory-value inference types them
    * differently (e.g. `__batch=0` infers int, the data contract says
    * long). A store with no readable footers passes: the subsequent
    * declared-schema read returns zero rows, which is exactly the
    * nothing-committed-yet truth. Drift throws a real
    * `AnalysisException` so callers and specs see the same exception
    * class the r5 testdata regeneration raised. */
  def verifyStoreSchema(spark: SparkSession, path: String,
      expected: StructType, dataCols: Seq[String]): Unit = {
    val onDisk =
      try Some(spark.read.parquet(path).schema)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
    onDisk.foreach { disk =>
      val diskTypes = disk.fields.map(f => f.name -> stripNull(f.dataType)).toMap
      dataCols.foreach { c =>
        val exp = stripNull(expected(c).dataType)
        if (!diskTypes.get(c).contains(exp))
          throw new org.apache.spark.sql.AnalysisException(
            "INTERNAL_ERROR", Map("message" ->
              (s"store schema drift at $path: column '$c' expected " +
                s"$exp, found ${diskTypes.get(c).orNull} " +
                s"(on-disk schema: ${disk.simpleString})")))
      }
    }
  }

  /** Nullability-insensitive type view: parquet footers normalize
    * containment nullability (array<string> always reads back
    * containsNull=true). */
  private def stripNull(t: DataType): DataType = t match {
    case ArrayType(e, _) => ArrayType(stripNull(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(stripNull(k), stripNull(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = stripNull(f.dataType), nullable = true)))
    case other => other
  }
}
