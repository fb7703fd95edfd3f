package graft.sources.v2

import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` / `MERGE INTO` / expression-level `DELETE` for
  * eventlog stores — Spark's GROUP-BASED (copy-on-write) row-level
  * rewrite, served natively:
  *
  *  1. Spark plans a candidate subquery over the table's `_file`
  *    metadata column and delivers the matched file set to the
  *    rewrite scan as a runtime `In(_file, …)` filter — the scan
  *    ([[EventLogScan]]) then plans EXACTLY the touched groups, the
  *    same touched-files-only discipline as the Scala merge.
  *  2. The replacement rows (updated matches + preserved non-matches
  *    of touched files + MERGE inserts) write through the ordinary
  *    task-commit writer — per-(day, bucket) files, zone maps and
  *    manifest entries for free, bucket routing read from the store's
  *    own marker, added-column lanes included (row-level SQL works on
  *    EXTENDED stores).
  *  3. The job commit swaps old for new in ONE manifest segment: the
  *    captured scan's post-filter file list is removed (with its
  *    sidecars), the new entries are added — one version, exactly the
  *    Scala merge's commit shape.
  *
  * Division of labor with the cheaper lanes, decided by Spark's own
  * optimizer: a DELETE whose predicate metadata can prove stays on
  * `canDeleteWhere`'s paths (whole-file unlink, or a deletion-vector
  * mask — zero rewrites); only conditions the source cannot evaluate
  * (arbitrary expressions, subqueries) — and every UPDATE / MERGE
  * INTO — pay the copy-on-write rewrite.
  *
  * Stated bounds: the rewrite commit journals NO change-data parts
  * (pre/post images never reach the connector in the group-based
  * protocol), so a changes-feed window across it refuses loudly — the
  * Scala [[EventLogMerge]] entry points are the CDC-journaling path.
  * Concurrent BATCH readers stay snapshot-consistent: the rewrite's
  * task-committed outputs carry the `w` maintenance tag, invisible to
  * planning until the swap commit lands ([[EventLog.zoneMaps]]'s
  * manifest arbitration). */
class EventLogRowLevelOperation(path: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  // the rewrite scan, captured at build: its post-runtime-filter plan
  // IS the replaced-file set
  @volatile private var scan: EventLogScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-eventlog copy-on-write $cmd($path)"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(EventLog.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventLogScanBuilder(path, captureScan = s => scan = s,
      cowGroups = true)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // replacement rows carry the table's data columns (base, or
    // base ++ added on an extended store) — validate like the append
    // writer, minus its bucketing options (the store's own marker
    // routes)
    val schema = info.schema()
    val added = EventLogSchema.read(path)
    val extNames = EventLog.Schema.fieldNames ++ added.map(_.name)
    val baseOk = schema.fieldNames.sameElements(EventLog.Schema.fieldNames)
    val extOk = added.nonEmpty && schema.fieldNames.sameElements(extNames)
    require(baseOk || extOk,
      s"graft-eventlog row-level write: expected columns " +
        s"${extNames.mkString(", ")}, got ${schema.fieldNames.mkString(", ")}")
    require(schema.fields.drop(5).forall(_.dataType == LongType),
      "graft-eventlog row-level write: added columns are BIGINT")
    val extras = if (extOk) added.map(_.name) else Nil
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new EventLogCowBatchWrite(path, extras, () => {
            require(scan != null,
              "graft-eventlog: copy-on-write commit before its rewrite " +
                "scan was planned — nothing defines the replaced set")
            scan.plannedDataFiles
          })
      }
    }
  }
}

/** The copy-on-write job commit: new files land via the ordinary
  * task-commit protocol (temps renamed at task commit), then ONE
  * manifest segment records adds + the removal of every file the
  * rewrite scan planned. */
class EventLogCowBatchWrite(path: String, extras: Seq[String],
    replacedFiles: () => Seq[String]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new EventLogDataWriterFactory(path, EventLog.readBucketing(path),
      extras, nameTag = "w")

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.toSeq.flatMap {
      case EventLogCommit(es) => es
      case _ => Nil
    }
    val removed = replacedFiles()
    removed.foreach { n =>
      val f = new java.io.File(path, n)
      if (f.isFile && !f.delete()) throw new java.io.IOException(
        s"graft-eventlog: copy-on-write commit could not unlink $n")
      EventLogCompact.deleteWithSidecars(path, n)
    }
    if (entries.nonEmpty || removed.nonEmpty)
      EventLog.appendManifest(path, entries, removes = removed)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case EventLogCommit(entries) =>
        entries.foreach(e => new java.io.File(path, e.file).delete())
      case _ => ()
    }
}
