package graft.sources.v2

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}

/** CHANGE-DATA FILES — CDC continuity across rewrites (the Delta CDF
  * shape): a commit that rewrites history (MERGE, row-level DELETE,
  * compaction) journals its row-level changes as one or more
  * `_cdc.<seq>.<uuid>.gelc` parts, written through the same intent
  * journal as the swap itself, so the changes feed can SERVE rewrite
  * commits instead of refusing:
  *
  *  - **merge** parts carry `update_preimage` / `update_postimage`
  *    pairs for matched rows and `insert` rows for unmatched ones;
  *  - **row-level delete** parts carry `delete` rows;
  *  - **compaction** writes one EMPTY part — a pure re-layout is the
  *    explicit statement "this commit changed nothing", which the
  *    plain feed uses to stream it as ZERO rows instead of refusing,
  *    the continuity rung every long-lived CDC consumer needs.
  *
  * A rewrite commit WITHOUT parts (a legacy commit, or a crash between
  * the manifest append and the part renames) still refuses loudly —
  * absence of evidence never reads as "no changes". Plain (untyped)
  * tails refuse commits whose parts carry rows (appends cannot express
  * a delete or an update); the TYPED feed (`cdc.typed` read option,
  * schema + `_change_type` + `_commit_version`) serves everything.
  *
  * Wire format (big-endian): magic "GRAFTCD1" | int32 n | n × (int8
  * changeType | int64 event_id | int64 ts_us | int64 user_id | utf
  * event_type | int64 cents). Parts are batch-sized (bounded by the
  * commit's own change volume) and decode whole. */
object EventLogCdc {

  private val Magic = "GRAFTCD1".getBytes("US-ASCII")
  private val PartName = """_cdc\.(\d{8})\.[0-9a-f]+\.gelc""".r

  val Insert: Byte = 0
  val UpdatePre: Byte = 1
  val UpdatePost: Byte = 2
  val Delete: Byte = 3

  def typeName(b: Byte): String = b match {
    case Insert => "insert"
    case UpdatePre => "update_preimage"
    case UpdatePost => "update_postimage"
    case Delete => "delete"
    case other => throw new IllegalStateException(
      s"graft-eventlog cdc: unknown change type $other")
  }

  def isPartName(name: String): Boolean = PartName.matches(name)

  def partSeq(name: String): Long = name match {
    case PartName(s) => s.toLong
    case _ => throw new IllegalArgumentException(
      s"graft-eventlog cdc: $name is not a CDC part")
  }

  def partName(seq: Long): String =
    f"_cdc.$seq%08d." +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8) +
      ".gelc"

  /** One change row: (type, event_id, ts_us, user_id, event_type,
    * cents). */
  type Row = (Byte, Long, Long, Long, String, Long)

  /** Write a part TEMP (`.inprogress.cdc.<uuid>`) holding `rows` —
    * rename-committed later by the swap sequence, which alone knows
    * the commit's seq. Empty `rows` is legal: the zero-change
    * marker. */
  def writeTemp(dir: String, rows: Seq[Row]): String = {
    val tmp = new java.io.File(dir,
      s".inprogress.cdc.${java.util.UUID.randomUUID().toString.take(8)}")
    val o = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16))
    try {
      o.write(Magic)
      o.writeInt(rows.length)
      rows.foreach { case (t, id, ts, user, tpe, cents) =>
        o.writeByte(t)
        o.writeLong(id); o.writeLong(ts); o.writeLong(user)
        EventLog.writeUtf(o, tpe)
        o.writeLong(cents)
      }
    } finally o.close()
    tmp.getName
  }

  def readPart(f: java.io.File): Seq[Row] = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 16))
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"graft-eventlog cdc: ${f.getName} is not a change-data part")
      (0 until in.readInt()).map { _ =>
        (in.readByte(), in.readLong(), in.readLong(), in.readLong(),
          EventLog.readUtf(in), in.readLong())
      }
    } finally in.close()
  }

  /** The committed CDC parts of manifest commit `seq`: None = the
    * commit journaled no change data (legacy, or torn before the part
    * renames) — its consumers must refuse, never assume; Some(parts)
    * may be empty-of-rows only through parts that SAY so. */
  def partsOf(dir: String, seq: Long): Option[Seq[java.io.File]] = {
    val parts = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => isPartName(f.getName) && partSeq(f.getName) == seq)
      .sortBy(_.getName)
    if (parts.isEmpty) None else Some(parts)
  }

  /** Total change rows of commit `seq`'s parts (cheap: header ints). */
  def rowCountOf(dir: String, seq: Long): Option[Long] =
    partsOf(dir, seq).map(_.iterator.map { f =>
      val in = new DataInputStream(new FileInputStream(f))
      try {
        val magic = new Array[Byte](Magic.length)
        in.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"graft-eventlog cdc: ${f.getName} is not a change-data part")
        in.readInt().toLong
      } finally in.close()
    }.sum)

  /** Delete CDC parts whose commit seq folded into the checkpoint —
    * the feed can no longer read below the fold, so the parts are
    * unreachable bytes ([[EventLog.vacuum]] calls this). */
  private[v2] def sweepBelow(dir: String, foldedThrough: Long): Int = {
    val doomed = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => isPartName(f.getName) && partSeq(f.getName) <= foldedThrough)
    doomed.foreach(_.delete())
    doomed.size
  }

  /** The typed feed's schema: the store schema plus the two CDF
    * columns every Delta-shaped consumer expects. */
  val TypedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(EventLog.Schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Plan a typed window (`from`, `to`] as partitions — shared by the
    * batch scan and the stream's per-batch planning. A planned add
    * file that no longer exists refuses with the retention wording. */
  private[v2] def planWindow(dir: String, from: Long, to: Long)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    // the typed feed's rows are base-width: serving an extended store
    // would silently DROP added-column values — refuse instead
    EventLogSchema.requireBaseStore(dir, "the typed CDC feed")
    EventLog.changeCommits(dir, from, to, typed = true).flatMap {
      case (seq, entries, parts) =>
        entries.map { e =>
          val f = new java.io.File(dir, e.file)
          require(f.isFile,
            s"graft-eventlog cdc: window ($from, $to] references " +
              s"${e.file}, which no longer exists (compacted or deleted " +
              "since) — the changes feed is bounded by physical file " +
              "retention; restart from a later startingVersion")
          EventLogCdcAddPartition(f.getAbsolutePath, seq)
            : org.apache.spark.sql.connector.read.InputPartition
        } ++ parts.map(p =>
          EventLogCdcPartPartition(p.getAbsolutePath, seq)
            : org.apache.spark.sql.connector.read.InputPartition)
    }.toArray
  }
}

/** A data file whose rows were all INSERTED by commit `version` — the
  * typed feed reads it PHYSICALLY (no deletion-vector mask: a later
  * delete is a later commit's change rows, not a revision of this
  * one). */
case class EventLogCdcAddPartition(file: String, version: Long)
    extends org.apache.spark.sql.connector.read.InputPartition

/** One committed change-data part of commit `version`. */
case class EventLogCdcPartPartition(file: String, version: Long)
    extends org.apache.spark.sql.connector.read.InputPartition

/** Row-based reader of the typed feed: add files surface as `insert`
  * rows, CDC parts surface as whatever their rows say — both pruned
  * to the required columns. */
class EventLogCdcReaderFactory(fields: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private def rowsToReader(version: Long,
      rows: Iterator[EventLogCdc.Row])
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = rows.hasNext && {
        val (t, id, ts, user, tpe, cents) = rows.next()
        val r = new GenericInternalRow(fields.length)
        var i = 0
        while (i < fields.length) {
          fields(i) match {
            case "event_id" => r.update(i, id)
            case "ts_us" => r.update(i, ts)
            case "user_id" => r.update(i, user)
            case "event_type" => r.update(i, UTF8String.fromString(tpe))
            case "cents" => r.update(i, cents)
            case "_change_type" =>
              r.update(i, UTF8String.fromString(EventLogCdc.typeName(t)))
            case "_commit_version" => r.update(i, version)
            case other => throw new IllegalArgumentException(
              s"graft-eventlog cdc: unknown column $other")
          }
          i += 1
        }
        cur = r
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def createReader(
      partition: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    partition match {
      case EventLogCdcAddPartition(file, v) =>
        rowsToReader(v, EventLog.readAllRecords(new java.io.File(file))
          .iterator.map { case (id, ts, user, tpe, cents) =>
            (EventLogCdc.Insert, id, ts, user, tpe, cents)
          })
      case EventLogCdcPartPartition(file, v) =>
        rowsToReader(v, EventLogCdc.readPart(new java.io.File(file)).iterator)
    }
}

/** The typed CDC scan (`.option("cdc.typed", "true")`): a batch window
  * (`changes.from`/`changes.to`) or a streaming tail
  * (`stream.changes`) of per-commit TYPED change rows. Append commits
  * stream their files as `insert` rows; rewrite commits stream their
  * journaled parts — so a MERGE surfaces as pre/post-image pairs plus
  * inserts, a row-level DELETE as `delete` rows, and a compaction as
  * nothing at all. This is the feed a downstream materializer folds to
  * stay continuously consistent with the store without ever rescanning
  * it. */
class EventLogCdcScan(path: String,
    required: org.apache.spark.sql.types.StructType,
    view: EventLog.TimeView,
    streamChanges: Boolean,
    startingVersion: Long,
    maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long])
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch {

  override def readSchema(): org.apache.spark.sql.types.StructType = required
  override def description(): String =
    s"graft-eventlog $path, typed CDC, view=$view" +
      s", read=[${required.fieldNames.mkString(",")}]"

  override def toBatch: org.apache.spark.sql.connector.read.Batch = {
    require(!streamChanges, "graft-eventlog: stream.changes is a " +
      "readStream option — a typed batch window is cdc.typed + " +
      "changes.from/changes.to")
    view match {
      case EventLog.TimeView.Changes(_, _) => this
      case other => throw new IllegalArgumentException(
        s"graft-eventlog: cdc.typed is a changes-feed option — pair it " +
          s"with changes.from/changes.to (batch) or stream.changes " +
          s"(readStream), not $other")
    }
  }

  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    view match {
      case EventLog.TimeView.Changes(from, to) =>
        EventLogCdc.planWindow(path, from, to)
      case other => throw new IllegalStateException(
        s"graft-eventlog: typed CDC batch planned under $other — " +
          "toBatch should have refused")
    }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new EventLogCdcReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(view == EventLog.TimeView.Current && streamChanges,
      "graft-eventlog: a typed CDC tail is cdc.typed + stream.changes " +
        "on the live store (offsets are manifest versions); batch " +
        "windows use changes.from/changes.to")
    new EventLogChangesStream(path, required.fieldNames,
      _ => true, EventLog.OptPred.All, startingVersion,
      maxFilesPerTrigger, maxBytesPerTrigger, typed = true)
  }
}
