package graft.sources.v2

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}

import org.apache.spark.sql.SparkSession

/** Small-file compaction for `graft-eventlog` stores — the maintenance
  * operator every append-only file format eventually needs: N append
  * jobs × P write partitions leave each UTC day fragmented into many
  * small `.gel` files, and at 100 TB the small-file problem is the
  * store's real decay mode (per-file planning rows, per-file open
  * costs, under-filled readers). `compact` merges each day's fragments
  * into full files, EXECUTOR-parallel (one task per day — the driver
  * never touches record data), and rewrites the header manifest so
  * planning stays O(1) driver reads afterwards.
  *
  * Crash safety — an INTENT journal, because multi-file replacement has
  * no atomic rename: each group's commit first persists ONE
  * `.compact.intent.*` record naming every merged output (with its
  * full manifest entry) and every input it replaces, then renames the
  * outputs in, deletes the inputs, updates the manifest, and drops the
  * intent. `compact` begins by RECOVERING any intents a previous crash
  * left behind:
  *
  *  - ALL outputs visible → roll FORWARD (delete surviving inputs, fix
  *    the manifest from the entries stored in the intent) — records
  *    exist exactly once afterwards;
  *  - any output missing  → roll BACK (delete the visible outputs and
  *    temps; every input is still alive, because inputs are deleted
  *    only after the LAST rename) — the group is exactly pre-compact.
  *
  * Either way no record is ever lost; the only crash window a
  * CONCURRENT reader could observe is outputs-visible-with-inputs-alive
  * (transient duplicates), which is why compaction is an offline
  * maintenance op: run it without concurrent readers or writers, like
  * any log-less OPTIMIZE. */
object EventLogCompact {

  case class Stats(recovered: Int, groupsMerged: Int, filesBefore: Int,
    filesAfter: Int)

  private val IntentMagic = "GRAFTCI1".getBytes("US-ASCII")
  private[v2] val IntentPrefix = ".compact.intent."

  /** One group's replacement plan: temps (pre-rename names) aligned
    * with their entries (post-rename names inside), plus the inputs the
    * group replaces. */
  private[v2] case class Intent(temps: Seq[String],
    entries: Seq[EventLog.ManifestEntry], inputs: Seq[String])

  private[v2] def writeIntent(dir: String, intent: Intent): java.io.File = {
    val f = new java.io.File(dir,
      IntentPrefix + java.util.UUID.randomUUID().toString)
    val o = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(f), 1 << 12))
    try {
      o.write(IntentMagic)
      o.writeInt(intent.temps.length)
      intent.temps.foreach(EventLog.writeUtf(o, _))
      intent.entries.foreach(EventLog.writeEntry(o, _))
      o.writeInt(intent.inputs.length)
      intent.inputs.foreach(EventLog.writeUtf(o, _))
    } finally o.close()
    f
  }

  private[v2] def readIntent(f: java.io.File): Intent = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 12))
    try {
      val magic = new Array[Byte](IntentMagic.length)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, IntentMagic),
        s"graft-eventlog: ${f.getName} is not a compaction intent")
      val n = in.readInt()
      val temps = (0 until n).map(_ => EventLog.readUtf(in))
      val entries = (0 until n).map(_ => EventLog.readEntry(in))
      val inputs = (0 until in.readInt()).map(_ => EventLog.readUtf(in))
      Intent(temps, entries, inputs)
    } finally in.close()
  }

  /** Finish or undo every intent a crashed compaction left in `dir`.
    * Idempotent — safe to call any number of times. */
  private[v2] def recover(dir: String): Int = {
    val intents = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(IntentPrefix)).sortBy(_.getName)
    intents.foreach { f =>
      val it = readIntent(f)
      if (it.entries.forall(e => new java.io.File(dir, e.file).isFile)) {
        // roll forward: every merged output is live, so the inputs are
        // redundant copies — delete them and repoint the manifest
        it.inputs.foreach(n => new java.io.File(dir, n).delete())
        EventLog.appendManifest(dir, it.entries, removes = it.inputs)
      } else {
        // roll back: the replacement never fully became visible — drop
        // the partial outputs and temps; every input is still alive
        // (inputs are deleted only after the last rename) and the
        // manifest was never touched
        it.entries.foreach(e => new java.io.File(dir, e.file).delete())
        it.temps.foreach(t => new java.io.File(dir, t).delete())
      }
      if (!f.delete())
        throw new java.io.IOException(
          s"graft-eventlog: could not clear intent ${f.getName}")
    }
    // orphan temps (a crash BEFORE any intent was journaled): no intent
    // references them and compaction is single-maintainer, so they are
    // garbage by definition — sweep them
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith(".inprogress.compact."))
      .foreach(_.delete())
    intents.size
  }

  /** Compact `dir`: merge every UTC day holding more than one file into
    * chunks of at most `maxRecordsPerFile` records (sorted by
    * (ts_us, event_id) — zone locality plus determinism), then commit
    * group-by-group under the intent journal. Offline maintenance: no
    * concurrent readers or writers (see class doc). */
  def compact(spark: SparkSession, dir: String,
      maxRecordsPerFile: Int = 8 * 1024 * 1024): Stats = {
    val recovered = recover(dir)
    val maps = EventLog.zoneMaps(dir)
    val filesBefore = maps.size
    // day key from the zone map's minTs: our writer splits days
    // exactly; a foreign file spanning days just lands (correctly,
    // less selectively) in its first day's merged output
    val groups = maps
      .groupBy { case (_, h) => Math.floorDiv(h.minTs, 86400000000L) }
      .filter(_._2.size > 1)
      .toSeq.sortBy(_._1)
      .map { case (day, fs) => (day, fs.map(_._1.getAbsolutePath)) }

    // merge on EXECUTORS — one task per fragmented day; the driver only
    // sequences the per-group commits afterwards
    val merged: Seq[(Long, Intent)] =
      if (groups.isEmpty) Nil
      else spark.sparkContext.parallelize(groups, groups.size).map {
        case (day, paths) =>
          val records = paths.flatMap(p =>
              EventLog.readAllRecords(new java.io.File(p)))
            .sortBy(r => (r._2, r._1))
          val outs = records.grouped(maxRecordsPerFile).map { chunk =>
            val uuid = java.util.UUID.randomUUID().toString.take(8)
            val tmp = new java.io.File(new java.io.File(paths.head).getParent,
              s".inprogress.compact.$uuid")
            val entry = EventLog.writeGelFile(tmp, f"day_$day%05d-c$uuid.gel",
              chunk)
            (tmp.getName, entry)
          }.toSeq
          (day, Intent(outs.map(_._1), outs.map(_._2),
            paths.map(p => new java.io.File(p).getName)))
      }.collect().toSeq.sortBy(_._1)

    // commit each group: intent → rename ALL outputs in → delete inputs
    // → manifest → clear intent (recover() names every crash window)
    merged.foreach { case (_, it) =>
      val intentFile = writeIntent(dir, it)
      it.temps.zip(it.entries).foreach { case (tmpName, entry) =>
        if (!new java.io.File(dir, tmpName)
            .renameTo(new java.io.File(dir, entry.file)))
          throw new java.io.IOException(
            s"graft-eventlog: could not commit compacted ${entry.file}")
      }
      it.inputs.foreach(n => new java.io.File(dir, n).delete())
      EventLog.appendManifest(dir, it.entries, removes = it.inputs)
      if (!intentFile.delete())
        throw new java.io.IOException(
          s"graft-eventlog: could not clear intent ${intentFile.getName}")
    }
    Stats(recovered, merged.size, filesBefore, EventLog.listFiles(dir).size)
  }
}
