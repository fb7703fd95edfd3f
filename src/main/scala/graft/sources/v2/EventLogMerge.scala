package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Copy-on-write MERGE (upsert) for `graft-eventlog` stores — the
  * row-level mutation rung after q294's whole-file `DELETE FROM`:
  * a batch of rows keyed by `event_id` is applied as
  *
  *  - **MATCHED → UPDATE**: every store row whose `event_id` appears in
  *    the batch is replaced by the batch row (all columns), and ONLY
  *    the files that actually contain a match are rewritten;
  *  - **NOT MATCHED → INSERT**: batch keys matching nothing become new
  *    rows, written as fresh per-day (and per-bucket, on a bucketed
  *    store) files — untouched files are never rewritten.
  *
  * This is the Delta-style copy-on-write shape: find touched files,
  * rewrite exactly those, commit the swap as ONE manifest segment, so
  * the whole merge is ONE version. History is retention-bounded the
  * same way compaction's is: row-level time travel at a pre-merge
  * version refuses loudly once the replaced bytes are gone, while the
  * version's metadata aggregates (counts/sums/spans) still answer from
  * the commit log, and the changes feed refuses across the rewrite
  * window.
  *
  * Scale shape, stated honestly:
  *
  *  - The match scan is KEY-LANE PRUNED: the manifest's per-file
  *    `event_id` (min, max) bounds eliminate every file that provably
  *    contains no batch key before anything is decoded — on a
  *    sequential-id feed (day files carry tight disjoint ranges) a
  *    small merge touches a handful of files, not the store. Files
  *    without bounds (legacy manifests, header fallbacks) stay
  *    candidates, so pruning can only skip work, never matches.
  *    Candidates decode once, executor-parallel (one task per file):
  *    O(candidate bytes) READ, O(touched files) WRITTEN. For
  *    SCATTERED-key feeds (ranges admit everything) the per-file BLOOM
  *    sidecars ([[EventLogBloom]]) extend the prune: each candidate's
  *    task probes its sidecar against the batch keys and returns
  *    before any decode when nothing can match.
  *  - The batch is driver-collected and closure-broadcast, so it must
  *    be BOUNDED: [[DefaultMaxBatchRows]] refuses loudly beyond the
  *    CDC-batch envelope. An unbounded merge (batch ~ store) is a
  *    different algorithm — a shuffle join plus full rewrite — and
  *    pretending this code path covers it would hide an O(driver-OOM)
  *    cliff; refusing names the real bound.
  *  - Like [[EventLogCompact]], the rewrite tasks write temps into the
  *    store directory, so driver and executors must share one
  *    filesystem — local mode is the enforceable contract (the whole
  *    format is `java.io.File`-based).
  *
  * Crash safety reuses the compactor's intent journal (one intent for
  * the WHOLE merge): all outputs visible → roll forward (inputs
  * deleted, manifest repointed); any output missing → roll back
  * (partials deleted, every input still alive). `upsert` begins by
  * recovering any intent a previous crash left behind.
  *
  * Rails (all loud, never silent):
  *  - duplicate `event_id`s in the batch refuse (ambiguous UPDATE);
  *  - an update that moves a matched row across its UTC day refuses
  *    (file names and the day profile assume single-day files —
  *    delete + insert expresses a day move honestly);
  *  - on a bucketed store, an update that moves a row to a different
  *    `user_id` bucket refuses (it would break the co-partitioning the
  *    storage-partitioned joins plan from); inserts are routed to
  *    their correct bucket files. */
object EventLogMerge {

  /** `matched` = store rows updated; `candidateFiles` = files the
    * id-RANGE prune admitted (their tasks ran); `bloomSkipped` = of
    * those, files whose bloom sidecar proved no batch key can be
    * present — their tasks returned before any record decode;
    * `rewrittenFiles` = files that contained ≥1 match (only these were
    * rewritten); `inserted` = batch rows that matched nothing;
    * `version` = the store's manifest version after the single merge
    * commit. */
  case class Stats(matched: Long, candidateFiles: Int, bloomSkipped: Int,
    rewrittenFiles: Int, inserted: Long, insertFiles: Int, version: Long)

  /** The CDC-batch envelope: the batch is driver-collected and shipped
    * in the task closure, ~64 B/row heap — 4M rows ≈ 256 MB, the edge
    * of comfortable for a 128 GiB driver shared with everything else.
    * Beyond it, shard the batch (several merges) or use a shuffle-join
    * merge (not this operator). */
  val DefaultMaxBatchRows: Int = 4 * 1024 * 1024

  private val Day = 86400000000L

  /** Apply `updates` (schema `event_id, ts_us, user_id, event_type,
    * cents` — [[EventLog.Schema]]) to the store at `dir` as one
    * copy-on-write merge commit. */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
      maxBatchRows: Int = DefaultMaxBatchRows): Stats = {
    require(spark.sparkContext.isLocal,
      "graft-eventlog merge: the store is a local-filesystem format; " +
        "the executor-parallel rewrite requires driver and executors " +
        "to share one filesystem (local mode) — run merges from a " +
        "local-mode maintenance job against the store's mount.")
    EventLogCompact.recover(dir)

    val want = EventLog.Schema.fieldNames.toSeq
    require(want.forall(updates.columns.contains),
      s"graft-eventlog merge: batch must carry ${want.mkString(", ")}; " +
        s"got ${updates.columns.mkString(", ")}")
    // count before collect: a silently huge batch must refuse BEFORE the
    // driver materializes it, not OOM trying
    val batchRows = updates.count()
    require(batchRows <= maxBatchRows,
      s"graft-eventlog merge: batch has $batchRows rows > cap " +
        s"$maxBatchRows — the batch is driver-collected and " +
        "closure-broadcast; shard it into several merges, or this " +
        "store needs a shuffle-join merge (a different operator)")
    val batch: Seq[(Long, Long, Long, String, Long)] = updates
      .selectExpr("cast(event_id as bigint)", "cast(ts_us as bigint)",
        "cast(user_id as bigint)", "cast(event_type as string)",
        "cast(cents as bigint)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    val byId: Map[Long, (Long, Long, Long, String, Long)] =
      batch.map(r => r._1 -> r).toMap
    require(byId.size == batch.size,
      s"graft-eventlog merge: batch has ${batch.size - byId.size} " +
        "duplicate event_id(s) — an UPDATE keyed on a duplicated key is " +
        "ambiguous; dedup the batch first")

    val bucketing = EventLog.readBucketing(dir)
    // KEY-LANE PRUNE: a file whose manifest id-bounds cannot contain
    // any batch key is provably untouched — never decoded. Sorted keys
    // + one binary search per file; files without bounds (legacy
    // manifests, header fallbacks) stay candidates, so pruning can
    // only skip work, never matches.
    val sortedKeys = batch.map(_._1).sorted.toArray
    def intersects(lo: Long, hi: Long): Boolean = {
      val ip = java.util.Arrays.binarySearch(sortedKeys, lo) match {
        case found if found >= 0 => found
        case missing => -(missing + 1)
      }
      ip < sortedKeys.length && sortedKeys(ip) <= hi
    }
    val man = EventLog.readManifest(dir)
    val files = EventLog.listFiles(dir)
      .filter(f => man.get(f.getName).flatMap(_.idBounds) match {
        case Some((lo, hi)) => intersects(lo, hi)
        case None => true
      })
      .map(_.getAbsolutePath)

    // one task per CANDIDATE file: decode, substitute matches, rewrite
    // ONLY if touched. The batch ships as a BROADCAST (once per
    // executor, not once per task closure), bounded by the cap above.
    val byIdB = spark.sparkContext.broadcast(byId)
    val perFile: Seq[(String, Seq[Long], Option[(String, EventLog.ManifestEntry)], Boolean)] =
      if (files.isEmpty) Nil
      else spark.sparkContext.parallelize(files, files.size).map { path =>
        val byId = byIdB.value
        val f = new java.io.File(path)
        // BLOOM GATE (in the task, so probe work distributes): a
        // current sidecar that rejects every batch key proves the file
        // untouched without decoding a record — the scattered-key case
        // the range prune cannot help. Absent/stale sidecars decode.
        val bloomClear = EventLogBloom.load(f) match {
          case Some(b) => !byId.keysIterator.exists(b.mightContainLong)
          case None => false
        }
        if (bloomClear) (f.getName, Seq.empty[Long], None, true)
        else {
        val recs = EventLog.readAllRecords(f)
        val matched = recs.iterator.map(_._1).filter(byId.contains).toSeq
        if (matched.isEmpty) (f.getName, matched, None, false)
        else {
          val merged = recs.map { old =>
            byId.get(old._1) match {
              case Some(upd) =>
                require(Math.floorDiv(upd._2, Day) ==
                    Math.floorDiv(old._2, Day),
                  s"graft-eventlog merge: update for event_id ${old._1} " +
                    s"moves ts across a UTC day (${old._2} -> ${upd._2}) " +
                    "— day files and the day profile assume single-day " +
                    "rows; express a day move as DELETE + INSERT")
                bucketing.foreach { n =>
                  val b = EventLog.bucketOfName(f.getName)
                  require(b.forall(_ == GraftBucketFunction.bucketOf(upd._3, n)),
                    s"graft-eventlog merge: update for event_id ${old._1} " +
                      s"moves user_id ${old._3} -> ${upd._3} across " +
                      s"buckets (n=$n) — it would break the store's " +
                      "co-partitioning; express it as DELETE + INSERT")
                }
                upd
              case None => old
            }
          }
          val uuid = java.util.UUID.randomUUID().toString.take(8)
          val tmp = new java.io.File(f.getParent, s".inprogress.merge.$uuid")
          val fin = f.getName.stripSuffix(".gel") + s"-m$uuid.gel"
          val entry = EventLog.writeGelFile(tmp, fin,
            merged.sortBy(r => (r._2, r._1)))
          (f.getName, matched, Some((tmp.getName, entry)), false)
        }
        }
      }.collect().toSeq

    val matchedIds = perFile.iterator.flatMap(_._2).toSet
    val bloomSkipped = perFile.count(_._4)
    val rewrites = perFile.collect { case (orig, _, Some((tmp, e)), _) =>
      (orig, tmp, e)
    }

    // NOT MATCHED → INSERT: fresh per-(day, bucket) files, driver-side
    // (bounded by the batch cap), sorted like every writer output
    val inserts = batch.filterNot(r => matchedIds.contains(r._1))
    val insertOuts: Seq[(String, EventLog.ManifestEntry)] = inserts
      .groupBy(r => (Math.floorDiv(r._2, Day),
        bucketing.map(n => GraftBucketFunction.bucketOf(r._3, n))))
      .toSeq.sortBy { case ((day, b), _) => (day, b.getOrElse(-1)) }
      .map { case ((day, bucket), rs) =>
        val uuid = java.util.UUID.randomUUID().toString.take(8)
        val bTag = bucket.map(b => f"b$b%04d-").getOrElse("")
        val tmp = new java.io.File(dir, s".inprogress.merge.$uuid")
        val entry = EventLog.writeGelFile(tmp,
          f"day_$day%05d-" + bTag + s"u$uuid.gel",
          rs.sortBy(r => (r._2, r._1)))
        (tmp.getName, entry)
      }

    // ONE intent for the whole merge, committed through the compactor's
    // shared swap sequence — the merge is one commit, one version
    val temps = rewrites.map(_._2) ++ insertOuts.map(_._1)
    val entries = rewrites.map(_._3) ++ insertOuts.map(_._2)
    val removed = rewrites.map(_._1)
    if (entries.nonEmpty)
      EventLogCompact.commitSwap(dir,
        EventLogCompact.Intent(temps, entries, removed))
    Stats(matchedIds.size.toLong, files.size, bloomSkipped, rewrites.size,
      inserts.size.toLong, insertOuts.size, EventLog.currentVersion(dir))
  }
}
