package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Maintenance for the partition-per-epoch layout the streaming ingests
  * write (`path/__batch=<id>/part-*`): at-least-once-safe appends, but
  * the directory count grows with epochs and each holds tiny files —
  * the classic streaming-parquet small-files problem. [[compact]] folds
  * every committed epoch below a cutoff into ONE partition.
  *
  * Called from inside `foreachBatch` (epochs run serially, so the
  * read-rewrite-delete below has no concurrent writer, and the stream
  * itself — the only required reader — is between reads).
  *
  * Crash ordering: (1) write the merged rows to a temp dir, (2) rename
  * it to its final `__batch=-<cutoff>` partition (negative = compacted,
  * can never collide with a real epoch id, and never equals the CURRENT
  * epoch so replay own-epoch exclusion still works), (3) delete the
  * folded partitions. A crash after (2) leaves rows duplicated between
  * the compacted partition and not-yet-deleted epochs — TRANSIENTLY:
  * epoch ids are monotone, so once `__batch=-<cutoff>` exists it already
  * holds every row below the cutoff, and the replayed pass detects it
  * and ONLY deletes the leftover directories (re-merging would bake the
  * duplicates in permanently — that is why the dest-exists branch must
  * never read+rewrite). Between the crash and the replay, duplicates are
  * visible: benign for set-semantics consumers (semi/anti probes);
  * anything that COUNTS matches must dedup first (CurationGate's
  * known-span ratio does exactly that). A crash before (2) leaves the
  * store untouched.
  *
  * Only epochs STRICTLY BELOW the current batch id may be folded: the
  * current epoch's partition may be a half-written replay artifact, and
  * folding it would defeat the own-epoch exclusion on replay. */
object EpochStore {

  /** Fold all partitions with `__batch < cutoff` (including earlier
    * compacted ones, which are negative) into `__batch=-cutoff`.
    * No-op when fewer than `minPartitions` partitions would fold.
    * `subPartitionBy` preserves a nested partition layout (e.g. the
    * sharded ingest's `__batch=N/shard=X`) through the fold — without it
    * the compacted partition would flatten the inner dirs and lose
    * their scan pruning. */
  def compact(spark: SparkSession, path: String, cutoff: Long,
      minPartitions: Int = 2, targetFiles: Int = 1,
      subPartitionBy: Seq[String] = Nil): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    val dest = new Path(path, s"__batch=-$cutoff")
    val parts = fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__batch="))
      .map(s => s.getPath)
      .filter(p => p.getName.stripPrefix("__batch=").toLong < cutoff)
    // Crash-replay: the compacted partition already exists ⇒ the prior
    // attempt's merge was complete (rename is the commit point; epochs
    // below the cutoff cannot appear afterwards), so the leftover folded
    // dirs are strict duplicates of its content — delete them, never
    // re-merge (a read of dest + leftovers would write each leftover row
    // twice into the new dest, making the duplication permanent).
    if (fs.exists(dest)) {
      parts.filterNot(_.getName == dest.getName).foreach(p => fs.delete(p, true))
      return
    }
    if (parts.size < minPartitions) return

    val merged = spark.read.parquet(path)
      .where(col("__batch") < cutoff)
      .drop("__batch")
      .coalesce(targetFiles)
    val tmp = new Path(path, s"__compact_tmp_$cutoff")
    fs.delete(tmp, true) // stale temp from a crashed previous attempt
    val writer = merged.write.mode(SaveMode.Overwrite)
    (if (subPartitionBy.nonEmpty) writer.partitionBy(subPartitionBy: _*)
     else writer).parquet(tmp.toString)
    // the _SUCCESS/_metadata markers must not survive the rename — a
    // partition dir containing them still reads fine, but keep it clean
    fs.delete(new Path(tmp, "_SUCCESS"), false)
    require(fs.rename(tmp, dest), s"rename $tmp -> $dest failed")
    parts.foreach(p => fs.delete(p, true))
  }
}
