package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert — the continuous counterpart of the batch
  * changelog compaction (`ScalePipeline.q80CdcSnapshot`): maintain each
  * key's latest-wins state in the state store and emit the key's new
  * snapshot row whenever a change actually applies.
  *
  * Latest-wins is by EVENT time, not arrival order: a late-arriving
  * older version must not override newer state, so state keeps the
  * applied high-water `us` and drops stale versions (they still count
  * into `nVersions` — the audit trail survives reordering). Tombstones
  * (`delete = true` changes) emit a final marker row so a downstream
  * sink can propagate the delete, and clear the stored value.
  *
  * State is O(1) per key (one version row) — the property that lets a
  * 100 TB keyspace stream forever; RocksDB state store holds the keys.
  */
object StreamingCdc {

  case class Change(us: Long, key: Long, kind: String, value: Double,
      delete: Boolean = false)

  case class KeyState(us: Long, kind: String, value: Double,
      nVersions: Long, tombstoned: Boolean)

  case class SnapshotRow(key: Long, us: Long, kind: String, value: Double,
      nVersions: Long, tombstoned: Boolean)

  /** Apply a batch of changes to one key's state; stale (< high-water)
    * event times never override, tombstones stick until a NEWER upsert
    * revives the key. The equal-event-time tie rule is split-invariant:
    * a delete wins over an upsert at the same `us` no matter how the two
    * changes land across micro-batches — within a batch upserts apply
    * first (sort) and the equal-`us` delete then overrides; across
    * batches an equal-`us` upsert never overrides an applied tombstone,
    * and an equal-`us` delete does override an applied upsert. */
  private[streaming] def apply(s: Option[KeyState], changes: Seq[Change]): Option[KeyState] =
    changes.sortBy(c => (c.us, c.delete)).foldLeft(s) { (cur, c) =>
      val overrides = cur match {
        case Some(st) =>
          c.us > st.us || (c.us == st.us && c.delete && !st.tombstoned)
        case None => true
      }
      if (!overrides) cur.map(st => st.copy(nVersions = st.nVersions + 1))
      else {
        val n = cur.map(_.nVersions).getOrElse(0L) + 1
        if (c.delete) Some(KeyState(c.us, "", 0.0, n, tombstoned = true))
        else Some(KeyState(c.us, c.kind, c.value, n, tombstoned = false))
      }
    }

  /** Changelog stream → per-key snapshot updates (Update output mode:
    * one row per key per micro-batch that touched it). */
  def snapshots(changes: Dataset[Change]): Dataset[SnapshotRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, SnapshotRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[KeyState]) =>
          val prev = state.getOption
          val next = apply(prev, rows.toSeq)
          next.foreach(state.update)
          next match {
            case Some(st) if prev.forall(_ != st) =>
              Iterator(SnapshotRow(key, st.us, st.kind, st.value,
                st.nVersions, st.tombstoned))
            case _ => Iterator.empty
          }
      }
  }
}
