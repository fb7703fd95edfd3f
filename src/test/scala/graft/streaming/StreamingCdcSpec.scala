package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingCdc.{Change, SnapshotRow}

/** Streaming latest-wins upsert: event-time ordering across batches,
  * late-stale drops, tombstone propagation. */
class StreamingCdcSpec extends SparkTestBase {
  import spark.implicits._

  test("upserts are latest-wins by event time; stale late arrivals never override") {
    val input = MemoryStream[Change](spark)
    val name = s"cdc_${System.nanoTime()}"
    val q = StreamingCdc.snapshots(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("cdc").toString)
      .start()
    def latest(): Map[Long, SnapshotRow] =
      spark.table(name).as[SnapshotRow].collect()
        .groupBy(_.key).view.mapValues(_.maxBy(_.nVersions)).toMap
    try {
      // batch 1: two keys
      input.addData(Change(100L, 1L, "signup", 1.0), Change(100L, 2L, "signup", 2.0))
      q.processAllAvailable()
      assert(latest()(1L).kind == "signup")

      // batch 2: key 1 upserts forward; key 2 gets a LATE STALE change
      // (us=50 < 100) that must not override state but must count
      input.addData(Change(200L, 1L, "purchase", 10.0), Change(50L, 2L, "old", 9.0))
      q.processAllAvailable()
      val m2 = latest()
      assert(m2(1L).kind == "purchase" && m2(1L).us == 200L)
      assert(m2(2L).kind == "signup" && m2(2L).us == 100L,
        "stale version must not override")
      assert(m2(2L).nVersions == 2L, "stale version still audits")

      // batch 3: tombstone key 1, then a NEWER upsert revives it in batch 4
      input.addData(Change(300L, 1L, "x", 0.0, delete = true))
      q.processAllAvailable()
      assert(latest()(1L).tombstoned)
      input.addData(Change(400L, 1L, "signup", 5.0))
      q.processAllAvailable()
      val m4 = latest()
      assert(!m4(1L).tombstoned && m4(1L).us == 400L && m4(1L).nVersions == 4L)
    } finally q.stop()
  }

  test("within-batch ordering applies by event time, not arrival order") {
    val out = StreamingCdc.apply(None, Seq(
      Change(300L, 9L, "c", 3.0), Change(100L, 9L, "a", 1.0), Change(200L, 9L, "b", 2.0)))
    assert(out.exists(s => s.kind == "c" && s.us == 300L && s.nVersions == 3L))
  }

  test("equal-event-time delete wins regardless of micro-batch split") {
    val up = Change(100L, 9L, "a", 1.0)
    val del = Change(100L, 9L, "x", 0.0, delete = true)
    // every split of {upsert, delete} at the same us must converge to the
    // same final state: tombstoned at us=100, both versions audited
    val together = StreamingCdc.apply(None, Seq(up, del))
    val upThenDel = StreamingCdc.apply(StreamingCdc.apply(None, Seq(up)), Seq(del))
    val delThenUp = StreamingCdc.apply(StreamingCdc.apply(None, Seq(del)), Seq(up))
    for ((out, label) <- Seq(together -> "one batch", upThenDel -> "upsert first",
        delThenUp -> "delete first")) {
      val st = out.get
      assert(st.tombstoned && st.us == 100L && st.nVersions == 2L,
        s"$label: $st")
    }
    // a tombstone never blocks a strictly NEWER upsert
    val revived = StreamingCdc.apply(delThenUp, Seq(Change(101L, 9L, "b", 2.0))).get
    assert(!revived.tombstoned && revived.us == 101L)
  }
}
