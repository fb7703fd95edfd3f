package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** STREAMING INGEST × TIME-TRAVEL RETENTION (round 12): the
  * exactly-once sink lands every epoch as ONE manifest commit, so on a
  * streamed store "keep the last N VERSIONS" means "keep the last N
  * EPOCHS" — at a 1-second trigger, `set_retention(versions 10)` is a
  * TEN-SECOND time-travel window, not ten meaningful table states. The
  * arithmetic an operator must do:
  *
  *   window_seconds = keep_versions × trigger_interval_seconds
  *
  * The honest declaration for a streamed store is therefore AGE-based
  * (`retention.ms`), which protects wall-clock history regardless of
  * epoch cadence — at the measured fold-deferral cost this spec pins:
  * version-retention keeps the manifest log BOUNDED (folds fire as
  * epochs expire, segments stay ≈ keep + CheckpointEvery), while an
  * ms-window longer than the stream's lifetime defers every fold
  * (segments ≈ epoch count until age-out). Both sides measured under
  * a real 100-epoch MemoryStream. */
class StreamRetentionSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def runEpochs(dir: String, epochs: Int): Unit = {
    val input = MemoryStream[SinkEv](spark)
    val q = input.toDF().writeStream.format("graft-eventlog")
      .option("checkpointLocation",
        Files.createTempDirectory("gelsr-ckpt").toString)
      .start(dir)
    try {
      (1 to epochs).foreach { i =>
        input.addData(SinkEv(i.toLong, i.toLong, 7L, "a", i.toLong))
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  private def segmentCount(dir: String): Int =
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".gelmd"))

  private def readableAsOf(dir: String, v: Long): Boolean =
    try {
      spark.read.format("graft-eventlog").option("version", v.toString)
        .load(dir).count(); true
    } catch { case _: Exception => false }

  test("a 100-epoch stream under versions-retention: the window is N EPOCHS, the log stays bounded") {
    val dir = Files.createTempDirectory("gelsrv").toString
    EventLog.fs.mkdirs(new java.io.File(dir))
    EventLog.setRetention(dir, 10)
    runEpochs(dir, 100)
    val cur = EventLog.currentVersion(dir)
    assert(cur >= 100, s"one commit per epoch expected, got $cur")
    assert(spark.read.format("graft-eventlog").load(dir).count() == 100)
    // the DECLARED window: the last 10 versions read...
    assert(readableAsOf(dir, cur), "current version must read")
    assert(readableAsOf(dir, cur - 9), "a protected version must read")
    // ...but "10 versions" on this stream was ~10 EPOCHS of history:
    // epoch 50's state is ALREADY GONE after 100 epochs — the silent
    // shrinkage this spec exists to make loud. An operator wanting an
    // hour of history on a 1s-trigger stream needs versions=3600 or
    // (honestly) retention.ms.
    assert(!readableAsOf(dir, 50),
      "epoch 50 must have expired under versions(10) after 100 epochs")
    // fold-deferral, measured: retention only LAGS the checkpoint fold
    // by the protected window — expired epochs keep being absorbed, so
    // the segment count is bounded by keep + CheckpointEvery + one
    // in-flight batch, NOT by the epoch count
    val segs = segmentCount(dir)
    assert(segs <= 10 + EventLog.CheckpointEvery * 2,
      s"versions-retention let the manifest log grow unboundedly: " +
        s"$segs segments after 100 epochs")
  }

  test("a 100-epoch stream under ms-retention: full wall-clock history, every fold deferred") {
    val dir = Files.createTempDirectory("gelsrm").toString
    EventLog.fs.mkdirs(new java.io.File(dir))
    EventLog.setRetentionMs(dir, 3600L * 1000) // one hour >> the run
    runEpochs(dir, 100)
    val cur = EventLog.currentVersion(dir)
    assert(cur >= 100)
    // EVERY epoch of the run stays time-travelable — the guarantee an
    // operator actually wants from "keep an hour"
    assert(readableAsOf(dir, 1), "the first epoch must still read")
    assert(readableAsOf(dir, 50))
    assert(readableAsOf(dir, cur))
    // the measured cost: nothing in the run aged past the window, so
    // no fold fired — the manifest log holds ~one segment per epoch
    // until age-out (bounded by wall-clock, not by commit count)
    val segs = segmentCount(dir)
    assert(segs >= 99,
      s"expected ~100 deferred segments inside the ms window, got $segs")
    // planning still works off the unfolded log (cached parses): the
    // current read above proved it; this is the documented trade
  }
}
