package graft.sources.v2

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** COMMIT-LOCK OWNERSHIP AND AVAILABILITY (round 12).
  *
  * Ownership: release is conditional on still OWNING the lock (a
  * per-holder token written at claim time). Pre-fix, release was an
  * unconditional delete of the shared `_commit.lock` path — a
  * slow-but-alive holder that had been stale-broken would, on exit,
  * delete the RE-CLAIMED lock of the committer that broke it,
  * admitting a third committer and cascading the dual-holder edge
  * into duplicate manifest seqs.
  *
  * Availability: a dead holder costs one stale window
  * ([[EventLog.CommitLockStaleMs]]) — waiters break the corpse's lock
  * and proceed — while a LIVE heartbeating holder queues waiters for
  * up to [[EventLog.CommitLockGiveUpMs]] instead of failing them.
  * Pre-fix the acquire gave up at a fixed 120s < the 5-minute stale
  * window, so a committer crashing right after claiming made every
  * commit on the store THROW for minutes instead of waiting the
  * corpse out. */
class EventLogLockSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def writeStore(dir: String): Unit =
    Seq((1L, 1000L, 7L, "a", 5L), (2L, 2000L, 8L, "a", 6L),
        (3L, 3000L, 9L, "b", 7L), (4L, 4000L, 9L, "b", 8L))
      .toDF("event_id", "ts_us", "user_id", "event_type", "cents")
      .repartition(1)
      .write.format("graft-eventlog").mode("append").save(dir)

  private def withLockWindows[T](staleMs: Long, giveUpMs: Long)
      (body: => T): T = {
    val (s0, g0) = (EventLog.CommitLockStaleMs, EventLog.CommitLockGiveUpMs)
    EventLog.CommitLockStaleMs = staleMs
    EventLog.CommitLockGiveUpMs = giveUpMs
    try body
    finally {
      EventLog.CommitLockStaleMs = s0
      EventLog.CommitLockGiveUpMs = g0
    }
  }

  /** Re-appending an existing entry takes the full commit path (lock
    * and all) without changing table state. */
  private def touchCommit(dir: String): Long = {
    val entry = EventLog.readManifest(dir).values.head
    EventLog.appendManifest(dir, Seq(entry))
  }

  test("defaults: the acquire outlasts the stale window (the 120s-deadline bug shape is impossible)") {
    assert(EventLog.CommitLockGiveUpMs > EventLog.CommitLockStaleMs,
      "a waiter must be able to wait out a crashed holder's full " +
        "stale window before concluding the store is wedged")
  }

  test("a holder that died right after claiming costs one stale window, not thrown commits") {
    val dir = Files.createTempDirectory("gellock").toString
    writeStore(dir)
    withLockWindows(staleMs = 800, giveUpMs = 60000) {
      // the corpse: claimed (fresh mtime), wrote its token, then died —
      // pre-fix, waiters with a deadline shorter than the stale window
      // would throw; post-fix they wait the window out and break it
      val lock = new java.io.File(dir, EventLog.CommitLockName)
      assert(EventLog.fs.createNew(lock), "fixture: lock claim")
      EventLog.fs.writeAll(lock, "dead-holder-token".getBytes("UTF-8"))
      val before = EventLog.currentVersion(dir)
      val t0 = System.nanoTime()
      val seq = touchCommit(dir)
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(seq > before, "commit did not land after breaking the corpse")
      assert(elapsedMs >= 700,
        s"broke a FRESH lock in ${elapsedMs}ms — staleness must be waited out")
      assert(elapsedMs < 20000, s"took ${elapsedMs}ms — way past the window")
      assert(!EventLog.fs.isFile(lock) ||
        new String(EventLog.fs.readAll(lock), "UTF-8") != "dead-holder-token",
        "the corpse's lock survived the commit")
    }
  }

  test("a waiter queues behind a live heartbeating holder and commits after release") {
    val dir = Files.createTempDirectory("gellock").toString
    writeStore(dir)
    withLockWindows(staleMs = 1000, giveUpMs = 60000) {
      val lock = new java.io.File(dir, EventLog.CommitLockName)
      assert(EventLog.fs.createNew(lock))
      EventLog.fs.writeAll(lock, "live-holder".getBytes("UTF-8"))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val holder = new Thread(() => {
        val until = System.currentTimeMillis() + 2500
        while (System.currentTimeMillis() < until && !stop.get()) {
          EventLog.fs.touch(lock) // a long fold's heartbeat
          Thread.sleep(150)
        }
        EventLog.fs.delete(lock) // release
      })
      holder.setDaemon(true)
      holder.start()
      val before = EventLog.currentVersion(dir)
      val t0 = System.nanoTime()
      val seq = try touchCommit(dir) finally stop.set(true)
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      holder.join(10000)
      assert(seq > before)
      assert(elapsedMs >= 2000,
        s"waiter got in after ${elapsedMs}ms — it must have broken a " +
          "LIVE lock (heartbeats were refreshing it)")
    }
  }

  test("give-up fires only from live contention, and says so") {
    val dir = Files.createTempDirectory("gellock").toString
    writeStore(dir)
    // stale window far above the give-up: the lock below never looks
    // dead, so the waiter's only exit is the pressure give-up
    withLockWindows(staleMs = 60000, giveUpMs = 1200) {
      val lock = new java.io.File(dir, EventLog.CommitLockName)
      assert(EventLog.fs.createNew(lock))
      EventLog.fs.writeAll(lock, "busy-holder".getBytes("UTF-8"))
      try {
        val e = intercept[IllegalStateException](touchCommit(dir))
        assert(e.getMessage.contains("pathological commit pressure"),
          e.getMessage)
        assert(e.getMessage.contains("live committers"), e.getMessage)
      } finally EventLog.fs.delete(lock)
    }
  }

  test("a stale-broken holder's release leaves the re-claimed lock alone") {
    val dir = Files.createTempDirectory("gellock").toString
    writeStore(dir)
    withLockWindows(staleMs = 400, giveUpMs = 60000) {
      val lock = new java.io.File(dir, EventLog.CommitLockName)
      val aIn = new CountDownLatch(1)
      val aGo = new CountDownLatch(1)
      val tA = new Thread(() =>
        EventLog.withCommitLock(dir) { aIn.countDown(); aGo.await() })
      tA.setDaemon(true)
      tA.start()
      assert(aIn.await(5, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(600) // A stalls past the stale window, no heartbeat
      val bIn = new CountDownLatch(1)
      val bGo = new CountDownLatch(1)
      val tB = new Thread(() =>
        EventLog.withCommitLock(dir) { bIn.countDown(); bGo.await() })
      tB.setDaemon(true)
      tB.start()
      // B breaks A's stale lock and claims with ITS token
      assert(bIn.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "second committer never got past the stale lock")
      aGo.countDown() // A's release runs — pre-fix: unconditional delete
      tA.join(5000)
      assert(EventLog.fs.isFile(lock),
        "the broken holder's release deleted the re-claimed lock — a " +
          "third committer could now claim while the second still holds")
      bGo.countDown() // B's own release removes its lock
      tB.join(5000)
      assert(!EventLog.fs.isFile(lock), "owner's release left its lock")
      // the store still commits normally afterwards
      val before = EventLog.currentVersion(dir)
      assert(touchCommit(dir) > before)
    }
  }
}
