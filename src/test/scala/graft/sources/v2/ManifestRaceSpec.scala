package graft.sources.v2

import java.nio.file.Files

/** The cross-PROCESS manifest-writer race, driven for real: a child
  * JVM ([[ManifestRaceChild]]) and this test process commit
  * interleaved appends to ONE store. The round-8 lost-update design
  * fix (each commit writes its OWN delta segment, never a rewrite of
  * shared state) means concurrent writers can collide on a seq number
  * — both files survive under distinct uuids — but can never drop
  * each other's entries. This spec is the two-process witness the
  * single-JVM `EventLogManifestSpec` could not provide. */
class ManifestRaceSpec extends graft.SparkTestBase {

  private val PerWriter = 6 // 2×6 + 1 seed < CheckpointEvery: the race
  // under test is segment APPENDS; checkpoint folding is documented
  // single-maintainer and stays out of the window

  private def entry(name: String): EventLog.ManifestEntry =
    EventLog.ManifestEntry(name, 1, 0L, 0L, Seq("a"), Seq(1L),
      Some(Seq(1L)), Some((0L, 0L)), Some((0L, 0L)))

  test("two OS processes appending concurrently lose no entries") {
    val dir = Files.createTempDirectory("gelrace").toString
    EventLog.appendManifest(dir, Seq(entry("seed.gel"))) // version 1
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val child = new ProcessBuilder(javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.sources.v2.ManifestRaceChild", dir, PerWriter.toString)
      .redirectErrorStream(true)
      .start()
    // parent commits ITS six while the child commits its own
    (1 to PerWriter).foreach { k =>
      EventLog.appendManifest(dir, Seq(entry(s"parent_$k.gel")))
      Thread.sleep(15)
    }
    val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
    assert(child.waitFor() == 0, s"child failed:\n$out")
    assert(out.contains("CHILD_DONE"), s"child did not finish:\n$out")

    val man = EventLog.readManifest(dir)
    val expected = Set("seed.gel") ++
      (1 to PerWriter).map(k => s"parent_$k.gel") ++
      (1 to PerWriter).map(k => s"child_$k.gel")
    assert(man.keySet == expected,
      s"lost entries: missing ${expected -- man.keySet}")
    // every commit's segment file survives — colliding seqs differ by
    // uuid, so a collision widens one version, never drops a commit
    val segs = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => EventLog.isSegmentName(f.getName))
    assert(segs.size == 1 + 2 * PerWriter,
      s"expected ${1 + 2 * PerWriter} surviving segments, got " +
        s"${segs.size}: ${segs.map(_.getName).sorted.mkString(", ")}")
    // and the fold (a later single-maintainer checkpoint) still sees
    // everything: force one and re-read
    (1 to EventLog.CheckpointEvery).foreach { k =>
      EventLog.appendManifest(dir, Seq(entry(s"post_$k.gel")))
    }
    val folded = EventLog.readManifest(dir)
    assert(expected.subsetOf(folded.keySet),
      "the checkpoint fold dropped raced entries")
  }
}

/** Child-process main for [[ManifestRaceSpec]]: `args = (dir, n)` —
  * commit n single-entry manifest appends with small sleeps, print
  * CHILD_DONE, exit 0. */
object ManifestRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    (1 to n).foreach { k =>
      EventLog.appendManifest(dir, Seq(EventLog.ManifestEntry(
        s"child_$k.gel", 1, 0L, 0L, Seq("a"), Seq(1L),
        Some(Seq(1L)), Some((0L, 0L)), Some((0L, 0L)))))
      Thread.sleep(15)
    }
    println("CHILD_DONE")
  }
}
