package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

class EpochStoreSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def writeEpoch(path: String, batch: Long, ids: Range): Unit =
    ids.map(_.toLong).toDF("id")
      .write.mode("overwrite").parquet(s"$path/__batch=$batch")

  test("compact folds epochs below the cutoff and preserves rows") {
    val dir = Files.createTempDirectory("epochstore").toString
    writeEpoch(dir, 0, 0 until 10)
    writeEpoch(dir, 1, 10 until 25)
    writeEpoch(dir, 2, 25 until 30) // current epoch — must not fold
    EpochStore.compact(spark, dir, cutoff = 2)
    val back = spark.read.parquet(dir)
    assert(back.select("id").as[Long].collect().toSet == (0L until 30L).toSet)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      .filter(_.startsWith("__batch="))
    assert(names == Set("__batch=-2", "__batch=2"), names.toString)
  }

  test("crash BEFORE rename leaves a stale tmp dir; the next attempt recovers") {
    val dir = Files.createTempDirectory("epochstore_tmp").toString
    writeEpoch(dir, 0, 0 until 10)
    writeEpoch(dir, 1, 10 until 20)
    // simulate a prior attempt that died mid-write: a stale (and even
    // corrupt — non-parquet) temp dir for the same cutoff
    val tmp = new java.io.File(s"$dir/__compact_tmp_2")
    tmp.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/__compact_tmp_2/garbage"), "not parquet")
    EpochStore.compact(spark, dir, cutoff = 2)
    val back = spark.read.parquet(dir)
    assert(back.select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.filter(_.startsWith("__batch=")) == Set("__batch=-2"))
    assert(!names.exists(_.startsWith("__compact_tmp")), s"stale tmp survived: $names")
  }

  test("fewer than minPartitions epochs is a no-op; later compact folds the compacted partition too") {
    val dir = Files.createTempDirectory("epochstore_refold").toString
    writeEpoch(dir, 0, 0 until 5)
    EpochStore.compact(spark, dir, cutoff = 1) // one partition < minPartitions=2
    assert(new java.io.File(s"$dir/__batch=0").exists, "no-op must not touch the store")
    writeEpoch(dir, 1, 5 until 12)
    EpochStore.compact(spark, dir, cutoff = 2) // folds 0,1 -> -2
    writeEpoch(dir, 2, 12 until 20)
    writeEpoch(dir, 3, 20 until 21)
    EpochStore.compact(spark, dir, cutoff = 4) // folds -2,2,3 -> -4 (negative id refolds)
    val back = spark.read.parquet(dir)
    assert(back.select("id").as[Long].collect().toSet == (0L until 21L).toSet)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      .filter(_.startsWith("__batch="))
    assert(names == Set("__batch=-4"), names.toString)
  }

  test("replay after a crash between rename and delete does not bake duplicates") {
    val dir = Files.createTempDirectory("epochstore_crash").toString
    writeEpoch(dir, 0, 0 until 10)
    writeEpoch(dir, 1, 10 until 25)
    EpochStore.compact(spark, dir, cutoff = 2)
    // simulate the crash leftover: epoch 0 reappears AFTER the compacted
    // partition was committed (its rows are already inside __batch=-2)
    writeEpoch(dir, 0, 0 until 10)
    assert(spark.read.parquet(dir).count() == 35, "leftover visible pre-replay")
    EpochStore.compact(spark, dir, cutoff = 2) // the replayed pass
    val back = spark.read.parquet(dir)
    assert(back.count() == 25, s"duplicates baked in: ${back.count()}")
    assert(back.select("id").as[Long].collect().toSet == (0L until 25L).toSet)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
      .filter(_.startsWith("__batch="))
    assert(names == Set("__batch=-2"), names.toString)
  }
}
