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
