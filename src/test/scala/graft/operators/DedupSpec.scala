package graft.operators

import graft.SparkTestBase
import graft.functions.VectorFunctions

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),      // exact dup of 1
    (3L, "alpha beta gamma delta epsilon eta"),       // near-dup of 1 (J=5/7)
    (4L, "totally different content here entirely"),
    (5L, "alpha beta gamma delta epsilon zeta")       // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactKeep keeps the min id per identical text") {
    val kept = Dedup.exactKeep(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("minhashLshKeep also removes the near-duplicate") {
    val kept = Dedup.minhashLshKeep(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L)) // 3 caught by Jaccard 5/7 ≈ 0.714 ≥ 0.5
  }

  test("embeddingKeep drops bucket-colliding high-cosine rows, min id wins") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.11f, 0.001f, 0.0f)), // near-dup of 1
      (3L, Array(-1.0f, 0.5f, 0.2f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val planes = VectorFunctions.gaussianPlanes(4, 4, 42L)
    val kept = Dedup.embeddingKeep(vecs, "vec_id", "embedding", planes, 0.99)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }
}

class FastDedupSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("xxhash64 minhash dedup matches the md5 variant's survivor set") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta"),
      (4L, "totally different content here entirely")).toDF("doc_id", "text")
    val md5Kept = Dedup.minhashLshKeep(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val fastKept = Dedup.fastMinhashLshKeep(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fastKept == md5Kept)
    assert(fastKept == Seq(1L, 4L))
  }

  test("q57 survivor set tracks q53 on the test corpus (only band-recall may differ)") {
    // both variants VERIFY candidates with exact Jaccard >= 0.5, so any
    // survivor-set difference comes solely from which candidates the two
    // hash families' bands surface — assert the corpus-level agreement
    val dir = "/root/testdata/sf0.001"
    val md5Kept = graft.SparkEntry.queries("q53_dedup_minhash_keep")(spark, dir)
      .as[Long].collect().toSet
    val fastKept = graft.SparkEntry.queries("q57_dedup_minhash_fast")(spark, dir)
      .as[Long].collect().toSet
    spark.catalog.clearCache()
    val n = graft.sources.Tables.documents(spark, dir).count()
    val symDiff = (md5Kept.diff(fastKept) ++ fastKept.diff(md5Kept)).size
    assert(symDiff <= n * 0.05,
      s"families disagree on $symDiff of $n docs (md5 kept ${md5Kept.size}, fast kept ${fastKept.size})")
  }
}
