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

  test("sortedNeighborCandidates: finds planted near pairs, stays linear on cliques") {
    // a 40-doc clique of identical texts: plain in-bucket pairing would
    // emit 40·39/2 = 780 pairs; the window rule is capped at n·window
    val clique = (10L until 50L).map(i => (i, "same tokens in every clique doc"))
    val all = (docs.as[(Long, String)].collect().toSeq ++ clique).toDF("doc_id", "text")
    val sig = Dedup.minhashIndex(all, "doc_id", "text")
    val cand = Dedup.sortedNeighborCandidates(sig, "doc_id", bands = 8, window = 4)
      .as[(Long, Long)].collect().toSet
    // every doc pairs with at most bands·window successors
    assert(cand.size <= all.count() * 8 * 4)
    // clique successors within the window are all present
    assert(cand((10L, 11L)) && cand((10L, 14L)) && !cand((10L, 15L)))
    // the planted near-dups of doc 1 (ids 2, 3, 5 — within window 4) found
    assert(cand((1L, 2L)) && cand((1L, 3L)) && cand((1L, 5L)))
    // ordering invariant: always a < b
    assert(cand.forall { case (a, b) => a < b })
  }

  test("denseBucketCap: oversized buckets still collapse exact-dup cliques to the min id") {
    // 60 near-identical docs (identical signatures) + the base docs: with
    // cap=8 every bucket is "dense", yet the sig-group-min rule must
    // still collapse the clique exactly
    val clique = (100L until 160L).map(i =>
      (i, "the same clique text repeated in every document body here"))
    val all = (docs.as[(Long, String)].collect().toSeq ++ clique).toDF("doc_id", "text")
    val exact = Dedup.minhashLshKeep(all, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val capped = Dedup.minhashLshKeep(all, "doc_id", "text", threshold = 0.5,
      denseBucketCap = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(capped == exact, s"capped=$capped exact=$exact")
    assert(capped.count(_ >= 100L) == 1, "clique must keep exactly its min id")
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

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("existing corpus always wins; within-batch min-id rule applies") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "totally different content here entirely")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // dup of indexed 10 —
                                                    // rejected despite lower id
      (2L, "unrelated fresh text about new things entirely"),
      (3L, "unrelated fresh text about new things exactly"), // near-dup of 2
      (4L, "another novel document with its own words")).toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val admitted = Dedup.incrementalMinhashKeep(index, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(admitted == Seq(2L, 4L))
  }

  test("batched ingest equals monolithic dedup when batch ids follow corpus ids") {
    // the incremental rule ranks every indexed doc below every batch doc,
    // so indexing RAW batch 1 (not its survivors) then admitting batch 2
    // must reproduce the one-shot survivor set exactly
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
      "rho", "sigma", "tau", "upsilon", "phi")
    def doc(): String = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 30L).map(i => (i, doc()))
    val mutated = (30L until 45L).map { i =>
      val src = base(rnd.nextInt(base.size))._2.split(" ")
      (i, (src.init :+ vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val all = (base ++ mutated).toDF("doc_id", "text")
    val batch1 = all.where($"doc_id" < 30)
    val batch2 = all.where($"doc_id" >= 30)

    val oneShot = Dedup.minhashLshKeep(all, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val kept1 = Dedup.minhashLshKeep(batch1, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val admitted2 = Dedup.incrementalMinhashKeep(
        Dedup.minhashIndex(batch1, "doc_id", "text"), batch2, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert((kept1 ++ admitted2).sorted == oneShot)
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
