package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quantitative verification for the SimHash near-dup path (q32/q33):
  * on a planted corpus, every reported Hamming ≤ 8 pair must be a true
  * high-Jaccard pair (exact Jaccard computed independently in-test), and
  * every planted near-duplicate must be found. Complements the DuckDB
  * oracles (which hash-check signatures and the full Hamming≤8 pair set
  * on the corpus tables): this spec checks the SEMANTIC claim — small
  * Hamming really means high Jaccard — on a distribution designed to
  * straddle the threshold. Signatures use the 60-bit md5-prefix token
  * hash (lanes 60-63 vote 0), so "of 64" expectations below carry 60
  * informative bits — the planted margins absorb the difference. */
class SimHashPairsSpec extends SparkTestBase {
  import spark.implicits._

  /** 10 base docs of 50 seeded random tokens; each gets a near-dup sharing
    * 48/50 tokens (J = 48/52 ≈ 0.92 ⇒ angle ≈ 0.28 rad ⇒ expected SimHash
    * Hamming ≈ 6 of 64 — inside the ≤8 cut; at J≈0.8 the expectation is
    * already ≈9, OUTSIDE it, which is the threshold's design point);
    * 20 unrelated docs of fresh tokens. */
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11L)
    def tok() = "t" + rnd.nextInt(100000)
    val bases = (0 until 10).map { i =>
      (i.toLong, Seq.fill(50)(tok()).distinct)
    }
    val nearDups = bases.map { case (id, toks) =>
      (100L + id, toks.drop(2) ++ Seq.fill(2)(tok()))
    }
    val unrelated = (0 until 20).map(i => (200L + i, Seq.fill(50)(tok()).distinct))
    (bases ++ nearDups ++ unrelated).map { case (id, toks) =>
      (id, toks.mkString(" "))
    }
  }

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("q33 machinery: banding is EXACT at the Hamming cut; planted dups found") {
    val byId = corpus.toMap
    val docs = corpus.toDF("doc_id", "text")
    val pairs = PipelineQueries.simhashNearDupPairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // completeness contract: reported pairs == ALL pairs at Hamming <= 8,
    // computed brute-force over the signatures (banding must lose nothing
    // within the cut — pigeonhole over maxHamming+1 disjoint bands)
    val sigs = PipelineQueries.simhashSignatures(docs)
      .as[(Long, Long)].collect().toMap
    val ids = sigs.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 8
    } yield (ids(i), ids(j))).toSet
    assert(pairs == truth,
      s"banding lost ${truth.diff(pairs)} / invented ${pairs.diff(truth)}")

    // planted (base, base+100) pairs at J ≈ 0.92 ⇒ E[Hamming] ≈ 6: the
    // vast majority must land inside the cut under the fixed seed
    val planted = (0L until 10L).map(i => (i, 100L + i)).toSet
    val found = planted.intersect(pairs)
    assert(found.size >= 8,
      s"found only ${found.size}/10 planted near-dups: missing ${planted.diff(pairs)}")

    // every reported pair must be genuinely similar: SimHash at Hamming<=8
    // of 64 bits implies high token overlap; assert the exact-Jaccard floor
    val floors = pairs.toSeq.map { case (a, b) => jaccard(byId(a), byId(b)) }
    assert(floors.forall(_ >= 0.5),
      s"false positive below Jaccard 0.5: min=${floors.min}")
  }

  test("q32 signatures: identical token sets collide; disjoint sets are far") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),   // same set, reordered
      (3L, "wholly unrelated words here entirely different")
    ).toDF("doc_id", "text")
    val sig = PipelineQueries.simhashSignatures(docs)
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(sig(0) == sig(1), "order must not affect the signature")
    val ham = java.lang.Long.bitCount(sig(0) ^ sig(2))
    assert(ham > 8, s"unrelated docs at Hamming $ham")
  }
}
