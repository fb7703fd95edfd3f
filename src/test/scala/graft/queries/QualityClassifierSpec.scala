package graft.queries

import graft.SparkTestBase

/** q152 behavioral contract: the weak-label bootstrap generalizes — the
  * trained model classifies a planted separable corpus (spam = one token
  * repeated; prose = diverse vocabulary) with high holdout accuracy,
  * including MID-BAND docs the heuristic refused to label. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def spam(i: Int, n: Int) =
    (s"spam$i " * n).trim // one repeated token: TTR ~ 1/n → low quality
  private def prose(i: Int, n: Int) =
    (0 until n).map(t => s"w${i}_$t").mkString(" ") // all-distinct: TTR 1

  test("classifier separates spam from prose, generalizing past the heuristic band") {
    val docs = (0 until 60).map { i =>
      // long docs land in the heuristic's confident extremes (train pool)
      if (i % 2 == 0) (i.toLong, spam(i, 150)) else (i.toLong, prose(i, 150))
    } ++ (60 until 80).map { i =>
      // 90-token docs: spam scores ~0.005 (bottom quartile, labeled 0);
      // prose scores 0.45 — between the quartile cuts (lo≈0.005 over the
      // 40-strong spam mass, hi=0.75 over the 30 long-prose docs), so
      // mid-band prose goes UNLABELED and is the generalization probe:
      // the model must call it good anyway.
      if (i % 2 == 0) (i.toLong, spam(i, 90)) else (i.toLong, prose(i, 90))
    }
    val out = Modeling.q152QualityClassifierOn(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Int]), r.getInt(2))).toMap
    // long docs: heuristic labels exist and the model agrees on ≥ 90%
    val trained = (0 until 60).map(i => i.toLong)
    val agree = trained.count { id =>
      val (weak, pred) = out(id); weak.contains(pred)
    }
    assert(agree >= 54, s"model agrees with its weak labels on only $agree/60")
    // mid-band prose had NO weak label (the heuristic abstained) — the
    // model must still recognize it as good
    val probes = (60 until 80).filter(_ % 2 == 1).map(_.toLong)
    probes.foreach { id =>
      assert(out(id)._1.isEmpty, s"doc $id unexpectedly weak-labeled")
    }
    val good = probes.count(id => out(id)._2 == 1)
    assert(good >= (probes.size * 9) / 10,
      s"only $good/${probes.size} unlabeled prose docs classified good")
  }
}
