package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class IsolationForestSpec extends AnyFunSuite {

  private def cluster(n: Int, center: Double): Array[Array[Double]] =
    Array.tabulate(n)(i => Array(center + (i % 7) * 0.01, center - (i % 5) * 0.01))

  test("planted outlier scores far above the inlier cloud") {
    val data = cluster(200, 1.0)
    val model = IsolationForest.fit(data, numTrees = 100, seed = 1L)
    val inlierScores = data.take(20).map(model.score)
    val outlier = model.score(Array(50.0, -50.0))
    assert(outlier > 0.6)
    assert(inlierScores.forall(outlier > _))
  }

  test("scores are in (0,1) and deterministic under a fixed seed") {
    val data = cluster(100, 3.0)
    val a = IsolationForest.fit(data, seed = 7L).score(Array(3.0, 3.0))
    val b = IsolationForest.fit(data, seed = 7L).score(Array(3.0, 3.0))
    assert(a == b)
    assert(a > 0.0 && a < 1.0)
  }

  test("avgPathLength normalizer: c(1)=0, c(2)>0, monotone") {
    assert(IsolationForest.avgPathLength(1) == 0.0)
    val c = (2 to 100).map(IsolationForest.avgPathLength)
    assert(c.head > 0.0)
    assert(c.sliding(2).forall { case Seq(x, y) => y > x })
  }

  test("constant data degenerates gracefully (no split possible)") {
    val data = Array.fill(50)(Array(1.0, 1.0))
    val model = IsolationForest.fit(data, seed = 1L)
    val s = model.score(Array(1.0, 1.0))
    assert(s > 0.0 && s <= 1.0)
  }
}
