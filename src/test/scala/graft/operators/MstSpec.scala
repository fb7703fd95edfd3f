package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Borůvka MST against a sequential Prim twin under the same (w, a, b)
  * total order — forests must agree edge-for-edge, including on
  * disconnected graphs (spanning forest) and equal-weight ties. */
class MstSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential Prim over each component with (w, a, b) lexicographic
    * edge order — the unique forest the distributed algorithm must
    * reproduce. */
  private def primForest(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[(Long, Long, Long, Long)]]
    for ((a, b, w) <- edges) {
      adj.getOrElseUpdate(a, mutable.ArrayBuffer()) += ((w, a, b, b))
      adj.getOrElseUpdate(b, mutable.ArrayBuffer()) += ((w, a, b, a))
    }
    val nodes = adj.keySet.toSeq.sorted
    val seen = mutable.Set.empty[Long]
    val forest = mutable.Set.empty[(Long, Long, Long)]
    for (start <- nodes if !seen(start)) {
      val pq = mutable.PriorityQueue.empty[(Long, Long, Long, Long)](
        Ordering.by[(Long, Long, Long, Long), (Long, Long, Long)](
          t => (t._1, t._2, t._3)).reverse)
      seen += start
      adj(start).foreach(pq.enqueue(_))
      while (pq.nonEmpty) {
        val (w, a, b, to) = pq.dequeue()
        if (!seen(to)) {
          seen += to
          forest += ((a, b, w))
          adj(to).foreach(pq.enqueue(_))
        }
      }
    }
    forest.toSet
  }

  private def run(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.boruvka(edges.toDF("a", "b", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("simple triangle drops the heaviest edge") {
    val e = Seq((1L, 2L, 10L), (2L, 3L, 20L), (1L, 3L, 30L))
    assert(run(e) == Set((1L, 2L, 10L), (2L, 3L, 20L)))
  }

  test("matches Prim on a dense random-ish weighted graph") {
    // deterministic pseudo-weights; complete graph K10
    val e = for { a <- 1L to 10L; b <- (a + 1) to 10L }
      yield (a, b, (a * 7919L + b * 104729L) % 1000L)
    val got = run(e)
    assert(got == primForest(e))
    assert(got.size == 9)
  }

  test("equal weights resolve by (a, b) tie-break, matching Prim") {
    // all weights equal: the unique forest under (w,a,b) order
    val e = for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b, 5L)
    val got = run(e)
    assert(got == primForest(e))
    assert(got.size == 5)
  }

  test("disconnected graph yields a spanning forest per component") {
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L),
      (10L, 11L, 4L), (11L, 12L, 5L), (10L, 12L, 1L))
    val got = run(e)
    assert(got == primForest(e))
    assert(got.size == 4) // 2 components of 3 nodes → 2 edges each
  }

  test("single edge and empty-cross-round convergence") {
    assert(run(Seq((7L, 8L, 42L))) == Set((7L, 8L, 42L)))
  }

  test("monotone path: deep pointer chains in the contraction match Prim") {
    // a path with strictly increasing weights makes every interior node
    // pick its LEFT edge in round one — the picked-edge graph is a
    // single mutual 2-cycle (1⇄2) plus one chain of depth n−2, the
    // adversarial shape for the pointer-doubling contraction
    val n = 60L
    val e = (1L until n).map(i => (i, i + 1, i))
    val got = run(e)
    assert(got == primForest(e))
    assert(got.size == (n - 1).toInt) // the whole path IS the MST
  }

  test("weights forcing many mutual pairs per round match Prim") {
    // K12 with weights crafted so round one collapses into several
    // independent mutual 2-cycles that later rounds must merge
    val e = for { a <- 1L to 12L; b <- (a + 1) to 12L }
      yield (a, b, ((a * 31L + b * 17L) % 7L) * 100L + a + b)
    val got = run(e)
    assert(got == primForest(e))
    assert(got.size == 11)
  }

  test("q197 on real sf0.001 testdata: forest is acyclic and spans components") {
    val dir = "/root/testdata/sf0.001"
    val forest = graft.queries.Reliability.q197MstBoruvka(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(forest.nonEmpty)
    // forest property: |E| = |V| - #components, verified via union-find
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var cycles = 0
    for ((a, b, _) <- forest) {
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) cycles += 1 else parent(ra) = rb
    }
    assert(cycles == 0, "MST output contained a cycle")
  }
}
