package graft.operators

import scala.util.Random

/** Pure-Scala Isolation Forest (Liu, Ting & Zhou, ICDM 2008) — replaces the
  * reference's `com.linkedin.isolation-forest` dependency (reference
  * `spark_scala_impl/build.gradle:22`, used at `Main.scala:302-314`), which
  * is not available offline (SURVEY §2.11 M6).
  *
  * The model is intentionally driver/executor-local: the reference fits one
  * forest per region on that region's history (≤ a few thousand daily
  * rows), so each fit is tiny. Distribution happens ACROSS regions (see
  * [[RegionScorers]]), not within a fit — the right decomposition at scale:
  * thousands of independent small models, one `mapGroups` shuffle total.
  *
  * Parameters mirror the reference: numTrees=100, maxSamples=|history|,
  * contamination=0, seed=1.
  */
object IsolationForest {

  sealed trait Node
  final case class Internal(feature: Int, splitValue: Double,
      left: Node, right: Node) extends Node
  /** External node; `size` = training points that ended here. */
  final case class External(size: Int) extends Node

  final case class Model(trees: Array[Node], sampleSize: Int) {

    /** Expected path length E[h(x)] over the forest. */
    def expectedPathLength(x: Array[Double]): Double = {
      var total = 0.0
      var t = 0
      while (t < trees.length) {
        total += pathLength(trees(t), x, 0)
        t += 1
      }
      total / trees.length
    }

    /** Anomaly score s(x) = 2^(−E[h]/c(ψ)) ∈ (0, 1); → 1 = anomalous. */
    def score(x: Array[Double]): Double = {
      val c = avgPathLength(sampleSize)
      if (c <= 0.0) 0.5
      else math.pow(2.0, -expectedPathLength(x) / c)
    }
  }

  /** c(n): average unsuccessful-search path length in a BST of n nodes —
    * the normalizer from the paper. */
  def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  private def pathLength(node: Node, x: Array[Double], depth: Int): Double =
    node match {
      case External(size) => depth + avgPathLength(size)
      case Internal(f, v, l, r) =>
        pathLength(if (x(f) < v) l else r, x, depth + 1)
    }

  /** Fit a forest. `maxSamples <= 0` means use the full data per tree
    * (the reference's maxSamples=|history| setting). */
  def fit(data: Array[Array[Double]], numTrees: Int = 100,
      maxSamples: Int = 0, seed: Long = 1L): Model = {
    require(data.nonEmpty, "isolation forest needs at least one row")
    val psi = if (maxSamples <= 0 || maxSamples > data.length) data.length
      else maxSamples
    val heightLimit = math.ceil(
      math.log(math.max(psi, 2)) / math.log(2.0)).toInt
    val rnd = new Random(seed)
    val trees = Array.fill(numTrees) {
      val sample =
        if (psi == data.length) data
        else Array.fill(psi)(data(rnd.nextInt(data.length)))
      buildTree(sample, 0, heightLimit, rnd)
    }
    Model(trees, psi)
  }

  private def buildTree(sample: Array[Array[Double]], depth: Int,
      heightLimit: Int, rnd: Random): Node = {
    if (depth >= heightLimit || sample.length <= 1) External(sample.length)
    else {
      val dims = sample(0).length
      // pick among features that still vary; give up → external
      val candidates = (0 until dims).filter { f =>
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        sample.foreach { row => val v = row(f); if (v < mn) mn = v; if (v > mx) mx = v }
        mx > mn
      }
      if (candidates.isEmpty) External(sample.length)
      else {
        val f = candidates(rnd.nextInt(candidates.length))
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        sample.foreach { row => val v = row(f); if (v < mn) mn = v; if (v > mx) mx = v }
        val split = mn + rnd.nextDouble() * (mx - mn)
        val (l, r) = sample.partition(_(f) < split)
        if (l.isEmpty || r.isEmpty) External(sample.length)
        else Internal(f, split,
          buildTree(l, depth + 1, heightLimit, rnd),
          buildTree(r, depth + 1, heightLimit, rnd))
      }
    }
  }
}
