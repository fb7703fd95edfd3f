package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-center maintenance — the doubling algorithm (Charikar,
  * Chekuri, Feder, Motwani 1997): the continuous twin of the batch
  * farthest-point coreset ([[graft.operators.KCenter]], q140). The
  * batch greedy re-reads every point per pick; the monitor keeps at
  * most `k` centers and one radius as state and touches each streamed
  * point ONCE — diversity sampling that never revisits the stream.
  *
  * Per point `p`: if `p` lies farther than `2r` from every center it
  * becomes a center; when that makes `k+1` centers the radius doubles
  * (first merge: the minimum pairwise center distance) and a greedy
  * pass keeps only centers pairwise farther than the new radius. The
  * textbook invariant — every point ever seen lies within `2r` of some
  * current center — survives both steps (each discarded center sits
  * within the new `r` of a kept one), and `r` stays within a constant
  * factor of the optimal k-center radius. Spec-checked against planted
  * clusters and the coverage invariant under every batch split.
  *
  * Determinism: points fold in id order within a batch and the greedy
  * keep runs in center-arrival order; the center SET still depends on
  * stream order across batches — inherent to one-pass k-center, the
  * coverage guarantee is order-free.
  */
object CoresetMonitor {

  case class Pt(group: String, id: Long, vec: Array[Double])
  case class CoresetRow(group: String, n_seen: Long, n_centers: Int,
      radius_micro: Long, center_ids: Seq[Long])
  case class CState(ids: List[Long], vecs: List[Array[Double]],
      r: Double, seen: Long)

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** Keep centers pairwise farther than `r`, greedy in list order. */
  private def thin(centers: List[(Long, Array[Double])], r: Double) =
    centers.foldLeft(List.empty[(Long, Array[Double])]) { (kept, c) =>
      if (kept.exists(kc => dist(kc._2, c._2) <= r)) kept else kept :+ c
    }

  def monitor(points: Dataset[Pt], k: Int): Dataset[CoresetRow] = {
    require(k >= 2, s"k must be >= 2, got $k")
    import points.sparkSession.implicits._
    points
      .groupByKey(_.group)
      .flatMapGroupsWithState[CState, CoresetRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state: GroupState[CState]) =>
          val st = state.getOption.getOrElse(CState(Nil, Nil, 0.0, 0L))
          var centers = st.ids.zip(st.vecs)
          var r = st.r
          var seen = st.seen
          for (p <- rows.toSeq.sortBy(_.id)) {
            seen += 1
            val d = centers.map(c => dist(c._2, p.vec))
              .minOption.getOrElse(Double.PositiveInfinity)
            if (d > 2 * r) {
              centers = centers :+ (p.id -> p.vec)
              while (centers.length > k) {
                r = if (r == 0.0)
                  centers.combinations(2)
                    .map { case Seq(a, b) => dist(a._2, b._2) }.min
                else 2 * r
                centers = thin(centers, r)
              }
            }
          }
          state.update(CState(centers.map(_._1), centers.map(_._2), r, seen))
          Iterator.single(CoresetRow(group, seen, centers.length,
            Micro.micro(r), centers.map(_._1).sorted))
      }
  }
}
