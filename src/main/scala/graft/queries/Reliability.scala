package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.CutOps
import graft.functions.{TextFunctions => T}
import graft.sources.Tables

/** Model-reliability + reachability evals: threshold-free classifier
  * quality (q194 AUC/Brier/calibration), censoring-aware time-to-event
  * curves (q195 Kaplan–Meier), hop-distance reachability over the
  * similarity graph (q196 BFS), and the minimum-spanning forest of the
  * similarity graph (q197 Borůvka). Together they close the evaluation
  * story the earlier families opened: q180 grades a RANKER, q194 grades
  * a SCORER (is the quality/langid signal worth gating on, and are its
  * scores honest probabilities?); q73 measures fixed-horizon retention,
  * q195 measures the whole conversion-time distribution under
  * censoring; q70/q178 say "related / same community", q196 says "how
  * far apart", and q197 extracts the cheapest connecting backbone (the
  * single-linkage dendrogram edge set) that hierarchical dedup
  * clustering consumes.
  *
  * Float discipline (the q175 lesson): every cross-engine number is an
  * integer — scores in ppm via integer division, log-survival in
  * micro-nats via `round(ln(integer)·10⁶)`, AUC from integer mid-rank
  * sums — so both engines run the identical finite arithmetic.
  */
object Reliability {

  /** `round(ln(c)·10⁶)` as a long — micro-nat snap of an INTEGER
    * argument (ulp differences between libms sit ~10 orders below the
    * snap, so both engines round to the same long). */
  private def microLn(c: Column): Column =
    round(log(c.cast("double")) * 1e6, 0).cast("long")

  // ---------------------------------------------------------------- q194

  /** Calibration bin count for [[q194AucCalibration]] (deciles). */
  val CalibBins = 10L

  /** q194 — threshold-free evaluation of the q23 English-evidence score
    * against the `lang` ground truth: ROC AUC (Mann–Whitney mid-rank
    * form, exact under ties), Brier score, and a 10-bin reliability
    * table with expected calibration error. This is the gate a
    * model-based curation filter (q122/q152) must pass BEFORE its
    * threshold is chosen: AUC says whether the score ranks positives
    * above negatives at all, the reliability table says whether "0.9"
    * may be read as a probability, and both are threshold-free so the
    * verdict cannot be gamed by the cutoff.
    *
    * Everything is integer: the score is ppm by integer division
    * (`stop_tokens·10⁶ div tokens`), AUC comes from the tie-corrected
    * mid-rank sum (2·midrank = 2·rank + c − 1 summed per score group,
    * so ties contribute exactly their average rank without any 0.5),
    * and Brier/ECE accumulate in decimal(38,0) before one integer
    * division — the q144 overflow lesson applied from the start
    * (squared-ppm terms are 10¹² per row; a long sum dies at ~10⁷
    * rows, nothing at 100 TB).
    *
    * Scale shape: one corpus scan + groupBy SCORE (≤ 10⁶+1 groups
    * regardless of corpus size — the ppm snap bounds the spine), one
    * ordered window over that bounded spine, a 10-row bin table, and
    * single-row globals broadcast back onto the bins. No per-document
    * window, no self-join. */
  def q194AucCalibration(s: SparkSession, dir: String): DataFrame =
    aucCalibrationOn(Tables.documents(s, dir).select(
      expr("size(filter(split(text, ' '), t -> array_contains(" +
        T.EnglishStopwords.map(w => s"'$w'").mkString("array(", ",", ")") +
        ", t))) * 1000000L div size(split(text, ' '))").as("s"),
      (col("lang") === "en").cast("long").as("y")))

  /** [[q194AucCalibration]] over any (`s` ppm score long, `y` 0/1 long)
    * frame — exposed for the hand-computed planted spec. */
  def aucCalibrationOn(scored: DataFrame): DataFrame = {

    // score-group spine: bounded by the ppm alphabet, ordered window OK
    val grp = scored.groupBy("s")
      .agg(count(lit(1)).as("c"), sum("y").as("p"))
    val ord = Window.orderBy("s")
    val ranked = grp.withColumn("r",
        coalesce(sum("c").over(ord.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + 1L)
      // Σ over positives in the group of 2·midrank, all integer
      // (decimal BEFORE the multiply: p·2r is ~2n² and a long dies at
      // ~3e9 rows — the q144 lesson)
      .withColumn("contrib2",
        col("p").cast("decimal(38,0)") *
          (lit(2L) * col("r") + col("c") - 1L))

    val globals = scored.agg(
        count(lit(1)).as("n"), sum("y").as("pp"),
        sum(((col("s") - col("y") * 1000000L) *
          (col("s") - col("y") * 1000000L)).cast("decimal(38,0)")).as("sq"))
      .crossJoin(broadcast(ranked.agg(sum("contrib2").as("s2r"))))
      .select(col("n"), col("pp"), (col("n") - col("pp")).as("nn"),
        col("sq"), col("s2r"))
      .select(col("n"), col("pp"), col("nn"),
        when(col("pp") === 0L || col("nn") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "cast((s2r - cast(pp as decimal(38,0)) * (pp + 1)) * 1000000" +
              " div (cast(2 as decimal(38,0)) * pp * nn) as bigint)"))
          .as("auc_ppm"),
        expr("cast(sq div (cast(n as decimal(38,0)) * 1000000) as bigint)")
          .as("brier_micro"))

    val bins = scored
      .groupBy(least(expr("s div 100000"), lit(CalibBins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_bin"),
        sum(col("s").cast("decimal(38,0)")).as("ss"),
        sum(col("y").cast("decimal(38,0)")).as("sy"))
      .select(col("bin"), col("n_bin"),
        expr("cast(ss div n_bin as bigint)").as("conf_ppm"),
        expr("cast(sy * 1000000 div n_bin as bigint)").as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))

    val ece = bins.agg(
      sum((col("n_bin") * col("gap_ppm")).cast("decimal(38,0)")).as("wg"))

    bins.crossJoin(broadcast(globals)).crossJoin(broadcast(ece))
      .select(col("bin"), col("n_bin"), col("conf_ppm"), col("acc_ppm"),
        col("gap_ppm"),
        expr("cast(wg div n as bigint)").as("ece_ppm"),
        col("auc_ppm"), col("brier_micro"))
  }

  // ---------------------------------------------------------------- q195

  /** q195 — Kaplan–Meier curve of time-to-first-purchase, censoring
    * users who never purchase at their last observed day. q73 answers
    * "how many converted within 7 days"; the KM estimator recovers the
    * WHOLE conversion-time distribution without the bias of either
    * dropping non-converters (survivorship) or counting them as
    * never-converting (their observation just ended). Risk sets follow
    * the standard convention: a user censored at t is still at risk AT
    * t (censoring happens after events that day).
    *
    * Survival is reported in log space as an exact integer: per death
    * time, `ln S` falls by `ln(n−d) − ln n` with n, d integers, so the
    * running sum of micro-nat snaps is identical in both engines — no
    * cumulative product of floats anywhere. Rows where the risk set
    * dies out entirely (n = d) carry NULL log-survival (S = 0).
    *
    * Scale shape: two groupBys on user_id (AQE-coalesced, the q73
    * shape) feeding a DAY-level spine — the window runs over ≤
    * observation-window-days rows however many users exist. */
  def q195KaplanMeier(s: SparkSession, dir: String): DataFrame =
    kaplanMeierOn(conversionDurations(s, dir))

  /** The (t, ev) duration spine shared by q195/q262: per user, days
    * from first activity to first purchase (event) or to last activity
    * (censored). */
  private def conversionDurations(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
    val span = e.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("dlast"))
    val conv = e.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("d").as("dp"))
    span.join(conv, Seq("user_id"), "left").select(
      when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
        .otherwise(datediff(col("dlast"), col("d0"))).cast("long").as("t"),
      col("dp").isNotNull.cast("long").as("ev"))
  }

  /** q262 — Nelson–Aalen cumulative hazard over the same duration
    * spine as q195: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, each increment snapped to
    * exact integer micro-units (dᵢ·10⁶ div nᵢ — identical truncation
    * cross-engine), so the running sum is pure integer math. The
    * hazard view the KM survival curve cannot give directly: ΔH is the
    * instantaneous conversion intensity per day-at-risk, flat ΔH means
    * memoryless behavior, and H is the estimator of choice under heavy
    * ties (KM's log-product loses precision exactly where NA's sum
    * does not).
    *
    * Scale shape: identical to q195 — two user_id groupBys into a
    * day-level spine; the cumulative runs over ≤ window-days rows. */
  def q262NelsonAalen(s: SparkSession, dir: String): DataFrame =
    nelsonAalenOn(conversionDurations(s, dir))

  /** [[q262NelsonAalen]] from a (`t`, `ev`) duration frame. */
  def nelsonAalenOn(t: DataFrame): DataFrame = {
    val byT = t.groupBy("t")
      .agg(count(lit(1)).as("c"), sum("ev").as("d"))
    val ord = Window.orderBy("t")
    byT
      .withColumn("n_risk",
        sum("c").over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("inc", expr("d * 1000000 div n_risk"))
      .select(col("t").as("t_day"), col("n_risk"),
        col("d").as("n_event"), (col("c") - col("d")).as("n_censor"),
        sum("inc").over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cum_hazard_micro"))
  }

  /** [[q195KaplanMeier]] over any (`t` nonneg long time, `ev` 1=event /
    * 0=censored long) frame — exposed for the hand-traced spec. */
  def kaplanMeierOn(t: DataFrame): DataFrame = {
    val byT = t.groupBy("t")
      .agg(count(lit(1)).as("c"), sum("ev").as("d"))
    val ord = Window.orderBy("t")
    byT
      .withColumn("n_risk",
        sum("c").over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("term",
        when(col("d") > 0L && col("n_risk") > col("d"),
          microLn(col("n_risk") - col("d")) - microLn(col("n_risk")))
          .otherwise(lit(0L)))
      .withColumn("dead",
        max(when(col("n_risk") === col("d"), 1L).otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("t").as("t_day"), col("n_risk"),
        col("d").as("n_event"), (col("c") - col("d")).as("n_censor"),
        when(col("dead") === 1L, lit(null).cast("long"))
          .otherwise(sum("term")
            .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("log_surv_micro"))
  }

  // ---------------------------------------------------------------- q196

  /** BFS round budget — hop-6 neighborhood (the small-world cut: what a
    * 6-round frontier can reach is "nearby" for curation purposes). */
  val BfsRounds = 6

  /** q196 — hop distances from the smallest vec_id over the undirected
    * q109 embedding k-NN graph, `BfsRounds` synchronous frontier
    * rounds. Components (q70) answer reachable-at-all, communities
    * (q178) answer locally-dominant-group; hop distance is the
    * GRADED version — the radius knob for "sample nothing within r
    * hops of a seed" contamination quarantines and for validating that
    * near-dup chains are short. Unreached nodes are absent (their
    * distance exceeds the budget, not "∞" rows).
    *
    * Scale shape: per round one join of the edge list against the
    * current distance frame + a min-groupBy — the LPA cost model
    * exactly (edge list cached once, lineage cut every other round);
    * distances are 2 longs per reached node. */
  def q196BfsHops(s: SparkSession, dir: String): DataFrame =
    bfsOn(PipelineQueries.q109EmbeddingKnn(s, dir), BfsRounds)

  /** [[q196BfsHops]] over any (vec_id, neighbor_id) edge frame —
    * exposed for the planted-topology spec. */
  def bfsOn(knn: DataFrame, rounds: Int): DataFrame = {
    val und = knn.select(
        least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    // cached hash-partitioned by `src` (guide §2.4): each round's
    // edge⋈frontier join reuses the layout instead of re-exchanging the
    // edge side — locally masked by AQE broadcasting the node-sized
    // distance frame, asserted under the cluster shape in EdgeLayoutSpec
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .cache()
    var dist = edges.agg(min("src").as("id")).withColumn("d", lit(0L))
    for (r <- 1 to rounds) {
      val next = edges
        .join(dist.select(col("id").as("src"), col("d")), "src")
        .select(col("dst").as("id"), (col("d") + 1L).as("d"))
      dist = dist.unionByName(next).groupBy("id").agg(min("d").as("d"))
      if (r % 2 == 0 || r == rounds) dist = dist.cut()
    }
    edges.unpersist()
    dist.select(col("id").as("vec_id"), col("d").as("dist"))
  }

  // ---------------------------------------------------------------- q197

  /** q197 — minimum-spanning forest of the mutual-kNN similarity graph
    * (weight = ppm cosine DISTANCE), via distributed Borůvka
    * ([[graft.operators.Mst]]). The MST is the single-linkage
    * dendrogram's edge set: cutting it at a distance threshold yields
    * exactly the single-linkage clusters, so the forest is the
    * reusable artifact from which EVERY dedup radius can be read
    * without re-clustering — compute once at 100 TB, sweep thresholds
    * for free. Weights are exact ppm longs with (w, a, b) total-order
    * tie-breaks, so the forest is unique and the spec's sequential
    * Prim twin must agree edge-for-edge. Rows-only (MST is not
    * expressible in one SQL query); pinned by golden hash + planted
    * spec against sequential Prim. */
  def q197MstBoruvka(s: SparkSession, dir: String): DataFrame =
    graft.operators.Mst.boruvka(mutualDistanceEdges(s, dir))
      .select(col("a"), col("b"), col("w").as("w_ppm"))

  /** The mutual-kNN similarity graph as weighted edges (`a` < `b`,
    * `w` = ppm cosine distance) — the shared input of q197 (forest)
    * and q202 (threshold clustering). */
  private[queries] def mutualDistanceEdges(s: SparkSession, dir: String): DataFrame =
    GraphEval.q179MutualKnn(s, dir)
      .select(col("vec_id").as("a"), col("neighbor_id").as("b"),
        (lit(1000000L) - round(col("sim") * 1e6, 0).cast("long")).as("w"))
      .groupBy("a", "b").agg(min("w").as("w"))

  // ---------------------------------------------------------------- q202

  /** Single-linkage distance cut for [[q202SingleLinkage]]: ppm cosine
    * distance ≤ 0.6 (sim ≥ 0.4) joins a cluster. */
  val SlTauPpm = 600000L

  /** q202 — single-linkage clusters at radius τ, read off the q197
    * minimum-spanning forest: cutting the MST's edges above τ yields
    * EXACTLY the connected components of the full graph thresholded at
    * τ (the defining MST property single-linkage clustering is built
    * on) — but the cut runs on n−1 forest edges instead of the whole
    * edge set, so every new τ costs one tiny CC pass. This query IS
    * the "sweep dedup radii for free" claim of q197, executed:
    * `SingleLinkageSpec` proves cut-equals-threshold-components
    * exactly, and the driver pins the output by golden hash.
    *
    * Scale shape: forest construction dominates (q197, O(log n)
    * rounds); the cut is a filter on ≤ n−1 edges and a CC whose input
    * is forest-sparse. Singletons keep their own id via `allNodes`. */
  def q202SingleLinkage(s: SparkSession, dir: String): DataFrame = {
    // one materialization of the kNN-graph build: `edges` feeds both
    // the node universe and the Borůvka forest — un-cut, the whole
    // mutual-kNN pipeline executed once per consumer
    val edges = mutualDistanceEdges(s, dir).cut()
    val nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
    // assumeMaterialized: `edges` is already cut above — a second cut
    // inside boruvka held two block-manager copies of the edge data for
    // the query's lifetime (ADVICE r12)
    val cut = graft.operators.Mst.boruvka(edges, assumeMaterialized = true)
      .where(col("w") <= SlTauPpm)
      .select(col("a").as("src"), col("b").as("dst"))
    graft.operators.ConnectedComponents.components(cut, Some(nodes))
      .select(col("id").as("vec_id"), col("component").as("cluster"))
  }

  // ---------------------------------------------------------------- q207

  /** Bellman–Ford round budget for [[q207SsspWeighted]] — matches the
    * q196 hop budget (a 6-round frontier is the "nearby" cut). */
  val SsspRounds = 6

  /** q207 — weighted single-source shortest paths over the mutual-kNN
    * similarity graph (the q197/q202 edge set: weight = ppm cosine
    * distance), [[SsspRounds]] synchronous Bellman–Ford rounds from
    * the smallest node id. q196's BFS counts HOPS — two hops through
    * near-duplicates and two hops through barely-similar neighbors
    * look identical; SSSP accumulates the actual dissimilarity along
    * the path, which is the graded radius a "quarantine everything
    * within distance r of a contaminated seed" sweep needs (hop
    * quarantines over-block through dup cliques, under-block through
    * weak ties). Reported distances are exact for every node whose
    * shortest path uses ≤ [[SsspRounds]] edges (the Bellman–Ford
    * invariant); longer paths may still improve in later rounds, and
    * unreached nodes are absent — both engines run the IDENTICAL round
    * budget so the fixpoint-or-not state matches row for row.
    *
    * Scale shape: per round one hash join of the edge list against the
    * current distance frame + a min-groupBy — the q196/LPA cost model
    * exactly (edges cached once, lineage cut every other round);
    * weights are exact ppm longs, so distances are exact longs with no
    * float accumulation drift. */
  def q207SsspWeighted(s: SparkSession, dir: String): DataFrame = {
    val und = mutualDistanceEdges(s, dir)
    ssspOn(und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst"), col("w"))),
      SsspRounds)
  }

  /** [[q207SsspWeighted]] over any directed (`src`, `dst`, `w` long)
    * edge frame — exposed for the planted-topology spec. */
  def ssspOn(edges0: DataFrame, rounds: Int): DataFrame = {
    // layout by `src` for the per-round join — the q196/LPA discipline
    val edges = edges0.repartition(col("src")).cache()
    var dist = edges.agg(min("src").as("id")).withColumn("d", lit(0L))
    for (r <- 1 to rounds) {
      val next = edges
        .join(dist.select(col("id").as("src"), col("d")), "src")
        .select(col("dst").as("id"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(next).groupBy("id").agg(min("d").as("d"))
      if (r % 2 == 0 || r == rounds) dist = dist.cut()
    }
    edges.unpersist()
    dist.select(col("id").as("vec_id"), col("d").as("dist_ppm"))
  }

  // ------------------------------------------------------------ registry

  /** Decile count for [[q230LiftGains]]. */
  val LiftBuckets = 10

  /** q230 — cumulative gains / lift table: docs ranked by a score
    * (n_chars as the stand-in classifier margin), cut into
    * [[LiftBuckets]] equal-ROW buckets, and each prefix of the ranking
    * graded by lift (positive rate vs base rate) and gain (share of
    * all positives captured). The campaign/triage read-out q194's AUC
    * deliberately abstracts away: AUC says "the ranking is good
    * somewhere"; the lift table says "take the top 20% and you get
    * 3.1× base rate" — the number a labeling-budget owner acts on.
    *
    * Integer discipline: bucket of a score group = prior-rows·B div n
    * (the q204 first-row rule on the DESCENDING spine — a tie group
    * never straddles buckets), lift = cum_pos·n·10⁶ div (cum_rows·P),
    * gain = cum_pos·10⁶ div P; all exact integer cross-products,
    * decimal(38,0)-widened.
    *
    * Scale shape: corpus → score spine (one map-side-combining
    * groupBy, bounded by the score alphabet); the descending
    * cumulative runs through [[DistCumSum]]'s two-level scan — no
    * single-partition window over the spine; the final cumulative is
    * over ≤ B bucket rows. */
  def q230LiftGains(s: SparkSession, dir: String): DataFrame =
    liftGainsOn(Tables.documents(s, dir).select(
      col("n_chars").as("score"), (col("lang") === "en").as("pos")),
      LiftBuckets)

  /** [[q230LiftGains]] over any (`score` long, `pos` bool) frame. */
  def liftGainsOn(rows: DataFrame, buckets: Int): DataFrame = {
    import graft.operators.DistCumSum
    // ONE corpus pass; totals derive from the cached score spine, not
    // a second scan (measured: the tot branch re-read the parquet)
    val spine = rows.groupBy("score").agg(count(lit(1)).as("c"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("p"))
      .withColumn("nscore", -col("score")) // descending = best first
      .persist()
    val cum = DistCumSum.overDomain(spine, "nscore", "c")
    val tot = spine.agg(sum("c").as("n"), sum("p").as("pp"))
    val byBucket = cum.crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"(cum - c) * $buckets div n"))
      .groupBy("bucket")
      .agg(sum("c").as("n_rows"), sum("p").as("n_pos"))
    val w = Window.orderBy("bucket") // <= buckets rows — bounded frame
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = byBucket
      .withColumn("cum_rows", sum("n_rows").over(w))
      .withColumn("cum_pos", sum("n_pos").over(w))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        col("cum_rows"), col("cum_pos"),
        expr("""cast(cast(cum_pos as decimal(38,0)) * n * 1000000
               | div (cast(cum_rows as decimal(38,0)) * pp) as bigint)"""
          .stripMargin).as("lift_ppm"),
        expr("cast(cast(cum_pos as decimal(38,0)) * 1000000 div pp as bigint)")
          .as("gain_ppm"))
    graft.operators.SmallResult.materialize(out, spine)
  }

  // ---------------------------------------------------------------- q234

  /** q234 — isotonic calibration by exact integer pool-adjacent-
    * violators: the monotone map score → P(positive) that q194's
    * reliability diagram MEASURES the need for, this operator FITS.
    * The corpus collapses to the (score, n, pos) spine — bounded by
    * the score alphabet, one map-side-combining groupBy — and PAV
    * runs as the classic stack merge over that spine: while the
    * previous block's rate ≥ the next block's, pool them. All
    * comparisons are integer cross-products (p_prev·n_next ≥
    * p_next·n_prev) — no float ever enters the fit, so the output is
    * exactly reproducible and golden-hash-pinnable.
    *
    * Scale shape: the corpus-volume work is the ONE spine groupBy;
    * the sequential PAV pass touches only the spine (the q222/q187
    * bounded-driver-step discipline — ~10³ distinct scores here; a
    * score alphabet beyond driver memory gets bucketed by q204's
    * equi-depth first). Output: one row per distinct score with its
    * pooled block's calibrated rate in ppm. */
  def q234IsotonicCalibration(s: SparkSession, dir: String): DataFrame =
    isotonicOn(s, Tables.documents(s, dir).select(
      col("n_chars").as("score"), (col("lang") === "en").as("pos")))

  /** [[q234IsotonicCalibration]] over any (`score` long, `pos` bool)
    * frame — exposed for the hand-computed spec. */
  def isotonicOn(s: SparkSession, rows: DataFrame): DataFrame = {
    val spine = rows.groupBy("score").agg(count(lit(1)).as("n"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("p"))
      .orderBy("score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact PAV: pool while the isotonic constraint is violated
    final case class Block(n: Long, p: Long, members: List[Long])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    spine.foreach { case (score, n, p) =>
      var cur = Block(n, p, List(score))
      while (stack.nonEmpty &&
        stack.last.p * cur.n >= cur.p * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Block(prev.n + cur.n, prev.p + cur.p,
          prev.members ::: cur.members)
      }
      stack += cur
    }
    import s.implicits._
    stack.toSeq.flatMap { b =>
      val rate = b.p * 1000000L / b.n
      b.members.map(score => (score, b.n, b.p, rate))
    }.toDF("score", "block_n", "block_p", "rate_ppm")
  }

  // ---------------------------------------------------------------- q243

  /** q243 — Murphy decomposition of the Brier score
    * (Brier = REL − RES + UNC over forecast bins): the WHY behind
    * q194's single Brier number. REL (reliability) is the calibration
    * error q234's PAV would remove; RES (resolution) is the
    * separation a scorer earns — a perfectly calibrated coin-flip
    * forecaster has REL = 0 and is still useless because RES = 0;
    * UNC is the base-rate entropy nobody can beat. Reported in
    * micro-prob² (the q194 `brier_micro` unit), with the binned
    * Brier alongside so the identity is visible in the output.
    *
    * Integer discipline: bins are the q194 deciles; per-bin means
    * stay in exact ppm (one integral div each — both engines
    * truncate alike), squared gaps widen to decimal(38,0), and each
    * component is one final integral div. The identity holds exactly
    * when scores are constant within bins (spec-planted); real bins
    * add within-bin variance to the binned Brier only.
    *
    * Scale shape: ONE corpus pass → decile-bin aggregate (≤ 10
    * rows); everything after is arithmetic on that spine. */
  def q243BrierDecomposition(s: SparkSession, dir: String): DataFrame =
    brierDecompositionOn(Tables.documents(s, dir).select(
      expr("size(filter(split(text, ' '), t -> array_contains(" +
        T.EnglishStopwords.map(w => s"'$w'").mkString("array(", ",", ")") +
        ", t))) * 1000000L div size(split(text, ' '))").as("s"),
      (col("lang") === "en").cast("long").as("y")))

  /** [[q243BrierDecomposition]] over any (`s` ppm, `y` 0/1) frame. */
  def brierDecompositionOn(scored: DataFrame): DataFrame =
    scored
      .groupBy(least(expr("s div 100000"), lit(CalibBins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_b"),
        sum(col("s").cast("decimal(38,0)")).as("ss"),
        sum("y").as("sy"),
        sum(((col("s") - col("y") * 1000000L) *
          (col("s") - col("y") * 1000000L)).cast("decimal(38,0)")).as("sq"))
      .withColumn("conf_ppm", expr("cast(ss div n_b as bigint)"))
      .withColumn("acc_ppm", expr("sy * 1000000 div n_b"))
      .agg(sum("n_b").as("n"), sum("sy").as("pp"), sum("sq").as("sq"),
        sum(expr("""cast(n_b as decimal(38,0))
                   | * (conf_ppm - acc_ppm) * (conf_ppm - acc_ppm)"""
          .stripMargin)).as("rel_num"),
        sum(col("n_b").cast("decimal(38,0)") * col("acc_ppm") *
          col("acc_ppm")).as("res_raw"),
        sum(col("n_b").cast("decimal(38,0)") * col("acc_ppm")).as("res_lin"))
      .withColumn("base_ppm", expr("pp * 1000000 div n"))
      // Σn_b(acc−base)² = Σn_b·acc² − 2·base·Σn_b·acc + n·base²
      .withColumn("res_num", expr(
        """res_raw - 2 * cast(base_ppm as decimal(38,0)) * res_lin
          | + cast(n as decimal(38,0)) * base_ppm * base_ppm"""
          .stripMargin))
      .select(col("n"), col("pp"), col("base_ppm"),
        expr("cast(rel_num div (cast(n as decimal(38,0)) * 1000000) as bigint)")
          .as("rel_micro"),
        expr("cast(res_num div (cast(n as decimal(38,0)) * 1000000) as bigint)")
          .as("res_micro"),
        expr("""cast(cast(base_ppm as decimal(38,0)) * (1000000 - base_ppm)
               | div 1000000 as bigint)""".stripMargin).as("unc_micro"),
        expr("cast(sq div (cast(n as decimal(38,0)) * 1000000) as bigint)")
          .as("brier_micro"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_lift_gains" -> (q230LiftGains _),
    "q234_isotonic_calibration" -> (q234IsotonicCalibration _),
    "q243_brier_decomposition" -> (q243BrierDecomposition _),
    "q194_auc_calibration" -> (q194AucCalibration _),
    "q195_kaplan_meier" -> (q195KaplanMeier _),
    "q262_nelson_aalen" -> (q262NelsonAalen _),
    "q196_bfs_hops" -> (q196BfsHops _),
    "q207_sssp_weighted" -> (q207SsspWeighted _),
    "q197_mst_boruvka" -> (q197MstBoruvka _),
    "q202_single_linkage" -> (q202SingleLinkage _))

  /** One synchronous Bellman–Ford round as SQL over the previous
    * round's CTE (the q196 unrolled-recurrence discipline, weighted). */
  private def ssspRoundSql(prev: String, cur: String): String =
    s"""$cur AS (
       | SELECT id, CAST(min(d) AS BIGINT) AS d FROM (
       |  SELECT id, d FROM $prev
       |  UNION ALL
       |  SELECT e.dst AS id, p.d + e.w AS d
       |  FROM edges e JOIN $prev p ON e.src = p.id)
       | GROUP BY id)""".stripMargin

  /** One synchronous BFS frontier round as SQL over the previous
    * round's CTE (the q178 unrolled-recurrence discipline). */
  private def bfsRoundSql(prev: String, cur: String): String =
    s"""$cur AS (
       | SELECT id, CAST(min(d) AS BIGINT) AS d FROM (
       |  SELECT id, d FROM $prev
       |  UNION ALL
       |  SELECT e.dst AS id, p.d + 1 AS d
       |  FROM edges e JOIN $prev p ON e.src = p.id)
       | GROUP BY id)""".stripMargin

  private def oracleStop: String =
    T.EnglishStopwords.map(w => s"'$w'").mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    "q230_lift_gains" ->
      s"""WITH r AS (
         | SELECT n_chars AS score, CAST(lang = 'en' AS INT) AS pos
         | FROM documents),
         |spine AS (
         | SELECT score, CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(pos) AS BIGINT) AS p
         | FROM r GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(pos) AS BIGINT) AS pp FROM r),
         |cum AS (
         | SELECT *, sum(c) OVER (ORDER BY score DESC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
         | FROM spine),
         |g AS (
         | SELECT CAST((cumc - c) * $LiftBuckets // tot.n AS BIGINT) AS bucket,
         |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(sum(p) AS BIGINT) AS n_pos
         | FROM cum CROSS JOIN tot GROUP BY 1),
         |cg AS (
         | SELECT *,
         |  CAST(sum(n_rows) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_rows,
         |  CAST(sum(n_pos) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_pos
         | FROM g)
         |SELECT bucket, n_rows, n_pos, cum_rows, cum_pos,
         | CAST(CAST(cum_pos AS HUGEINT) * tot.n * 1000000
         |   // (CAST(cum_rows AS HUGEINT) * tot.pp) AS BIGINT) AS lift_ppm,
         | CAST(CAST(cum_pos AS HUGEINT) * 1000000 // tot.pp AS BIGINT)
         |  AS gain_ppm
         |FROM cg CROSS JOIN tot""".stripMargin,
    "q243_brier_decomposition" ->
      s"""WITH scored AS (
         | SELECT CAST(len(list_filter(string_split(text, ' '),
         |    t -> list_contains($oracleStop, t))) * 1000000
         |   // len(string_split(text, ' ')) AS BIGINT) AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         | FROM documents),
         |bins AS (
         | SELECT least(s // 100000, ${CalibBins - 1}) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_b,
         |  CAST(sum(s) AS HUGEINT) AS ss, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(CAST(s - y * 1000000 AS HUGEINT)
         |         * CAST(s - y * 1000000 AS HUGEINT)) AS HUGEINT) AS sq
         | FROM scored GROUP BY 1),
         |m AS (
         | SELECT bin, n_b, sy, sq,
         |  CAST(ss // n_b AS BIGINT) AS conf_ppm,
         |  sy * 1000000 // n_b AS acc_ppm
         | FROM bins),
         |agg AS (
         | SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS pp,
         |  sum(sq) AS sq,
         |  sum(CAST(n_b AS HUGEINT) * (conf_ppm - acc_ppm)
         |      * (conf_ppm - acc_ppm)) AS rel_num,
         |  sum(CAST(n_b AS HUGEINT) * acc_ppm * acc_ppm) AS res_raw,
         |  sum(CAST(n_b AS HUGEINT) * acc_ppm) AS res_lin
         | FROM m),
         |w AS (SELECT *, pp * 1000000 // n AS base_ppm FROM agg)
         |SELECT n, pp, base_ppm,
         | CAST(rel_num // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
         |  AS rel_micro,
         | CAST((res_raw - 2 * CAST(base_ppm AS HUGEINT) * res_lin
         |    + CAST(n AS HUGEINT) * base_ppm * base_ppm)
         |   // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS res_micro,
         | CAST(CAST(base_ppm AS HUGEINT) * (1000000 - base_ppm)
         |   // 1000000 AS BIGINT) AS unc_micro,
         | CAST(sq // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
         |  AS brier_micro
         |FROM w""".stripMargin,
    "q194_auc_calibration" ->
      s"""WITH scored AS (
         | SELECT CAST(len(list_filter(string_split(text, ' '),
         |    t -> list_contains($oracleStop, t))) * 1000000
         |   // len(string_split(text, ' ')) AS BIGINT) AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         | FROM documents),
         |grp AS (
         | SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
         | FROM scored GROUP BY s),
         |ranked AS (
         | SELECT s, c, p,
         |  COALESCE(sum(c) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS r
         | FROM grp),
         |tot AS (
         | SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pp,
         |  CAST(count(*) AS BIGINT) - CAST(sum(y) AS BIGINT) AS nn,
         |  sum(CAST((s - y * 1000000) * (s - y * 1000000) AS HUGEINT)) AS sq
         | FROM scored),
         |s2 AS (
         | SELECT sum(CAST(p * (2 * r + c - 1) AS HUGEINT)) AS s2r FROM ranked),
         |bins AS (
         | SELECT least(s // 100000, ${CalibBins - 1}) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_bin,
         |  CAST(sum(CAST(s AS HUGEINT)) // count(*) AS BIGINT) AS conf_ppm,
         |  CAST(sum(CAST(y AS HUGEINT)) * 1000000 // count(*) AS BIGINT) AS acc_ppm
         | FROM scored GROUP BY 1),
         |gaps AS (
         | SELECT bin, n_bin, conf_ppm, acc_ppm,
         |  abs(conf_ppm - acc_ppm) AS gap_ppm FROM bins),
         |ece AS (
         | SELECT sum(CAST(n_bin * gap_ppm AS HUGEINT)) AS wg FROM gaps)
         |SELECT g.bin, g.n_bin, g.conf_ppm, g.acc_ppm, g.gap_ppm,
         | CAST(e.wg // gl.n AS BIGINT) AS ece_ppm,
         | CASE WHEN gl.pp = 0 OR gl.nn = 0 THEN NULL
         |  ELSE CAST((s2.s2r - CAST(gl.pp AS HUGEINT) * (gl.pp + 1)) * 1000000
         |   // (CAST(2 AS HUGEINT) * gl.pp * gl.nn) AS BIGINT) END AS auc_ppm,
         | CAST(gl.sq // (CAST(gl.n AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro
         |FROM gaps g CROSS JOIN tot gl CROSS JOIN s2 CROSS JOIN ece e""".stripMargin,
    "q195_kaplan_meier" ->
      """WITH e AS (
        | SELECT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
        |span AS (
        | SELECT user_id, min(d) AS d0, max(d) AS dlast FROM e GROUP BY user_id),
        |conv AS (
        | SELECT user_id, min(d) AS dp FROM e
        | WHERE event_type = 'purchase' GROUP BY user_id),
        |dur AS (
        | SELECT CAST(CASE WHEN c.dp IS NOT NULL
        |    THEN date_diff('day', s.d0, c.dp)
        |    ELSE date_diff('day', s.d0, s.dlast) END AS BIGINT) AS t,
        |  CASE WHEN c.dp IS NOT NULL THEN 1 ELSE 0 END AS ev
        | FROM span s LEFT JOIN conv c ON s.user_id = c.user_id),
        |byt AS (
        | SELECT t, CAST(count(*) AS BIGINT) AS c, CAST(sum(ev) AS BIGINT) AS d
        | FROM dur GROUP BY t),
        |risk AS (
        | SELECT t, c, d,
        |  CAST(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        | FROM byt),
        |terms AS (
        | SELECT t, c, d, n_risk,
        |  CASE WHEN d > 0 AND n_risk > d THEN
        |    CAST(round(ln(CAST(n_risk - d AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |    - CAST(round(ln(CAST(n_risk AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |   ELSE 0 END AS term,
        |  max(CASE WHEN n_risk = d THEN 1 ELSE 0 END) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        | FROM risk)
        |SELECT t AS t_day, n_risk, d AS n_event, c - d AS n_censor,
        | CASE WHEN dead = 1 THEN NULL
        |  ELSE CAST(sum(term) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  END AS log_surv_micro
        |FROM terms""".stripMargin,
    "q262_nelson_aalen" ->
      """WITH e AS (
        | SELECT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
        |span AS (
        | SELECT user_id, min(d) AS d0, max(d) AS dlast FROM e GROUP BY user_id),
        |conv AS (
        | SELECT user_id, min(d) AS dp FROM e
        | WHERE event_type = 'purchase' GROUP BY user_id),
        |dur AS (
        | SELECT CAST(CASE WHEN c.dp IS NOT NULL
        |    THEN date_diff('day', s.d0, c.dp)
        |    ELSE date_diff('day', s.d0, s.dlast) END AS BIGINT) AS t,
        |  CASE WHEN c.dp IS NOT NULL THEN 1 ELSE 0 END AS ev
        | FROM span s LEFT JOIN conv c ON s.user_id = c.user_id),
        |byt AS (
        | SELECT t, CAST(count(*) AS BIGINT) AS c, CAST(sum(ev) AS BIGINT) AS d
        | FROM dur GROUP BY t),
        |risk AS (
        | SELECT t, c, d,
        |  CAST(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        | FROM byt)
        |SELECT t AS t_day, n_risk, d AS n_event, c - d AS n_censor,
        | CAST(sum(d * 1000000 // n_risk) OVER (ORDER BY t
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum_hazard_micro
        |FROM risk""".stripMargin,
    "q196_bfs_hops" -> {
      val knn = PipelineQueries.oracles("q109_embedding_knn")
      val rounds = (1 to BfsRounds)
        .map(i => bfsRoundSql(if (i == 1) "d0" else s"d${i - 1}", s"d$i"))
        .mkString(",\n")
      s"""WITH knn AS ($knn),
         |und AS (
         | SELECT DISTINCT least(vec_id, neighbor_id) AS a,
         |  greatest(vec_id, neighbor_id) AS b
         | FROM knn WHERE vec_id <> neighbor_id),
         |edges AS (
         | SELECT a AS src, b AS dst FROM und
         | UNION ALL
         | SELECT b AS src, a AS dst FROM und),
         |d0 AS (SELECT min(src) AS id, CAST(0 AS BIGINT) AS d FROM edges),
         |$rounds
         |SELECT id AS vec_id, d AS dist FROM d$BfsRounds""".stripMargin
    },
    "q207_sssp_weighted" -> {
      val mutual = GraphEval.oracles("q179_mutual_knn")
      val rounds = (1 to SsspRounds)
        .map(i => ssspRoundSql(if (i == 1) "d0" else s"d${i - 1}", s"d$i"))
        .mkString(",\n")
      s"""WITH mutual AS ($mutual),
         |wedges AS (
         | SELECT vec_id AS a, neighbor_id AS b,
         |  min(1000000 - CAST(round(sim * 1000000, 0) AS BIGINT)) AS w
         | FROM mutual GROUP BY 1, 2),
         |edges AS (
         | SELECT a AS src, b AS dst, w FROM wedges
         | UNION ALL
         | SELECT b AS src, a AS dst, w FROM wedges),
         |d0 AS (SELECT min(src) AS id, CAST(0 AS BIGINT) AS d FROM edges),
         |$rounds
         |SELECT id AS vec_id, d AS dist_ppm FROM d$SsspRounds""".stripMargin
    })
}
