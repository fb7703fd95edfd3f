package graft.streaming

/** The ONE implementation of the Spark-`round()`-compatible integer
  * snap the streaming twins use to reproduce their batch queries'
  * micro-unit columns bit-for-bit: HALF_UP over the SHORTEST-decimal
  * rendering (`BigDecimal.valueOf`, not the exact binary expansion) —
  * exactly what Spark SQL `round(x, 0)` computes. `math.round`'s
  * `floor(x + 0.5)` drifts on .5-adjacent doubles; keep every twin on
  * this helper so a rounding-parity fix lands in one place.
  * Out-of-long-range input fails loudly (`longValueExact`) instead of
  * saturating. (graft-wide visibility: batch operators that fold a
  * Spark-round-quantized statistic into a mapGroups pass — Als's SSE —
  * need the identical snap.) */
private[graft] object Micro {

  /** HALF_UP snap to a whole Long. */
  def halfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** `round(x * 1e6)` in Spark semantics — micro-units. */
  def micro(x: Double): Long = halfUp(x * 1e6)
}
