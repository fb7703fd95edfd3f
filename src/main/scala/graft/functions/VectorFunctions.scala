package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<float>`/`array<double>`
  * embedding columns, built from higher-order SQL functions (`zip_with`,
  * `aggregate`, `transform`) so everything stays codegen-friendly and
  * distributed — no UDF, no driver collect.
  *
  * All math is promoted to Double before accumulation: float32 parquet
  * vectors fold in float64 left-to-right, which both Spark and DuckDB do
  * identically (oracle-stable).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left fold sum of elements (in double). */
  def elementSum(v: Column): Column =
    aggregate(asDouble(v), lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Native codegen'd variants (see [[graft.plans.VectorExpressions]]) —
    * bit-identical to the fold versions but one tight generated loop.
    * Requires `VectorExpressions.register(spark)` (done by
    * [[graft.sources.Tables.load]]) or GraftExtensions. */
  def nativeDot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def nativeCosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic Gaussian hyperplanes for cosine LSH (fixed seed ⇒
    * reproducible buckets across runs and engines). */
  def gaussianPlanes(n: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane (SimHash) LSH bucket for cosine similarity: the
    * sign pattern of `planes.length` fixed pseudo-random hyperplanes.
    * Planes are supplied by the caller (deterministic seeding). */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      when(nativeDot(v, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
