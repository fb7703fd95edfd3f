package graft.plans

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Randomized equivalence sweep over the native Catalyst expressions:
  * one Spark job evaluates 300 random vector pairs through BOTH the
  * codegen'd native expressions and their higher-order-fold / driver
  * reference computations, asserting bitwise agreement. Complements the
  * single-row tests in FunctionsSpec with adversarial shapes (mixed
  * signs, zeros, subnormal-ish magnitudes, dims 1..16). */
class NativeExprPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(2026L)

  private def randVec(dim: Int): Array[Float] = {
    def gen() = Array.fill(dim) {
      rnd.nextInt(5) match {
        case 0 => 0.0f
        case 1 => (rnd.nextGaussian() * 1e6).toFloat
        case 2 => (rnd.nextGaussian() * 1e-6).toFloat
        case _ => rnd.nextGaussian().toFloat
      }
    }
    // an ALL-zero vector makes the fold cosine 0/0 — an ANSI-mode throw in
    // both the native and fold paths, so nothing to compare; keep zero
    // ELEMENTS (the interesting case) but reroll degenerate vectors
    Iterator.continually(gen()).find(_.exists(_ != 0.0f)).get
  }

  private val pairs = (1 to 300).map { i =>
    val dim = 1 + rnd.nextInt(16)
    (i.toLong, randVec(dim), randVec(dim))
  }

  test("native dot / cosine / sqdist match the fold versions on 300 random pairs") {
    graft.plans.VectorExpressions.register(spark)
    val df = pairs.toDF("id", "a", "b")
    val bad = df.select(
        VectorFunctions.nativeDot($"a", $"b").as("nd"),
        VectorFunctions.dot($"a", $"b").as("fd"),
        VectorFunctions.nativeCosine($"a", $"b").as("nc"),
        VectorFunctions.cosine($"a", $"b").as("fc"),
        call_function("graft_sqdist", $"a", $"b").as("ns"),
        VectorFunctions.sqDist($"a", $"b").as("fs"))
      .where(!($"nd" <=> $"fd") || !($"nc" <=> $"fc") || !($"ns" <=> $"fs"))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("graft_intersect_size matches scala Set intersection on 300 random sorted arrays") {
    graft.plans.VectorExpressions.register(spark)
    val tokenPairs = (1 to 300).map { i =>
      def toks() = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(40)}").distinct.sorted
      (i.toLong, toks(), toks())
    }
    val expected = tokenPairs.map { case (id, a, b) =>
      id -> a.toSet.intersect(b.toSet).size
    }.toMap
    val got = tokenPairs.toDF("id", "a", "b")
      .select($"id", call_function("graft_intersect_size", $"a", $"b").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == expected)
  }
}
