package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native `graft_damerau` expression: full (unrestricted)
  * Damerau–Levenshtein semantics — including the case that separates
  * it from the weaker optimal-string-alignment variant — byte-oriented
  * unicode behavior pinned to DuckDB's `damerau_levenshtein` (probed
  * values), null propagation through the codegen path, and the loud
  * input-size guard. */
class DamerauLevenshteinSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinExpr.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("full DL, not OSA: CA->ABC is 2 (edit inside a transposed pair)") {
    // OSA forbids touching a transposed substring again and answers 3;
    // DuckDB answers 2 (probed), so the oracle REQUIRES the full
    // Lowrance-Wagner algorithm.
    assert(dl("CA", "ABC") == 2)
    assert(dl("ABC", "CA") == 2)
  }

  test("classic distances match DuckDB's probed values") {
    val cases = Seq(
      ("kitten", "sitting", 3),
      ("ab", "ba", 1), // one transposition, levenshtein would say 2
      ("abcdef", "abcfad", 3),
      ("a cat", "an act", 2),
      ("", "", 0),
      ("x", "", 1),
      ("", "x", 1),
      ("abc", "abc", 0),
      ("recieve", "receive", 1)) // the canonical human typo
    cases.foreach { case (a, b, want) =>
      assert(dl(a, b) == want, s"dl($a, $b)")
      assert(dl(b, a) == want, s"dl($b, $a) (symmetry)")
    }
  }

  test("byte-oriented unicode, matching DuckDB (probed)") {
    assert(dl("über", "uber") == 2) // 2-byte ü: substitute + delete
    assert(dl("héllo", "hello") == 2)
    assert(dl("ab😀cd", "abcd") == 4) // 4-byte emoji deleted
    assert(dl("😀a", "a😀") == 2) // no cross-char transpose
  }

  test("expression path: codegen'd, null-propagating, oracle-ordered") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Some("the quick brown fox"), Some("teh quick brown fox")),
      (2L, Some("alpha"), Some("omega")),
      (3L, None: Option[String], Some("x")),
      (4L, Some("x"), None: Option[String]))
      .toDF("id", "a", "b")
      .select($"id", expr("graft_damerau(a, b)").as("dl"))
      .orderBy("id")
    assert(df.as[(Long, Option[Int])].collect().toSeq == Seq(
      (1L, Some(1)), // one transposition
      (2L, Some(4)),
      (3L, None),
      (4L, None)))
  }

  test("loud guard: inputs beyond MaxBytes throw instead of allocating") {
    val big = "a" * (DamerauLevenshteinExpr.MaxBytes + 1)
    val e = intercept[IllegalArgumentException](dl(big, "b"))
    assert(e.getMessage.contains("substring"))
    // at the bound itself it still computes
    val atCap = "a" * DamerauLevenshteinExpr.MaxBytes
    assert(dl(atCap, atCap) == 0)
  }

  test("agrees with levenshtein when no transpositions are involved") {
    // insert/delete/substitute-only pairs: DL == levenshtein
    val rows = Seq(
      ("banana", "bandana"), ("spark", "sprk"), ("graft", "craft"),
      ("aaaa", "bbbb"), ("abcdefgh", "abXdefgYh"))
    VectorExpressions.register(spark)
    val got = rows.toDF("a", "b")
      .select(expr("graft_damerau(a, b)").as("dl"),
        levenshtein($"a", $"b").as("lev"))
      .as[(Int, Int)].collect()
    got.foreach { case (d, l) => assert(d == l) }
  }
}
