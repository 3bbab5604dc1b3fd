package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** EditDistanceWithin: the banded byte Levenshtein must equal the full
  * Wagner-Fischer DP whenever the true distance is within the budget,
  * return -1 beyond it, and agree with DuckDB's byte convention on
  * multibyte text. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: full O(n·m) Levenshtein over bytes. */
  private def full(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length; val m = b.length
    val dp = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to n; j <- 1 to m) {
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    }
    dp(n)(m)
  }

  private def banded(a: String, b: String, k: Int): Int =
    EditDistanceWithin.banded(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)

  test("banded equals full DP within budget, -1 beyond (property)") {
    val gen = for {
      la <- Gen.choose(0, 16)
      lb <- Gen.choose(0, 16)
      a <- Gen.stringOfN(la, Gen.oneOf('a', 'b', 'c'))
      b <- Gen.stringOfN(lb, Gen.oneOf('a', 'b', 'c'))
      k <- Gen.choose(0, 17)
    } yield (a, b, k)
    val params = ScTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(0xED17))
    val res = ScTest.check(params, Prop.forAll(gen) { (t: (String, String, Int)) =>
      val (a, b, k) = t
      val exact = full(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val got = banded(a, b, k)
      if (exact <= k) got == exact else got == -1
    })
    assert(res.passed, res.status.toString)
  }

  test("byte convention: multibyte substitutions count per byte") {
    // é = 2 UTF-8 bytes, 中/文/字 = 3 each — matches DuckDB levenshtein
    assert(banded("héllo", "hello", 8) == 2)
    assert(banded("中文字", "中文言", 8) == 3)
    assert(banded("abc", "abd", 8) == 1)
  }

  test("edges: empty strings, identical strings, length gap > budget") {
    assert(banded("", "", 0) == 0)
    assert(banded("", "abc", 2) == -1)
    assert(banded("", "abc", 3) == 3)
    assert(banded("same text", "same text", 0) == 0)
    assert(banded("aaaaaaaaaa", "a", 4) == -1)
  }

  test("column surface: nulls propagate, values match the engine") {
    val df = Seq(
      (1L, Some("kitten"), Some("sitting")),
      (2L, Some("flaw"), Some("lawn")),
      (3L, None: Option[String], Some("x")),
      (4L, Some("abc"), Some("xyzabc"))).toDF("id", "a", "b")
    val out = df.select(col("id"),
        TextFunctions.editDistanceWithin(col("a"), col("b"), 3).as("d"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 3) // kitten→sitting
    assert(out(1).getInt(1) == 2) // flaw→lawn
    assert(out(2).isNullAt(1))
    assert(out(3).getInt(1) == 3) // 3 inserts, exactly at budget
  }
}
