package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private lazy val df = (1L to 10000L).map(i => (i, s"doc$i")).toDF("id", "text")

  test("hashSample keeps ~fraction deterministically") {
    val a = Sampling.hashSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b, "sample not deterministic")
    assert(math.abs(a.size - 3000) < 200, s"got ${a.size} of expected ~3000")
    // different seed → different membership, same size ballpark
    val c = Sampling.hashSample(df, "id", 0.3, seed = 7).collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("sample nests: a smaller fraction is a subset of a larger one") {
    val small = Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(df, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("split is a disjoint exhaustive partition") {
    val parts = Sampling.split(df, "id", Seq(0.8, 0.1, 0.1))
      .map(_.collect().map(_.getLong(0)).toSet)
    assert(parts.map(_.size).sum == 10000)
    assert(parts.combinations(2).forall { case Seq(x, y) => (x & y).isEmpty })
    assert(math.abs(parts(0).size - 8000) < 300)
  }

  test("mixture unions weighted down-samples deterministically") {
    val a = (1L to 1000L).map(i => (i, "a")).toDF("id", "text")
    val b = (1L to 1000L).map(i => (i + 100000L, "b")).toDF("id", "text")
    val mixed = Sampling.mixture(Seq(a -> 1.0, b -> 0.25), "id")
    val n = mixed.count()
    assert(n > 1000 && math.abs(n - 1250) < 120, s"got $n of expected ~1250")
    assert(mixed.count() == n) // stable across evaluations
  }
}
