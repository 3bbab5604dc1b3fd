package graft.functions

import graft.SparkSpec

class SignProjectionSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def expected(v: Seq[Double], k: Int, seed: Long = 0L): Seq[Double] = {
    val out = Array.fill(k)(0.0)
    for (d <- v.indices; j <- 0 until k) {
      val h = SignProjection.mix64(seed + j * 65536L + d)
      out(j) += (if ((h & 1L) == 1L) v(d) else -v(d))
    }
    out.map(_ * (1.0 / math.sqrt(k.toDouble))).toSeq
  }

  test("projection matches the independent recomputation, float and double input") {
    val v = (0 until 64).map(i => (i * 7 % 13) - 6.0)
    val fl = Seq((1L, v.map(_.toFloat))).toDF("id", "v")
      .select(VectorFunctions.signProjection($"v", 8).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(fl == expected(v.map(_.toFloat.toDouble), 8))
    val db = Seq((1L, v)).toDF("id", "v")
      .select(VectorFunctions.signProjection($"v", 8).as("p"))
      .collect()(0).getSeq[Double](0)
    assert(db == expected(v, 8))
  }

  test("JL property: projected distances track original distances") {
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(40)(Seq.fill(64)(rng.nextGaussian()))
    val projs = vecs.map(expected(_, 16))
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map(p => (p._1 - p._2) * (p._1 - p._2)).sum)
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield dist(projs(i), projs(j)) / dist(vecs(i), vecs(j))
    // sign-JL at k=16: distances preserved in expectation; all pair
    // ratios should live in a moderate band around 1
    assert(ratios.forall(r => r > 0.3 && r < 1.9),
      s"ratio band violated: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean")
  }

  test("different seeds give different projections") {
    val v = (0 until 16).map(_.toDouble)
    assert(expected(v, 4, 0L) != expected(v, 4, 1L))
  }

  test("real codegen: no fallback in the projected plan") {
    val df = spark.range(2)
      .select(org.apache.spark.sql.functions.array(
        ($"id" + 1).cast("double"), ($"id" + 2).cast("double")).as("v"))
      .select(VectorFunctions.signProjection($"v", 4).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [signprojection"), plan)
    df.collect()
  }
}
