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

  test("groupQuota caps each group deterministically, independent of partitioning") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("grp", (org.apache.spark.sql.functions.col("id") % 7).cast("string"))
    val a = Sampling.groupQuota(df, "id", "grp", maxPerGroup = 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.groupQuota(df.repartition(13), "id", "grp", maxPerGroup = 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "membership must not depend on partitioning")
    val perGroup = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ == 20), s"every group capped at 20: $perGroup")
    // a group smaller than the cap survives whole
    val small = Sampling.groupQuota(df.filter($"id" < 10), "id", "grp", 20)
    assert(small.count() == 10)
  }

  test("groupQuota survives user columns named like its rank temp column") {
    val df = spark.range(0, 100).toDF("id")
      .withColumn("grp", (org.apache.spark.sql.functions.col("id") % 5).cast("string"))
      .withColumn("__rk", org.apache.spark.sql.functions.lit("user-data"))
      .withColumn("__graft_rk_0", org.apache.spark.sql.functions.lit(42))
    val out = Sampling.groupQuota(df, "id", "grp", maxPerGroup = 3)
    assert(out.columns.toSeq == df.columns.toSeq,
      s"user columns must survive untouched: ${out.columns.toSeq}")
    assert(out.count() == 15)
    assert(out.select("__rk").distinct().collect().map(_.getString(0)).toSeq
      == Seq("user-data"))
  }

  test("groupQuota plans as WindowGroupLimit (per-partition top-k, skew-safe)") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("grp", (org.apache.spark.sql.functions.col("id") % 7).cast("string"))
    val plan = Sampling.groupQuota(df, "id", "grp", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan lacks WindowGroupLimit:\n$plan")
  }

  test("temperatureSample flattens the mixture toward c^alpha") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // skewed groups: a=600, b=150, c=50
    val df = spark.range(0, 800).toDF("id")
      .withColumn("grp", when(col("id") < 600, lit("a"))
        .when(col("id") < 750, lit("b")).otherwise(lit("c")))
    val out = Sampling.temperatureSample(df, "id", "grp", alpha = 0.5)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected keep rates: sqrt(50/600)=.2887, sqrt(50/150)=.5774, 1.0
    // membership matches the exact per-row reference
    val ref = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val rates = Map("a" -> math.sqrt(50.0 / 600), "b" -> math.sqrt(50.0 / 150), "c" -> 1.0)
    val cuts = rates.view.mapValues(r => math.floor(r * (1L << 20)).toLong).toMap
    def bucketOf(id: Long): Long = {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types.LongType
      val inner = XxHash64Function.hash(0L, LongType, 42L)
      val h = XxHash64Function.hash(id, LongType, inner)
      ((h % (1L << 20)) + (1L << 20)) % (1L << 20)
    }
    val expect = ref.filter { case (id, g) => bucketOf(id) < cuts(g) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(byGrp == expect, s"got $byGrp expect $expect")
    // smallest group survives whole; ordering of survivor counts flattens
    assert(byGrp("c") == 50L)
    assert(byGrp("a") < 600L * 6 / 10, "large group must be downsampled")
    // alpha=1 keeps everything
    assert(Sampling.temperatureSample(df, "id", "grp", alpha = 1.0).count() == 800)
  }

  test("percentileTrim: exact tie-inclusive per-group quantile cut") {
    // g=a: values 1..100 (p90 ⇒ ⌈0.9·100⌉=90 ⇒ threshold 90, keep 90)
    // g=b: heavy ties — 10×5, 10×7, 2×9: n=22, ⌈0.9·22⌉=20 ⇒ cum(5)=10,
    //      cum(7)=20 ≥ 20 ⇒ threshold 7, keep ALL twenty 5s and 7s
    val rows = (1 to 100).map(v => ("a", v)) ++
      Seq.fill(10)(("b", 5)) ++ Seq.fill(10)(("b", 7)) ++ Seq.fill(2)(("b", 9))
    val df2 = rows.toDF("g", "v")
    val out = Sampling.percentileTrim(df2, "g", "v", q = 0.9)
      .groupBy("g").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out("a") == (90L, 90))
    assert(out("b") == (20L, 7))
    // q=1.0 keeps every row
    assert(Sampling.percentileTrim(df2, "g", "v", q = 1.0).count() == rows.size)
    // NULL values never survive the cut
    val withNull = (Seq(("a", Some(1)), ("a", Some(2)), ("a", None))).toDF("g", "v")
    assert(Sampling.percentileTrim(withNull, "g", "v", q = 1.0).count() == 2)
  }

  test("percentileTrim matches a sort-based reference on random data") {
    for (seed <- Seq(7, 8, 9); q <- Seq(0.5, 0.9, 0.99)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 2000).map(i =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(50), i.toLong))
      val df2 = rows.toDF("g", "v", "rid")
      val got = Sampling.percentileTrim(df2, "g", "v", q)
        .collect().map(_.getAs[Long]("rid")).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val sorted = grp.map(_._2).sorted
        val need = math.ceil(q * sorted.size).toInt
        val thr = sorted(need - 1) // smallest value whose cum count ≥ need
        grp.filter(_._2 <= thr).map(_._3)
      }.toSet
      assert(got == want, s"seed $seed q $q")
    }
  }
}
