package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("bloom semi-join ≡ plain left_semi join, row for row") {
    // keys engineered so the bloom sees plenty of non-members
    val big = spark.range(0, 20000)
      .select(($"id" % 4096).as("k"), $"id".as("payload"))
    val small = spark.range(0, 4096).filter($"id" % 37 === 0)
      .select($"id".as("sk"))
    val got = BloomJoin.semi(big, small, "k", "sk",
        expectedItems = 1000, fpp = 0.03)
      .orderBy("payload").collect().map(_.getLong(1))
    val want = big.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .orderBy("payload").collect().map(_.getLong(1))
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("prefilter has no false negatives and rejects most non-members") {
    val small = spark.range(0, 1000).filter($"id" % 10 === 0).select($"id".as("sk"))
    val bloom = BloomJoin.bloomOf(small, "sk", expectedItems = 100, fpp = 0.01)
    val probe = spark.range(0, 100000).select(($"id" % 1000).as("k"))
    val pre = probe.where(BloomJoin.mightContain(bloom, $"k")).count()
    val exact = probe.join(small.select($"sk".as("k")), Seq("k"), "left_semi").count()
    assert(pre >= exact, "bloom must never drop a true member")
    // 10% true members at 1% fpp: the prefilter must reject the bulk
    assert(pre <= exact * 2,
      s"bloom rejected too little: $pre passed vs $exact members")
  }

  test("NULL probe keys drop (equi-join semantics), null-keyed build rows are harmless") {
    val small = Seq(Some(1L), None, Some(3L)).toDF("sk")
    val bloom = BloomJoin.bloomOf(small, "sk", expectedItems = 10)
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val kept = probe.where(BloomJoin.mightContain(bloom, $"k"))
      .collect().flatMap(r => Option(r.get(0)))
    assert(kept.contains(1L))
    assert(!kept.contains(null))
    val semi = BloomJoin.semi(probe, small, "k", "sk", expectedItems = 10)
      .collect().map(_.getLong(0))
    assert(semi.toSeq == Seq(1L))
  }

  test("prefilter runs in the probe scan stage, BELOW the join exchange") {
    // force the shuffle-join regime (the operator's target scenario:
    // small side too big to broadcast) and check the bloom filter
    // sits under the probe side's Exchange — rows drop BEFORE shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(0, 5000).select(($"id" % 512).as("k"))
      val small = spark.range(0, 512).filter($"id" % 9 === 0).select($"id".as("sk"))
      val df = BloomJoin.semi(big, small, "k", "sk", expectedItems = 100)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val exch = plan.indexOf("Exchange")
      val mc = plan.indexOf("might_contain")
      assert(exch >= 0 && mc >= 0, s"plan missing exchange or bloom filter:\n$plan")
      // tree text prints children after parents: the bloom filter line
      // appearing after the first Exchange line means it executes
      // inside (below) the shuffle's input stage, not after the join
      assert(mc > exch, s"bloom prefilter must sit below the exchange:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join under the forced regime:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("invalid sizing parameters fail loudly") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](BloomJoin.bloomOf(df, "k", 0))
    intercept[IllegalArgumentException](BloomJoin.bloomOf(df, "k", 10, fpp = 1.5))
  }
}
