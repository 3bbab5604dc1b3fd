package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("salted inner join equals the plain join on a skewed key") {
    // 90% of the big side lands on one hot key
    val big = (1L to 5000L)
      .map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k0", "A"), ("k3", "B"), ("absent", "X"))
      .toDF("k", "tag")

    val plain = big.join(small, Seq("k")).select("k", "v", "tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = SaltedJoin.inner(big, small, "k", salts = 8)
      .select("k", "v", "tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 4500)
  }

  test("salts=1 degenerates to the plain join") {
    val big = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val small = Seq(("a", "x")).toDF("k", "tag")
    val out = SaltedJoin.inner(big, small, "k", salts = 1).collect()
    assert(out.length == 1 && out(0).getString(0) == "a")
  }
}
