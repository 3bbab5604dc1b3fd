package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShuffleOrderSpec extends SparkSpec {
  import spark.implicits._

  private def input(n: Int, parts: Int) =
    spark.range(0, n, 1, parts).toDF("doc_id")

  test("positions are a dense permutation of [0, n)") {
    val out = ShuffleOrder.order(input(500, 7), "doc_id", seed = 7L)
    val pos = out.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until 500L))
  }

  test("matches the one-task global sort it replaces, on every shard width") {
    val df = input(300, 5)
    // UNSIGNED hash order (the operator's and the DuckDB mirror's
    // contract): xor with the sign bit maps it onto signed order
    val brute = df
      .withColumn("k", ShuffleOrder.seededHash(col("doc_id"), 7L))
      .orderBy(col("k").bitwiseXOR(lit(Long.MinValue)), col("doc_id"))
      .select("doc_id").as[Long].collect()
    for (bits <- Seq(1, 3, 8)) {
      val got = ShuffleOrder.order(df, "doc_id", seed = 7L, shardBits = bits)
        .orderBy("pos").select("doc_id").as[Long].collect()
      assert(got.toSeq == brute.toSeq, s"shardBits=$bits")
    }
  }

  test("independent of input partitioning") {
    val a = ShuffleOrder.order(input(400, 1), "doc_id", seed = 11L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    val b = ShuffleOrder.order(input(400, 13), "doc_id", seed = 11L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("different seeds give different permutations; same seed is stable") {
    val df = input(256, 4)
    def run(seed: Long) = ShuffleOrder.order(df, "doc_id", seed)
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(run(1L) == run(1L))
    assert(run(1L) != run(2L))
  }

  test("shard is the hash's top bits and orders align across shards") {
    val out = ShuffleOrder.order(input(300, 3), "doc_id", seed = 7L, shardBits = 3)
      .withColumn("k", ShuffleOrder.seededHash(col("doc_id"), 7L))
      .select(col("pos"), col("shard"),
        shiftrightunsigned(col("k"), 61).as("expect"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // positions within a lower shard all precede any higher shard's
    val byShard = out.groupBy(_.getLong(1)).view
      .mapValues(rs => (rs.map(_.getLong(0)).min, rs.map(_.getLong(0)).max))
    byShard.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byShard(a)._2 < byShard(b)._1)
      case _ =>
    }
  }

  test("bases join is broadcast; no merge join, no data-wide single partition") {
    val plan = ShuffleOrder.order(input(300, 5), "doc_id", 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tokenBudget: exact prefix in shuffle order, boundary doc truncated") {
    val df = input(200, 6).withColumn("ntok", (col("doc_id") % 7 + 1).cast("long"))
    val ordered = ShuffleOrder.orderWithTokens(df, "doc_id", "ntok",
      seed = 7L, shardBits = 3)
    val budget = 300L
    val out = ShuffleOrder.tokenBudget(ordered, "ntok", budget)
      .orderBy("pos")
      .select("pos", "ntok", "tok_start", "tok_take").collect()
    // brute: walk the permutation accumulating tokens
    val walk = ordered.orderBy("pos").select("pos", "ntok").collect()
    var cum = 0L
    val expect = walk.takeWhile { r => val keep = cum < budget; cum += r.getLong(1); keep }
    assert(out.length == expect.length)
    var at = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("tok_start") == at)
      assert(r.getAs[Long]("tok_take") ==
        math.min(r.getAs[Long]("ntok"), budget - at))
      at += r.getAs[Long]("ntok")
    }
    // the kept takes sum to the budget exactly
    assert(out.map(_.getAs[Long]("tok_take")).sum == budget)
  }

  test("tokenBudget: rank + token sum share one Window pass, one data exchange") {
    val df = input(100, 4).withColumn("ntok", lit(3L))
    val plan = ShuffleOrder.tokenBudget(
        ShuffleOrder.orderWithTokens(df, "doc_id", "ntok", 7L), "ntok", 50L)
      .queryExecution.executedPlan.toString
    // the main branch's rank and running-sum evaluate in ONE Window
    // node behind ONE hashpartitioning(shard) exchange; the only other
    // shard exchange is the bounded base-table aggregate's
    val dataExchanges = "Exchange hashpartitioning\\(shard".r.findAllIn(plan).size
    assert(dataExchanges <= 2, s"unexpected re-exchange of the data:\n$plan")
    assert("row_number".r.findAllIn(plan).size >= 1 && !plan.contains("SortMergeJoin"), plan)
  }

  test("curriculumOrder: bucket-major, shuffled within bucket, still a permutation") {
    val df = input(400, 6).withColumn("bucket", (col("doc_id") % 3).cast("int"))
    val out = ShuffleOrder.curriculumOrder(df, "doc_id", "bucket",
      seed = 7L, bucketBits = 2, shardBits = 4).collect()
    assert(out.map(r => r.getAs[Long]("pos")).sorted.toSeq == (0L until 400L))
    // positions of bucket b all precede bucket b+1's
    val ranges = out.groupBy(_.getAs[Int]("bucket")).view
      .mapValues(rs => (rs.map(_.getAs[Long]("pos")).min,
        rs.map(_.getAs[Long]("pos")).max))
    Seq(0, 1).foreach(b => assert(ranges(b)._2 < ranges(b + 1)._1))
    // within a bucket the order is the plain shuffle order of that subset
    val sub = df.filter(col("bucket") === 1)
    val plain = ShuffleOrder.order(sub.drop("bucket"), "doc_id", 7L, shardBits = 2)
      .orderBy("pos").select("doc_id").as[Long].collect()
    val curr = out.filter(_.getAs[Int]("bucket") == 1)
      .sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
    assert(curr.toSeq == plain.toSeq)
  }

  test("curriculumOrder: out-of-range bucket raises; composes with token budget") {
    val bad = input(10, 1).withColumn("bucket", lit(9))
    val e = intercept[Exception] {
      ShuffleOrder.curriculumOrder(bad, "doc_id", "bucket",
        seed = 1L, bucketBits = 2, shardBits = 4).collect()
    }
    assert(e.getMessage != null)
    val df = input(100, 4)
      .withColumn("bucket", (col("doc_id") % 2).cast("int"))
      .withColumn("ntok", lit(5L))
    val cut = ShuffleOrder.tokenBudget(
      ShuffleOrder.curriculumOrderWithTokens(df, "doc_id", "bucket", "ntok",
        seed = 7L, bucketBits = 1, shardBits = 3),
      "ntok", budget = 120L).orderBy("pos").collect()
    assert(cut.map(_.getAs[Long]("tok_take")).sum == 120L)
    // the budget lands inside bucket 0 (50 docs x 5 = 250 > 120)
    assert(cut.forall(_.getAs[Int]("bucket") == 0))
  }

  test("writeOrdered: files tile the position space in name order") {
    val dir = java.nio.file.Files.createTempDirectory("shuford").toString
    val out = ShuffleOrder.order(input(300, 5), "doc_id", 7L)
    ShuffleOrder.writeOrdered(out, dir, numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4)
    var next = 0L
    files.foreach { f =>
      val pos = spark.read.parquet(f).select("pos").as[Long].collect()
      // contiguous ascending range continuing the previous file's
      assert(pos.toSeq == (next until next + pos.length))
      next += pos.length
    }
    assert(next == 300L)
  }

  test("rejects bad shardBits and colliding output columns") {
    intercept[IllegalArgumentException] {
      ShuffleOrder.order(input(10, 1), "doc_id", 1L, shardBits = 0)
    }
    intercept[IllegalArgumentException] {
      ShuffleOrder.order(input(10, 1).withColumn("pos", lit(0)), "doc_id", 1L)
    }
    // internal working columns are reserved too — an input carrying
    // them would be silently overwritten/dropped, not renamed
    for (c <- Seq("__k", "__rn", "__base", "__ct", "__tbase"))
      intercept[IllegalArgumentException] {
        ShuffleOrder.order(input(10, 1).withColumn(c, lit(0)), "doc_id", 1L)
      }
    // tok_start is reserved only when tokens are requested
    ShuffleOrder.order(
      input(10, 1).withColumn("tok_start", lit(0)), "doc_id", 1L).collect()
    intercept[IllegalArgumentException] {
      ShuffleOrder.orderWithTokens(
        input(10, 1).withColumn("tok_start", lit(0))
          .withColumn("ntok", lit(1L)),
        "doc_id", "ntok", 1L)
    }
    // re-ordering previously ordered output: drop the outputs first
    val once = ShuffleOrder.order(input(10, 1), "doc_id", 1L)
    intercept[IllegalArgumentException] {
      ShuffleOrder.order(once, "doc_id", 2L)
    }
    val again = ShuffleOrder.order(once.drop("pos", "shard"), "doc_id", 2L)
    assert(again.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L))
  }
}
