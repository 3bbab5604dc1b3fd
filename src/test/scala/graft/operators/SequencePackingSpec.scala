package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class SequencePackingSpec extends SparkSpec {

  private val SeqLen = 100
  private val Shards = 3

  // (id, ntok) corpus with boundary shapes: exact-fit, multi-sequence
  // spanning, single-token, zero-token, and a doc longer than 2·seqLen
  private def corpus(): Seq[(Long, Long)] = Seq(
    (1L, 40L), (2L, 60L), (3L, 100L), (4L, 1L), (5L, 0L),
    (6L, 250L), (7L, 99L), (8L, 101L), (9L, 7L), (10L, 100L),
    (11L, 33L), (12L, 0L), (13L, 500L), (14L, 12L), (15L, 88L))

  private def packed(): DataFrame = {
    import spark.implicits._
    SequencePacking.pack(corpus().toDF("doc_id", "ntok"),
      "doc_id", "ntok", seqLen = SeqLen, shards = Shards)
  }

  private def shardOf(id: Long): Long = {
    val h = XxHash64Function.hash(id, LongType, 42L)
    ((h % Shards) + Shards) % Shards
  }

  test("pack reproduces the sequential concat-then-split layout exactly") {
    val rows = packed().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // engine-independent oracle: per shard, walk docs in id order and
    // cut windows sequentially
    val expected = corpus().filter(_._2 > 0).groupBy { case (id, _) => shardOf(id) }
      .toSeq.flatMap { case (shard, ds) =>
        var off = 0L
        ds.sortBy(_._1).flatMap { case (id, ntok) =>
          val spans = (off / SeqLen) to ((off + ntok - 1) / SeqLen)
          val out = spans.map { s =>
            val from = math.max(0L, s * SeqLen - off)
            val to = math.min(ntok, (s + 1) * SeqLen - off)
            (id, shard, s, from, to, math.max(0L, off - s * SeqLen))
          }
          off += ntok
          out
        }
      }
    assert(rows.sorted.toSeq == expected.sorted)
  }

  test("per-doc spans tile [0, ntok); per-sequence spans tile [0, seqLen)") {
    val rows = packed().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val ntok = corpus().toMap
    // doc side: contiguous coverage of the whole document
    rows.groupBy(_._1).foreach { case (id, spans) =>
      val s = spans.sortBy(_._3)
      assert(s.head._4 == 0L, s"doc $id first span starts at ${s.head._4}")
      assert(s.last._5 == ntok(id), s"doc $id last span ends at ${s.last._5}")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"doc $id gap between ${a._5} and ${b._4}")
          assert(b._3 == a._3 + 1, s"doc $id skips a sequence")
        case _ => ()
      }
    }
    // sequence side: every sequence except each shard's last is FULL
    val byShardSeq = rows.groupBy(r => (r._2, r._3))
    val lastSeq = rows.groupBy(_._2).map { case (sh, rs) => sh -> rs.map(_._3).max }
    byShardSeq.foreach { case ((sh, seq), spans) =>
      val covered = spans.map(s => s._5 - s._4).sum
      if (seq != lastSeq(sh))
        assert(covered == SeqLen, s"shard $sh seq $seq holds $covered tokens")
      else assert(covered <= SeqLen)
      // offsets tile without overlap
      val offs = spans.sortBy(_._6)
      offs.sliding(2).foreach {
        case Array(a, b) => assert(a._6 + (a._5 - a._4) == b._6,
          s"shard $sh seq $seq overlap/gap at ${b._6}")
        case _ => ()
      }
      assert(offs.head._6 == 0L, s"shard $sh seq $seq starts at ${offs.head._6}")
    }
    // zero-token docs emit nothing
    assert(!rows.exists(r => r._1 == 5L || r._1 == 12L))
  }

  test("layout is independent of partitioning and input order") {
    import spark.implicits._
    val base = packed().collect().map(_.toSeq).sortBy(_.toString)
    val shuffled = SequencePacking.pack(
      corpus().reverse.toDF("doc_id", "ntok").repartition(7),
      "doc_id", "ntok", seqLen = SeqLen, shards = Shards)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(base.toSeq == shuffled.toSeq)
  }

  test("one exchange: the per-shard window is the only shuffle") {
    import spark.implicits._
    val plan = SequencePacking.pack(corpus().toDF("doc_id", "ntok"),
        "doc_id", "ntok", seqLen = SeqLen, shards = Shards)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
  }

  test("duplicate ids still tile (ROWS frame, not RANGE peers)") {
    import spark.implicits._
    // two docs share id 1 (same shard by construction): under the
    // default RANGE frame both would see the post-peer cumulative sum
    // and the layout would overlap/gap; ROWS gives each its own prefix
    val rows = SequencePacking.pack(
      Seq((1L, 60L), (1L, 40L), (2L, 30L)).toDF("doc_id", "ntok"),
      "doc_id", "ntok", seqLen = 100, shards = 1).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // 130 tokens total → sequence 0 holds exactly 100, sequence 1 the rest
    val bySeq = rows.groupBy(_._1)
    assert(bySeq(0L).map(s => s._3 - s._2).sum == 100L)
    assert(bySeq.get(1L).map(_.map(s => s._3 - s._2).sum).getOrElse(0L) == 30L)
    // offsets tile each sequence without overlap
    bySeq.foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + (a._3 - a._2) == b._4)
        case _ => ()
      }
    }
  }

  test("id column colliding with an output column is rejected") {
    import spark.implicits._
    val df = corpus().toDF("seq", "ntok")
    intercept[IllegalArgumentException] {
      SequencePacking.pack(df, "seq", "ntok", seqLen = 10, shards = 2)
    }
  }
}
