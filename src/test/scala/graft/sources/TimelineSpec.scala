package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class TimelineSpec extends AnyFunSuite {

  private def seg(start: Long, end: Long, v: String, shard: Int = 0, n: Int = 1) =
    SegmentDescriptor("ds", start, end, v, shard, n, s"/p/$v/$start/$shard")

  test("single version passes through, clipped to query interval") {
    val out = VersionedTimeline.resolve(Seq(seg(0, 100, "v1")), 10, 60)
    assert(out == Seq(WindowedSegment(seg(0, 100, "v1"), 10, 60)))
  }

  test("newer version fully overshadows older") {
    val out = VersionedTimeline.resolve(Seq(seg(0, 100, "v1"), seg(0, 100, "v2")), 0, 100)
    assert(out.map(_.segment.version) == Seq("v2"))
  }

  test("partial overshadow: old segment stays visible outside the new one") {
    val v1 = seg(0, 100, "v1")
    val v2 = seg(25, 50, "v2")
    val out = VersionedTimeline.resolve(Seq(v1, v2), 0, 100)
    assert(out.toSet == Set(
      WindowedSegment(v1, 0, 25),
      WindowedSegment(v2, 25, 50),
      WindowedSegment(v1, 50, 100)))
  }

  test("all shards of the winning version are included") {
    val s0 = seg(0, 100, "v2", 0, 2)
    val s1 = seg(0, 100, "v2", 1, 2)
    val out = VersionedTimeline.resolve(Seq(seg(0, 100, "v1"), s0, s1), 0, 100)
    assert(out.toSet == Set(WindowedSegment(s0, 0, 100), WindowedSegment(s1, 0, 100)))
  }

  test("adjacent chunks of one version merge into contiguous windows per segment") {
    val a = seg(0, 50, "v1")
    val b = seg(50, 100, "v1")
    val out = VersionedTimeline.resolve(Seq(a, b), 0, 100)
    assert(out.toSet == Set(WindowedSegment(a, 0, 50), WindowedSegment(b, 50, 100)))
  }

  test("gaps yield no windows") {
    val out = VersionedTimeline.resolve(Seq(seg(0, 10, "v1"), seg(90, 100, "v1")), 20, 80)
    assert(out.isEmpty)
  }

  test("out-of-interval segments are pruned before any resolution") {
    val out = VersionedTimeline.resolve(Seq(seg(0, 10, "v9"), seg(10, 20, "v1")), 10, 20)
    assert(out == Seq(WindowedSegment(seg(10, 20, "v1"), 10, 20)))
  }
}
