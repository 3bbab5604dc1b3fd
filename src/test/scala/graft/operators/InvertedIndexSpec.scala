package graft.operators

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private val docs = Seq(
    (1L, "a b c"),
    (2L, "b c d b"), // duplicate b within doc counts once
    (3L, "c d e"),
    (4L, "c x")
  ).toDF("doc_id", "text")

  test("df cut, per-term postings, duplicates within a doc count once") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2L)
      .orderBy("term").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[Long]("n"), r.getAs[String]("postings")))
    assert(idx.toSeq == Seq(
      ("b", 2L, 2L, "1,2"),
      ("c", 4L, 4L, "1,2,3,4"),
      ("d", 2L, 2L, "2,3")))
  }

  test("paging splits long posting lists at pageSize with global order") {
    val many = (0L until 10L).map(i => (i, "tok")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(many, "doc_id", "text",
        minDf = 1L, pageSize = 4)
      .orderBy("page").collect()
      .map(r => (r.getAs[Long]("page"), r.getAs[Long]("n"),
        r.getAs[String]("postings")))
    assert(idx.toSeq == Seq(
      (0L, 4L, "0,1,2,3"), (1L, 4L, "4,5,6,7"), (2L, 2L, "8,9")))
  }

  test("every output row is bounded by pageSize") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text",
      minDf = 1L, pageSize = 2)
    assert(idx.collect().forall(_.getAs[Long]("n") <= 2L))
  }

  test("tokenizes the corpus once (postings Materialized before both consumers)") {
    val df = graft.Tables.documents(spark, sf())
    val q = TextAnalysis.invertedIndex(df, "doc_id", "text")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"expected the tokenization scan to happen once inside Materialize, got $scans:\n$plan")
  }
}
