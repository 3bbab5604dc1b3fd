package graft.operators

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def run(htmls: String*) =
    TextAnalysis.htmlExtract(
        htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
          .toDF("doc_id", "html"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[String]("text_extracted"), r.getAs[Long]("n_tags")))

  test("strips tags, scripts with bare <, styles, comments") {
    val Array(r) = run(
      "<html><body><script>if (a < b) { x(); }</script><style>p < q</style>" +
        "<!-- note --><h1>Title</h1><p>Hello <b>world</b></p></body></html>")
    assert(r._1 == "Title Hello world")
  }

  test("decodes entities; &amp;lt; yields literal &lt;") {
    val Array(r) = run("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g &amp;lt;h</p>")
    assert(r._1 == "a & b <c> \"d\" 'e' f g &lt;h")
  }

  test("whitespace collapses across newlines and tag boundaries") {
    val Array(r) = run("<div>\n  one\n\ttwo </div>\r\n<div>three</div>")
    assert(r._1 == "one two three")
    assert(r._2 == 4L)
  }

  test("plain text passes through; projection is exchange-free") {
    val df = TextAnalysis.htmlExtract(Seq((1L, "just text")).toDF("doc_id", "html"))
    assert(df.collect()(0).getAs[String]("text_extracted") == "just text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
