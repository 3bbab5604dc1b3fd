package graft.operators

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def run(texts: String*) =
    Pii.redact(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[String]("clean"), r.getAs[Long]("n_email"),
        r.getAs[Long]("n_ssn"), r.getAs[Long]("n_ip"),
        r.getAs[Long]("n_phone"), r.getAs[Long]("n_pii")))

  test("each kind redacts to its token with correct counts") {
    val Array(email, ssn, ip, phone) = run(
      "mail a.b+c@sub.example.co today",
      "ssn is 123-45-6789.",
      "host 192.168.0.1 responded",
      "call (555) 010-4242 or +1 555-010-4242")
    assert(email == ("mail <EMAIL> today", 1L, 0L, 0L, 0L, 1L))
    assert(ssn == ("ssn is <SSN>.", 0L, 1L, 0L, 0L, 1L))
    assert(ip == ("host <IP> responded", 0L, 0L, 1L, 0L, 1L))
    assert(phone == ("call <PHONE> or <PHONE>", 0L, 0L, 0L, 2L, 2L))
  }

  test("clean text passes through unchanged; mixed text redacts all kinds") {
    val Array(clean, mixed) = run(
      "no personal data here 42 10.5 1-2",
      "x@y.io at 10.0.0.7, ssn 111-22-3333, tel 555-123-4567")
    assert(clean == ("no personal data here 42 10.5 1-2", 0L, 0L, 0L, 0L, 0L))
    assert(mixed == ("<EMAIL> at <IP>, ssn <SSN>, tel <PHONE>",
      1L, 1L, 1L, 1L, 4L))
  }

  test("shapes do not cross-fire: ssn is not a phone, ip is not a phone") {
    val Array(r) = run("ids 123-45-6789 and 10.1.2.3 only")
    assert(r._5 == 0L, s"phone must not match ssn/ip shapes: $r")
    assert(r == ("ids <SSN> and <IP> only", 0L, 1L, 1L, 0L, 2L))
  }

  test("redaction is a zero-exchange projection") {
    val df = Pii.redact(Seq((1L, "a@b.co")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
