package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII detection + redaction: goldens for every category, the fixed
  * redaction order (SSN/CC before the greedy phone pattern), filter
  * semantics, and the no-shuffle/no-UDF plan shape.
  */
class PiiSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("every category detected and redacted; clean text untouched") {
    import spark.implicits._
    val t = "mail a.b+c@x-y.co or +4915112345678, ip 192.168.0.1, " +
      "ssn 987-65-4321, card 4111-1111-1111-1111 end"
    val sig = Pii.withPiiSignals(one(t)).collect()(0)
    assert(sig.getAs[Int]("n_email") == 1 && sig.getAs[Int]("n_phone") == 1 &&
      sig.getAs[Int]("n_ipv4") == 1 && sig.getAs[Int]("n_ssn") == 1 &&
      sig.getAs[Int]("n_cc") == 1 && sig.getAs[Int]("n_pii") == 5)
    val red = Pii.redactPii(one(t)).select("text").as[String].collect()(0)
    assert(red == "mail <EMAIL> or <PHONE>, ip <IP>, ssn <SSN>, card <CC> end")

    val clean = "melting point of water is 273 K; see section 4.2 for details"
    assert(Pii.withPiiSignals(one(clean)).collect()(0).getAs[Int]("n_pii") == 0)
    assert(Pii.redactPii(one(clean)).select("text").as[String].collect()(0) == clean)
  }

  test("redaction order: dashed SSN/CC digit runs are not eaten by other patterns") {
    import spark.implicits._
    // an SSN directly after a phone, and a CC with spaces — each must
    // redact as its own category, not as a phone fragment
    val t = "+12025550198 987-65-4321 and 4111 1111 1111 1111"
    val red = Pii.redactPii(one(t)).select("text").as[String].collect()(0)
    assert(red == "<PHONE> <SSN> and <CC>")
  }

  test("piiFree keeps only documents with zero detections") {
    import spark.implicits._
    val d = Seq(
      (1L, "no pii here at all"),
      (2L, "reach me at someone@example.org"),
      (3L, "server 10.0.0.1 answered")
    ).toDF("doc_id", "text")
    assert(Pii.piiFree(d).select("doc_id").as[Long].collect().toSet == Set(1L))
    // schema preserved (original columns, no signal columns)
    assert(Pii.piiFree(d).columns.toSeq == Seq("doc_id", "text"))
  }

  test("plan: zero exchanges, no UDF — regexp expressions only") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val q = Pii.redactPii(Pii.piiFree(d))
    q.count()
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"PII scrub must not shuffle:\n$plan")
    assert(!plan.toString.contains("ScalaUDF"))
  }
}
