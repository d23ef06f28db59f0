package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL normalization goldens (every rule exercised), registered-domain
  * extraction incl. multi-part public suffixes, variant collapse,
  * latest-wins dedup, the broadcast-anti-join blocklist, and the
  * zero-exchange plan of the normalization projection.
  */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def norm(raw: String): (String, String, String) = {
    import spark.implicits._
    val r = UrlOps.withUrlParts(Seq((1L, raw)).toDF("doc_id", "url_raw"))
      .select("host", "registered_domain", "url_norm").collect()(0)
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("normalization goldens: each rule in isolation and combined") {
    // fragment + tracking params + param sort + case + www
    assert(norm("HTTP://WWW.Example.COM/a/B?z=2&utm_source=x&a=1#frag") ==
      (("example.com", "example.com", "http://example.com/a/B?a=1&z=2")))
    // default ports dropped, explicit port kept
    assert(norm("http://site.org:80/p")._3 == "http://site.org/p")
    assert(norm("https://site.org:443/p")._3 == "https://site.org/p")
    assert(norm("http://site.org:8080/p")._3 == "http://site.org:8080/p")
    // path case preserved; duplicate + trailing slashes collapsed
    assert(norm("https://a.io//X//Y///")._3 == "https://a.io/X/Y")
    // empty path -> /; all-tracking query vanishes entirely
    assert(norm("https://a.io?fbclid=1&gclid=2&msclkid=3&ref=h&utm_a=b")._3 ==
      "https://a.io/")
    // only ONE leading www label is stripped
    assert(norm("http://www.www2.a.io/p")._1 == "www2.a.io")
  }

  test("registered domain: bare, subdomain, and multi-part suffix") {
    assert(norm("http://example.com/")._2 == "example.com")
    assert(norm("http://deep.sub.example.com/")._2 == "example.com")
    assert(norm("http://news.site3.co.uk/")._2 == "site3.co.uk")
    assert(norm("http://shop.site.ac.jp/")._2 == "site.ac.jp")
    // 'co' label not followed by a 2-char TLD stays a normal label
    assert(norm("http://a.co.com/")._2 == "co.com")
    assert(norm("http://localhost/")._2 == "localhost")
  }

  test("variants of one page collapse to one url_norm; latest doc_id survives") {
    import spark.implicits._
    val variants = Seq(
      (10L, "http://www.Site.com/wiki/Page?id=7&utm_source=a"),
      (11L, "HTTP://SITE.COM:80/wiki/Page?id=7#sec2"),
      (12L, "http://site.com//wiki/Page/?id=7"),
      (20L, "https://other.io/p?x=1")
    ).toDF("doc_id", "url_raw")
    val parts = UrlOps.withUrlParts(variants)
    assert(parts.select("url_norm").distinct().count() == 2)
    val surv = UrlOps.latestPerUrl(parts)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(surv("http://site.com/wiki/Page?id=7") == 12L)
    val nv = UrlOps.latestPerUrl(parts)
      .where(col("url_norm") === "http://site.com/wiki/Page?id=7")
      .select("n_versions").as[Long].collect()(0)
    assert(nv == 3L)
  }

  test("domainStats counts docs, distinct urls, distinct hosts per domain") {
    import spark.implicits._
    val d = Seq(
      (1L, "http://a.site.com/x"), (2L, "http://a.site.com/x"),
      (3L, "http://b.site.com/y"), (4L, "https://other.io/z")
    ).toDF("doc_id", "url_raw")
    val st = UrlOps.domainStats(UrlOps.withUrlParts(d))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(st("site.com") == ((3L, 2L, 2L)))
    assert(st("other.io") == ((1L, 1L, 1L)))
  }

  test("blocklist filter: anti-join drops blocked domains via broadcast") {
    import spark.implicits._
    val d = (0L until 40L).map { i =>
      (i, s"http://site${i % 4}.com/p$i")
    }.toDF("doc_id", "url_raw")
    val parts = UrlOps.withUrlParts(d)
    val kept = UrlOps.domainBlockFilter(parts, Seq("site0.com", "site2.com"))
    assert(kept.count() == 20)
    assert(kept.select("registered_domain").distinct()
      .as[String].collect().toSet == Set("site1.com", "site3.com"))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist must broadcast-anti-join, corpus side unshuffled:\n$plan")
  }

  test("plan: normalization is one zero-exchange projection, no UDF") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, s"http://www.s$i.com/p?utm_x=1&id=$i"))
      .toDF("doc_id", "url_raw")
    val q = UrlOps.withUrlParts(d)
    q.count()
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"URL normalization must not shuffle:\n$plan")
    assert(!plan.toString.contains("ScalaUDF"))
  }

  test("domainSplit: leakage-free (one split per domain), stable, and roughly weighted") {
    import spark.implicits._
    val d = (0L until 4000L).map(i => (i, s"http://www.host$i.dom${i % 2000}.com/p"))
      .toDF("doc_id", "url_raw")
    val assigned = UrlOps.domainSplit(UrlOps.withUrlParts(d)).cache()
    // leakage-freeness: a registered domain never straddles splits
    assert(assigned.groupBy("registered_domain")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() == 0)
    // stability: the assignment is a pure function of the domain — the
    // same domain in a DIFFERENT corpus lands in the same split
    val d2 = Seq((999999L, "https://dom7.com/other/page?x=1"))
      .toDF("doc_id", "url_raw")
    val s1 = assigned.filter(col("registered_domain") === "dom7.com")
      .select("split").distinct().as[String].collect()
    val s2 = UrlOps.domainSplit(UrlOps.withUrlParts(d2))
      .select("split").as[String].collect()
    assert(s1.length == 1 && s2.sameElements(s1))
    // per-mille thresholds: bucket ranges map to the right labels
    assert(assigned.filter(col("split_bucket") < 800 && col("split") =!= "train").count() == 0)
    assert(assigned.filter(col("split_bucket") >= 900 && col("split") =!= "test").count() == 0)
    // rough weight check over 2000 domains (murmur uniformity: 80% ± 5pp)
    val frac = assigned.select("registered_domain", "split").distinct()
      .filter(col("split") === "train").count() / 2000.0
    assert(frac > 0.75 && frac < 0.85, s"train domain fraction $frac")
    assigned.unpersist()
  }

  test("domainSplit: domainless rows (unparseable URL) go to the first split, never eval") {
    import spark.implicits._
    // garbage URLs yield registered_domain '' and would otherwise share
    // ONE hash bucket — the whole malformed class landing in whichever
    // split that constant bucket picks (possibly eval)
    val d = Seq((1L, "not a url at all"), (2L, "%%%///"), (3L, "http://ok.com/p"))
      .toDF("doc_id", "url_raw")
    val s = UrlOps.domainSplit(UrlOps.withUrlParts(d))
      .select("doc_id", "registered_domain", "split").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(s(1L)._1 == "" && s(1L)._2 == "train")
    assert(s(2L)._1 == "" && s(2L)._2 == "train")
    // under a recipe whose FIRST split is held-out, the malformed class
    // must still land in the split NAMED train, not positionally in eval
    val evalHeavy = UrlOps.domainSplit(UrlOps.withUrlParts(d),
      Seq("heldout" -> 999, "train" -> 1))
      .filter(col("registered_domain") === "")
      .select("split").distinct().as[String].collect()
    assert(evalHeavy.sameElements(Array("train")))
    // a recipe with no "train" split falls back to the head split
    val noTrain = UrlOps.domainSplit(UrlOps.withUrlParts(d),
      Seq("a" -> 500, "b" -> 500))
      .filter(col("registered_domain") === "")
      .select("split").distinct().as[String].collect()
    assert(noTrain.sameElements(Array("a")))
  }

  test("domainSplit: custom recipe validated; single-split recipe degenerates cleanly") {
    import spark.implicits._
    val d = UrlOps.withUrlParts(Seq((1L, "http://a.com/")).toDF("doc_id", "url_raw"))
    intercept[IllegalArgumentException] {
      UrlOps.domainSplit(d, Seq("a" -> 500, "b" -> 400)) // sums to 900
    }
    val one = UrlOps.domainSplit(d, Seq("all" -> 1000))
      .select("split").collect()(0).getString(0)
    assert(one == "all")
  }

  test("plan: domainSplit adds zero exchanges (pure per-row assignment, no domain join)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, s"http://s$i.com/p")).toDF("doc_id", "url_raw")
    val q = UrlOps.domainSplit(UrlOps.withUrlParts(d))
    q.count()
    val plan = q.queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"domainSplit must not shuffle or broadcast:\n$plan")
  }
}
