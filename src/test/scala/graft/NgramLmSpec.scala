package graft

import graft.operators.NgramLm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM quality scoring: count goldens, smoothing tiers
  * (seen/backoff/OOV), driver-side bit-exact score replay, the
  * quality ordering it exists to produce, partition invariance, and
  * the broadcast-only scoring plan.
  */
class NgramLmSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigram counts golden incl. head totals") {
    import spark.implicits._
    val ref = df(Seq((1L, "a b a b c"), (2L, "a b")))
    // bigrams: (a,b)x3 (b,a) (b,c)
    val got = NgramLm.counts(ref).as[(String, String, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", "b", 3L, 3L), ("b", "a", 1L, 2L), ("b", "c", 1L, 2L)))
    assert(NgramLm.vocabSize(ref) == 4L) // a b c + OOV
  }

  test("model table has the three smoothing tiers with add-one values") {
    import spark.implicits._
    val ref = df(Seq((1L, "a b a b c"), (2L, "a b")))
    val v = NgramLm.vocabSize(ref)
    val lm = NgramLm.lmTable(NgramLm.counts(ref), v)
      .select("w1", "w2", "lp")
      .as[(String, String, Double)].collect().toMap2
    assert(lm(("a", "b")) == math.log((3.0 + 1.0) / (3.0 + 4.0)))
    assert(lm(("a", "")) == math.log(1.0 / (3.0 + 4.0)))
    assert(lm(("b", "")) == math.log(1.0 / (2.0 + 4.0)))
    assert(lm(("", "")) == math.log(1.0 / 4.0))
    assert(lm.values.forall(_ < 0.0))
  }

  implicit class ToMap2(rows: Array[(String, String, Double)]) {
    def toMap2: Map[(String, String), Double] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }

  test("scores replay bit-exactly against a driver-side fixed-point sum") {
    import spark.implicits._
    val ref = df(Seq((1L, "a b a b c"), (2L, "a b c a")))
    val v = NgramLm.vocabSize(ref)
    val lm = NgramLm.lmTable(NgramLm.counts(ref), v)
    val lmMap = lm.select("w1", "w2", "lp")
      .as[(String, String, Double)].collect().toMap2
    val docs = df(Seq((10L, "a b c"), (11L, "a zzz b"), (12L, "qq rr")))
    val got = NgramLm.score(docs, lm)
      .select("doc_id", "n_bigrams", "sum_lp", "avg_lp")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def q(x: Double) = math.floor(x * NgramLm.Shift + 0.5).toLong
    def lpq(w1: String, w2: String): Long =
      q(lmMap.getOrElse((w1, w2),
        lmMap.getOrElse((w1, ""), lmMap(("", "")))))
    for ((id, text) <- Seq((10L, "a b c"), (11L, "a zzz b"), (12L, "qq rr"))) {
      val ws = text.split(" ").filter(_.nonEmpty)
      val qs = ws.sliding(2).map(p => lpq(p(0), p(1))).toSeq
      val sum = qs.sum.toDouble / NgramLm.Shift
      val (gid, gn, gsum, gavg) = got(id)
      assert(gn == qs.size && gid == id)
      assert(java.lang.Double.doubleToLongBits(gsum) ==
        java.lang.Double.doubleToLongBits(sum), s"doc $id sum")
      assert(java.lang.Double.doubleToLongBits(gavg) ==
        java.lang.Double.doubleToLongBits(sum / qs.size), s"doc $id avg")
      // quantization is invisible at classification scale
      val exact = ws.sliding(2).map(p => lmMap.getOrElse((p(0), p(1)),
        lmMap.getOrElse((p(0), ""), lmMap(("", ""))))).sum
      assert(math.abs(sum - exact) < 1e-8, s"doc $id quantization error")
    }
  }

  test("quality ordering: reference-like text outscores OOV gibberish") {
    import spark.implicits._
    val ref = df(Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug")))
    // floor 1: this two-sentence fixture is all singleton bigrams — the
    // production floor (2) is exercised by its own test below
    val lm = NgramLm.lmTable(NgramLm.counts(ref), NgramLm.vocabSize(ref),
      minBigramCount = 1L)
    val docs = df(Seq(
      (10L, "the cat sat on the rug"), // in-domain
      (11L, "the cat xyzzy plugh mat"), // partial junk
      (12L, "xx yy zz ww qq pp"))) // OOV junk
    val s = NgramLm.score(docs, lm).select("doc_id", "avg_lp")
      .as[(Long, Double)].collect().toMap
    assert(s(10L) > s(11L) && s(11L) > s(12L), s"ordering: $s")
    // keep-filter retains exactly the docs above the cut
    val kept = NgramLm.keep(NgramLm.score(docs, lm), s(11L))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L))
  }

  test("LUT floor: singleton bigrams never enter the table; backoff absorbs them") {
    import spark.implicits._
    val ref = df(Seq((1L, "a b a b c"), (2L, "a b")))
    // counts: (a,b)=3, (b,a)=1, (b,c)=1 — the singletons must be gone
    val lm = NgramLm.lmTable(NgramLm.counts(ref), NgramLm.vocabSize(ref))
      .select("w1", "w2", "lp").as[(String, String, Double)].collect().toMap2
    assert(lm.contains(("a", "b")))
    assert(!lm.contains(("b", "a")) && !lm.contains(("b", "c")),
      s"floored bigrams leaked into the LUT: ${lm.keySet}")
    // backoff rows still cover BOTH heads, with c1 counting the pruned
    // mass (the smoothing denominator is prune-invariant): c1(b) = 2
    assert(lm(("b", "")) == math.log(1.0 / (2.0 + 4.0)))
    // scoring a floored bigram resolves through backoff, not OOV
    val s = NgramLm.score(df(Seq((9L, "b a"))), NgramLm.lmTable(
      NgramLm.counts(ref), NgramLm.vocabSize(ref)))
      .select("sum_lp").as[Double].collect()(0)
    def q(x: Double) = math.floor(x * NgramLm.Shift + 0.5).toLong
    assert(s == q(math.log(1.0 / 6.0)).toDouble / NgramLm.Shift)
  }

  test("partition invariance") {
    import spark.implicits._
    val ref = df((0 until 40).map(i => (i.toLong, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 7}")))
    val lm = NgramLm.lmTable(NgramLm.counts(ref), NgramLm.vocabSize(ref))
    val docs = df((0 until 100).map(i => (i.toLong, s"w${i % 7} w${(i * 3) % 7} w${i % 5}")))
    def run(d: DataFrame) = NgramLm.score(d, lm)
      .select("doc_id", "sum_lp").as[(Long, Double)].collect()
      .sortBy(_._1).toList
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("plan: scoring is broadcast-only — corpus text never shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: p.children.flatMap(exchanges)
      case _ => p.children.flatMap(exchanges)
    }
    import spark.implicits._
    val ref = df((0 until 40).map(i => (i.toLong, s"w${i % 5} w${(i + 1) % 5}")))
    val lm = NgramLm.lmTable(NgramLm.counts(ref), NgramLm.vocabSize(ref))
    val docs = df((0 until 100).map(i => (i.toLong, s"w${i % 7} w${(i * 3) % 7} w${i % 5}")))
    val q = NgramLm.score(docs, lm)
    q.count()
    val exs = exchanges(q.queryExecution.executedPlan)
    // the only exchange is the per-doc aggregation of (pos, lp) rows
    assert(exs.size <= 1, s"scoring must not shuffle the corpus:\n${q.queryExecution.executedPlan}")
    assert(!exs.exists(_.child.output.exists(_.name == "text")),
      s"raw text in an exchange:\n${q.queryExecution.executedPlan}")
  }
}
