package graft

import graft.operators.{Corpus, Dsir, NgramLm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: weight arithmetic goldens, the
  * accept-probability rule, deterministic draw replay, selection
  * behavior on separable corpora, partition invariance, and the
  * single-shuffle no-text-exchange plan.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def lm(d: DataFrame) =
    NgramLm.lmTable(NgramLm.counts(d), NgramLm.vocabSize(d))

  private val target = df((0 until 8).map(i => (i.toLong, "the cat sat on the mat")))
  private val raw = df((0 until 8).map(i => (100L + i, "xx yy zz xx yy")))

  test("weights: lw arithmetic and the accept rule") {
    import spark.implicits._
    val w = Dsir.weights(
      df(Seq((1L, "the cat sat"), (2L, "xx yy zz"), (3L, "a"))),
      lm(target), lm(raw))
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // target-like doc: lw > 0 -> accept_p == 1.0 exactly
    val (_, n1, st1, sr1, lw1, p1) = w(1L)
    assert(n1 == 2L && lw1 == st1 / 2 - sr1 / 2 && lw1 > 0 && p1 == 1.0)
    // raw-like doc: lw < 0 -> accept_p = exp(lw) in (0, 1)
    val (_, _, st2, sr2, lw2, p2) = w(2L)
    // StrictMath, not Math: the engine pins accept_p to the fdlibm
    // exp so it cannot wobble across JIT tiers
    assert(lw2 < 0 && p2 == StrictMath.exp(lw2) && p2 > 0 && p2 < 1)
    assert(lw2 == st2 / 2 - sr2 / 2)
    // single-token doc: no bigrams -> absent
    assert(!w.contains(3L))
  }

  test("sample: the draw is exactly the md5 threshold rule") {
    import spark.implicits._
    val docs = df((0 until 60).map(i =>
      (i.toLong, if (i % 2 == 0) "the cat sat on the mat" else "xx yy zz xx")))
    val w = Dsir.weights(docs, lm(target), lm(raw))
    val kept = Dsir.sample(w).select("doc_id").as[Long].collect().toSet
    val expected = w.select(col("doc_id"), col("accept_p"),
        Corpus.hash32(concat_ws(":", col("doc_id").cast("string"), lit("dsir")))
          .cast("double").as("u"))
      .as[(Long, Double, Double)].collect()
      .filter { case (_, p, u) => u < p * 4294967296.0 }
      .map(_._1).toSet
    assert(kept == expected)
    // every target-like doc survives (accept_p == 1); raw-like docs thin out
    val targetLike = (0 until 60 by 2).map(_.toLong).toSet
    assert(targetLike.subsetOf(kept))
    assert((kept -- targetLike).size < 30)
  }

  test("partition invariance") {
    import spark.implicits._
    val docs = df((0 until 80).map(i =>
      (i.toLong, s"the cat w${i % 9} on xx w${i % 4}")))
    def run(x: DataFrame) = Dsir.sample(Dsir.weights(x, lm(target), lm(raw)))
      .select("doc_id").as[Long].collect().sorted.toList
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("plan: one shuffle, no text/token column in any exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: p.children.flatMap(exchanges)
      case _ => p.children.flatMap(exchanges)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tSlice = docs.filter(col("doc_id") % 10 === 3)
    val rSlice = docs.filter(col("doc_id") % 10 === 7)
    val q = Dsir.weights(docs, lm(tSlice), lm(rSlice))
    q.collect()
    val ex = exchanges(q.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    ex.foreach { e =>
      e.output.foreach { attr =>
        assert(attr.name != "text" && attr.name != "w1" && attr.name != "w2",
          s"exchange carries corpus column ${attr.name}")
      }
    }
  }
}
