package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic mixture sampling: exact copy counts for integral
  * weights, rate convergence for fractional ones, partition
  * invariance, missing-source drop, explode semantics, and the
  * broadcast-only plan.
  */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 4}", s"doc $i"))
      .toDF("doc_id", "source", "text")
  }

  test("integral weights are exact; missing sources drop; w=0 drops") {
    import spark.implicits._
    val w = Map("s0" -> 2.0, "s1" -> 1.0, "s2" -> 0.0)
    // s3 absent from the recipe -> weight 0
    val got = Sampling.mixtureCopies(corpus(400), w)
      .groupBy("source").agg(sum("n_copies").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("s0") == 200L && got("s1") == 100L &&
      got("s2") == 0L && got("s3") == 0L)
  }

  test("fractional weights converge to the target rate") {
    import spark.implicits._
    val w = Map("s0" -> 0.5, "s1" -> 0.125, "s2" -> 2.5, "s3" -> 1.0)
    val n = 8000 // 2000 docs per source
    val got = Sampling.mixtureCopies(corpus(n), w)
      .groupBy("source").agg(sum("n_copies").as("n"))
      .as[(String, Long)].collect().toMap
    def rate(s: String) = got(s).toDouble / 2000.0
    assert(math.abs(rate("s0") - 0.5) < 0.05, s"s0 rate ${rate("s0")}")
    assert(math.abs(rate("s1") - 0.125) < 0.05, s"s1 rate ${rate("s1")}")
    assert(math.abs(rate("s2") - 2.5) < 0.05, s"s2 rate ${rate("s2")}")
    assert(got("s3") == 2000L)
  }

  test("partition-invariant and rerun-stable: same keys kept regardless of layout") {
    import spark.implicits._
    val w = Map("s0" -> 0.5, "s1" -> 0.5, "s2" -> 0.5, "s3" -> 0.5)
    val base = corpus(1000)
    def kept(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureCopies(df, w).where(col("n_copies") > 0)
        .select("doc_id").as[Long].collect().toSet
    val a = kept(base)
    assert(a == kept(base.repartition(17)) && a == kept(base.coalesce(1)))
    // salting decorrelates: a different salt keeps a different set
    val b = Sampling.mixtureCopies(base, w, salt = "other")
      .where(col("n_copies") > 0).select("doc_id").as[Long].collect().toSet
    assert(a != b)
  }

  test("sampleMixture explodes to exactly n_copies rows with copy_idx") {
    import spark.implicits._
    val w = Map("s0" -> 3.0, "s1" -> 1.0, "s2" -> 0.0, "s3" -> 0.5)
    val copies = Sampling.mixtureCopies(corpus(100), w)
    val expanded = Sampling.sampleMixture(corpus(100), w)
    val wantRows = copies.agg(sum("n_copies")).as[Long].collect()(0)
    assert(expanded.count() == wantRows)
    // every surviving doc appears exactly n_copies times, indexed 1..n
    val perDoc = expanded.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"), min("copy_idx").as("mn"))
    assert(perDoc.where(col("n") =!= col("mx") || col("mn") =!= 1).count() == 0)
    // no recipe columns leak into the realized corpus
    assert(expanded.columns.toSet == Set("doc_id", "source", "text", "copy_idx"))
  }

  test("sampleByRate: bounds checked, rate respected, deterministic") {
    import spark.implicits._
    assertThrows[IllegalArgumentException](Sampling.sampleByRate(corpus(10), 1.5))
    val k = Sampling.sampleByRate(corpus(4000), 0.25).count()
    assert(math.abs(k / 4000.0 - 0.25) < 0.04, s"rate ${k / 4000.0}")
    assert(Sampling.sampleByRate(corpus(4000), 0.0).count() == 0)
    assert(Sampling.sampleByRate(corpus(4000), 1.0).count() == 4000)
  }

  test("plan: weights broadcast, corpus side never shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: p.children.flatMap(exchanges)
      case _ => p.children.flatMap(exchanges)
    }
    val w = Map("s0" -> 0.5, "s1" -> 1.5, "s2" -> 1.0, "s3" -> 0.25)
    val q = Sampling.sampleMixture(corpus(500), w)
    q.count()
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"weights join must broadcast:\n$plan")
    // AQE-walked: the corpus scan must feed the join directly
    assert(exchanges(plan).isEmpty, s"corpus side must not shuffle:\n$plan")
  }
}
