package graft

import graft.operators.{Evaluate, Export, Relations}
import graft.plans.Pipeline
import graft.sources.{ChemDict, PageGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A4/A5 threshold sweep + S6 label-studio export semantics. */
class EvaluateExportSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val N = 150L

  private lazy val annotated = {
    val names = ChemDict.entries.flatMap(_.synonyms)
    Pipeline.annotate(Pipeline.sentences(PageGen.pages(spark, N)), names).cache()
  }
  private lazy val gold = PageGen.goldSentences(spark, N).cache()

  test("sweep emits one row per reference threshold (evaluate.py:71-85)") {
    import spark.implicits._
    val sweep = Evaluate.thresholdSweep(annotated, gold).cache()
    val ts = sweep.select("threshold").as[Double].collect().toSeq
    assert(ts == Evaluate.Thresholds.toSeq)
  }

  test("P/R behave correctly around the extraction threshold") {
    // gold = hand-authored binary associations (PageGen.template assocs),
    // NOT the scorer's own output — so precision at the working
    // threshold is honestly < 1 (the deterministic scorer accepts some
    // hand-gold negatives, e.g. the chem->duration pair of template 12
    // and the crossed chem->amount pairs of template 13), while recall
    // stays ~1 (every hand-gold association scores high).
    val byT = Evaluate.thresholdSweep(annotated, gold, goldPositiveThreshold = 0.5).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    // at threshold 0 every candidate is predicted: recall is max
    assert(byT(0.0)._2 >= 0.99, s"recall@0 = ${byT(0.0)._2}")
    val (p5, r5) = byT(0.5)
    assert(r5 >= 0.99, s"recall@0.5 = $r5")
    assert(p5 >= 0.85 && p5 < 1.0,
      s"precision@0.5 = $p5 — expected imperfect-but-high vs independent gold")
    // raising the threshold must not lower precision on this workload
    assert(byT(0.9)._1 >= p5, s"P@0.9=${byT(0.9)._1} < P@0.5=$p5")
    // far above every score nothing is predicted -> PRFScore zeros
    assert(byT(0.999) == ((0.0, 0.0)))
  }

  test("random baseline scores far below the model at the working threshold (evaluate.py:52-92)") {
    val sweep = Evaluate.thresholdSweepWithBaseline(annotated, gold).cache()
    def f1At(scorer: String, t: Double): Double =
      sweep.filter(col("scorer") === scorer && col("threshold") === t)
        .select("f1").collect()(0).getDouble(0)
    // the baseline emits one row per scorer per threshold
    assert(sweep.count() == 2L * Evaluate.Thresholds.length)
    // sanity floor: a real scorer must dominate random at 0.5
    assert(f1At("model", 0.5) > f1At("random", 0.5) + 0.2,
      s"model=${f1At("model", 0.5)} random=${f1At("random", 0.5)}")
    // random scores are uniform-ish: recall decays roughly linearly
    val rRec = sweep.filter(col("scorer") === "random")
      .select("threshold", "recall").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(rRec(0.0) >= 0.99)
    assert(rRec(0.5) > 0.3 && rRec(0.5) < 0.7, s"recall@0.5=${rRec(0.5)}")
    assert(rRec(0.99) < 0.05)
    sweep.unpersist()
  }

  test("score_relations micro-P/R/F semantics on handcrafted edges (rel_pipe.py:209-230)") {
    import spark.implicits._
    import graft.model.{RelEdge, Sentence}
    def sent(rels: Array[RelEdge]) = Sentence("u", 0L, 0, "s", "t", "d", "txt",
      Array.empty, Array.empty, rels)
    // pred: e1@0.3 (gold+), e2@0.7 (gold+), e3@0.6 (not gold)
    val pred = Seq(sent(Array(
      RelEdge(0, 5, "has_value", 0.3),
      RelEdge(1, 5, "has_value", 0.7),
      RelEdge(2, 5, "has_value", 0.6)))).toDS()
    // gold positives at boundary 0.5: e1 (0.5), e2 (0.9)
    val goldDs = Seq(sent(Array(
      RelEdge(0, 5, "has_value", 0.5),
      RelEdge(1, 5, "has_value", 0.9)))).toDS()
    val byT = Evaluate.thresholdSweep(pred, goldDs, goldPositiveThreshold = 0.5)
      .collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    assert(byT(0.0) == ((2L, 1L, 0L, 2.0 / 3.0, 1.0)), byT(0.0).toString)
    assert(byT(0.5) == ((1L, 1L, 1L, 0.5, 0.5)), byT(0.5).toString)
    assert(byT(0.7) == ((1L, 0L, 1L, 1.0, 0.5)), byT(0.7).toString)
    assert(byT(0.8) == ((0L, 0L, 2L, 0.0, 0.0)), byT(0.8).toString)
  }

  test("label-studio JSON shape matches corpus.py:224-258 incl. VALUE collapse") {
    import spark.implicits._
    val row = Export.labelStudioJson(annotated)
      .filter(col("json").contains("\"CHEM\"") && col("json").contains("\"VALUE\""))
      .select("json").as[String].head()
    // exact field names and nesting
    assert(row.contains("\"data\":{\"text\":"))
    assert(row.contains("\"predictions\":[{\"result\":[{"))
    assert(row.contains("\"from_name\":\"label\""))
    assert(row.contains("\"to_name\":\"text\""))
    assert(row.contains("\"type\":\"labels\""))
    assert(row.contains("\"value\":{\"start\":"))
    // quantity labels collapsed to VALUE: no raw unit-type labels leak
    Relations.PropertyToUnits.values.flatten.toSet.foreach { (u: String) =>
      assert(!row.contains(s""""labels":["$u"]"""), u)
    }
  }
}
