package graft

import graft.functions.Html
import graft.model.Triple
import graft.plans.Pipeline
import graft.sources.{ChemDict, PageGen}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end fixture suite (SURVEY.md §5.2-5.4): byte-identical text
  * invariant, entity-level equality vs gold, triple micro-P/R >= 0.95
  * (the BASELINE.json acceptance gate, metric semantics per
  * cprex/rel/rel_pipe.py:209-230), and partition-count invariance.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val N = 120L

  // doubles keyed by bit pattern: Scala tuple equality is numeric, so
  // NaN (the "no value" marker) would never compare equal otherwise
  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  private def tripleKey(t: Triple) =
    (t.url, t.sentId, t.headLabel, t.headText, t.propType, t.valueText,
      bits(t.value), t.unit, t.valueLabel)

  test("byte-identical extracted text per url (north-rule invariant)") {
    import spark.implicits._
    val bad = PageGen.pages(spark, N)
      .map(p => (p.url, Html.extractText(p.html) == p.text))
      .filter(!_._2).count()
    assert(bad == 0)
  }

  test("sentence segmentation recovers gold boundaries and sections") {
    import spark.implicits._
    val engine = Pipeline.sentences(PageGen.pages(spark, N))
      .map(s => (s.url, s.sentId, s.section, s.text)).collect().toSet
    val gold = PageGen.goldSentences(spark, N)
      .map(s => (s.url, s.sentId, s.section, s.text)).collect().toSet
    assert(engine == gold)
  }

  test("NER reproduces gold entities exactly") {
    import spark.implicits._
    val names = ChemDict.entries.flatMap(_.synonyms)
    val engine = Pipeline.annotate(Pipeline.sentences(PageGen.pages(spark, N)), names)
      .flatMap(s => s.ents.map(e =>
        (s.url, s.sentId, e.startChar, e.endChar, e.label, e.entId, e.value, e.unit)))
      .collect().map(t => t.copy(_7 = bits(t._7))).toSet
    val gold = PageGen.goldSentences(spark, N)
      .flatMap(s => s.ents.map(e =>
        (s.url, s.sentId, e.startChar, e.endChar, e.label, e.entId, e.value, e.unit)))
      .collect().map(t => t.copy(_7 = bits(t._7))).toSet
    val missing = gold -- engine
    val spurious = engine -- gold
    assert(missing.isEmpty, s"missing ${missing.size}: ${missing.take(5)}")
    assert(spurious.isEmpty, s"spurious ${spurious.size}: ${spurious.take(5)}")
  }

  test("triple micro P/R >= 0.95 vs gold fixtures (BASELINE gate)") {
    val engine = Pipeline.run(PageGen.pages(spark, N)).collect().map(tripleKey).toSet
    val gold = PageGen.goldTriples(spark, N).collect().map(tripleKey).toSet
    assert(gold.nonEmpty, "fixture generated no gold triples")
    val tp = (engine & gold).size.toDouble
    val precision = if (engine.isEmpty) 0.0 else tp / engine.size
    val recall = tp / gold.size
    info(f"triples: engine=${engine.size} gold=${gold.size} P=$precision%.4f R=$recall%.4f")
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("partition-count invariance (W2 determinism, SURVEY §7 risk 2)") {
    val t1 = Pipeline.run(PageGen.pages(spark, 40, partitions = 1))
      .collect().map(tripleKey).toSet
    val t8 = Pipeline.run(PageGen.pages(spark, 40, partitions = 8))
      .collect().map(tripleKey).toSet
    assert(t1 == t8)
  }
}
