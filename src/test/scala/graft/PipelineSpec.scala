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

  test("abstract is a distinct field: isAbstract rows == abstractParas sentences") {
    import spark.implicits._
    val sents = Pipeline.sentences(PageGen.pages(spark, N))
      .map(s => (s.url, s.section, s.isAbstract)).collect()
    // every abstract row is flagged, and only those (the flag does not
    // ride on a section heading — Html.extract keeps abstractParas
    // apart from sections, pdf_parser.py:128-141 analog)
    assert(sents.exists(_._3))
    sents.foreach { case (url, section, isAbs) =>
      assert(isAbs == (section == "Abstract"), s"$url/$section flagged $isAbs")
    }
    // the extractor itself keeps the fields apart
    val doc = Html.extract(PageGen.genPage(3L).page.html)
    assert(doc.abstractParas.nonEmpty)
    assert(!doc.sections.exists(_.heading == "Abstract"))
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

  test("gate sensitivity: a perturbed scorer FAILS the P/R gate") {
    // The gold is hand-authored per template (PageGen.template assocs),
    // so a scorer regression must surface as a gate failure. Simulate
    // one: drop the distance-decay + same-label-competition features
    // (score := 1.0 for every candidate pair). The competing-value
    // template then wrongly attaches far-away instrument readings.
    import spark.implicits._
    import graft.model.RelEdge
    import graft.operators.{Relations, Triples}
    val names = ChemDict.entries.flatMap(_.synonyms)
    val perturbed = Pipeline.annotate(Pipeline.sentences(PageGen.pages(spark, N)), names)
      .map { s =>
        val rels = for {
          h <- s.ents; t <- s.ents
          if h != t && Relations.canLink(h, t)
        } yield RelEdge(h.startTok, t.startTok, "has_value", 1.0)
        s.copy(rels = rels)
      }
      .filter(s => Relations.keepDoc(s.ents))
      .flatMap(s => Triples.assemble(s))
      .collect().map(tripleKey).toSet
    val gold = PageGen.goldTriples(spark, N).collect().map(tripleKey).toSet
    val tp = (perturbed & gold).size.toDouble
    val precision = tp / perturbed.size
    info(f"perturbed precision=$precision%.4f (gate bar 0.95)")
    assert(precision < 0.95,
      "a degenerate scorer must not pass the gate — gold would be circular")
  }

  test("literal spot-check: template-0 instance emits exactly its two hand gold triples") {
    // fully literal expectation for one concrete page (style:
    // reference tests/ner/test_properties.py) — pins sentence text,
    // spans, labels, normalized value and unit with no shared code path
    val gp = PageGen.genPage(58L) // deterministic: first sentence is template 0 about water
    val s0 = gp.sentences(0)
    val t0 = gp.triples.filter(_.sentId == 0)
    assert(s0.text == "The melting point of water is 103.7 \u00b0C.", s0.text)
    val m = """The melting point of (.+) is (\d+\.\d) °C\.""".r
    s0.text match {
      case m(chemSurface, valueSurface) =>
        assert(t0.length == 2)
        val byLabel = t0.map(t => t.headLabel -> t).toMap
        assert(byLabel("PROP").headText == "melting point")
        assert(byLabel("PROP").propType == "temperature")
        assert(byLabel("CHEM").headText == chemSurface)
        t0.foreach { t =>
          assert(t.valueLabel == "TEMPERATURE")
          assert(t.valueText == s"$valueSurface °C")
          assert(t.value == valueSurface.toDouble + 273.15)
          assert(t.unit == "K")
        }
      case other => fail(s"template-0 sentence did not match: $other")
    }
  }

  test("partition-count invariance (W2 determinism, SURVEY §7 risk 2)") {
    val t1 = Pipeline.run(PageGen.pages(spark, 40, partitions = 1))
      .collect().map(tripleKey).toSet
    val t8 = Pipeline.run(PageGen.pages(spark, 40, partitions = 8))
      .collect().map(tripleKey).toSet
    assert(t1 == t8)
  }
}
