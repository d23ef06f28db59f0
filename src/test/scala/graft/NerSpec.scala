package graft

import graft.functions.Text
import graft.operators.{ChemGazetteer, Ner, Relations, Triples}
import graft.model.Sentence
import graft.sources.ChemDict
import org.scalatest.funsuite.AnyFunSuite

/** W2 overlap-resolution and relation/tuple semantics on hand-built
  * sentences (no Spark session needed — all in-row logic).
  */
class NerSpec extends AnyFunSuite {

  private val gaz = new ChemGazetteer(ChemDict.entries.flatMap(_.synonyms))

  private def annotate(text: String) = Ner.annotate(text, Text.tokenize(text), gaz)

  test("chem gazetteer: multi-token, case-insensitive, longest match") {
    val ents = annotate("Sodium Chloride and heavy water were mixed")
    assert(ents.map(e => (e.label, e.text)).toSeq ==
      Seq(("CHEM", "Sodium Chloride"), ("CHEM", "heavy water")))
  }

  test("W2 trap: chem name shadows PROP word (first-writer-wins, chem_ner.py:91-101)") {
    val ents = annotate("The density of high density polyethylene is 0.95 g/cm3.")
    assert(ents.map(e => (e.label, e.text)).toSeq == Seq(
      ("PROP", "density"),
      ("CHEM", "high density polyethylene"),
      ("DENSITY", "0.95 g/cm3")))
    // the ruler's second "density" (inside the chem span) was suppressed
    assert(ents.count(_.label == "PROP") == 1)
  }

  test("stage priority: CHEM > quantity > ruler") {
    val ents = annotate("water boils at 100.0 °C")
    assert(ents.map(_.label).toSeq == Seq("CHEM", "TEMPERATURE"))
  }

  test("full sentence: ruler + chem + quantity coexist disjointly") {
    val ents = annotate("The melting point of TNT is 80.1 °C.")
    assert(ents.map(e => (e.label, e.text)).toSeq == Seq(
      ("PROP", "melting point"), ("CHEM", "TNT"), ("TEMPERATURE", "80.1 °C")))
  }

  test("can_link port (rel_model.py:117-147)") {
    val ents = annotate("The melting point of TNT is 80.1 °C.")
    val prop = ents(0); val chem = ents(1); val value = ents(2)
    assert(Relations.canLink(prop, value))
    assert(Relations.canLink(chem, value))
    assert(!Relations.canLink(value, prop)) // tail must be non-head type
    assert(!Relations.canLink(chem, prop)) // PROP cannot be a tail
    assert(!Relations.canLink(prop, prop))
  }

  test("unit-compat safety check blocks density->PRESSURE (rel_model.py:136-145)") {
    val ents = annotate("The density of TNT was reported previously at 95.0 kPa.")
    val prop = ents.find(_.label == "PROP").get
    val value = ents.find(_.label == "PRESSURE").get
    val chem = ents.find(_.label == "CHEM").get
    assert(!Relations.canLink(prop, value))
    assert(Relations.canLink(chem, value)) // CHEM heads are unconstrained
  }

  test("keepDoc truth table (corpus.py:33-70)") {
    // prop + compatible unit -> keep
    assert(Relations.keepDoc(annotate("The melting point of TNT is 80.1 °C.")))
    // prop + incompatible unit only -> drop
    assert(!Relations.keepDoc(annotate("The density of TNT is 95.0 kPa.")))
    // prop with empty unit list + any quantity -> keep (toxicity: [])
    assert(Relations.keepDoc(annotate("The toxicity of TNT is 45% in assays.")))
    // prop, no quantity -> drop
    assert(!Relations.keepDoc(annotate("The toxicity of TNT is unknown.")))
    // quantity, no prop -> drop
    assert(!Relations.keepDoc(annotate("TNT was heated to 80.1 °C quickly quickly.")))
  }

  test("distance cap at 100 tokens (rel_trf.cfg:62)") {
    val filler = "and filler words were used here again " * 15 // 105 tokens
    val ents = annotate(s"TNT was mixed $filler until stable up to 80.0 °C.")
    val chem = ents.find(_.label == "CHEM").get
    val value = ents.find(_.label == "TEMPERATURE").get
    val prop = ents.find(_.label == "PROP").get
    assert(!Relations.canLink(chem, value))
    assert(Relations.canLink(prop, value))
  }

  test("tuple assembly: multi-head value, chem-present filter (tuples.py:59-87, utils.py:90-95)") {
    val text = "The activation energy (ΔG) of benzene is 95.0 kJ/mol."
    val ents = annotate(text)
    val rels = Relations.relate(ents)
    val s = Sentence("u", 0L, 0, "Results", "t", "d", text, Text.tokenize(text), ents, rels)
    val triples = Triples.assemble(s)
    // three heads (PROP, FORMULA, CHEM) all attach to the one value
    assert(triples.length == 3)
    assert(triples.map(_.headLabel).sorted.toSeq == Seq("CHEM", "FORMULA", "PROP"))
    assert(triples.forall(_.value == 95.0))
    assert(triples.forall(_.unit == "kJ/mol"))

    // without a CHEM head the tuple is dropped (requireChem)
    val text2 = "The melting point is 80.1 °C."
    val ents2 = annotate(text2)
    val s2 = Sentence("u", 0L, 0, "R", "t", "d", text2, Text.tokenize(text2), ents2,
      Relations.relate(ents2))
    assert(Triples.assemble(s2).isEmpty)
    assert(Triples.assemble(s2, requireChem = false).nonEmpty)
  }
}
