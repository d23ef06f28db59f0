package graft

import graft.functions.Text
import graft.operators.PropertyRuler
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported verbatim from the reference's
  * tests/ner/test_properties.py:14-50 (the reference's only
  * per-operator golden suite), plus coverage for pattern families the
  * reference leaves untested.
  */
class PropertyRulerSpec extends AnyFunSuite {

  private def ents(text: String): Seq[(String, String, String)] = {
    val toks = Text.tokenize(text)
    PropertyRuler.findEntities(toks).toSeq.map { e =>
      (e.label, text.substring(e.startChar, e.endChar), e.entId)
    }
  }

  test("test_thermal (test_properties.py:14-19)") {
    assert(ents("the thermal decomposition of the sulfonic acid occurs around 292-419°C") ==
      Seq(("PROP", "thermal decomposition", "thermal")))
  }

  test("test_stability #1 (test_properties.py:22-27)") {
    assert(ents("predicted Ti3C2Tx-SO3H-5's stability until 300 °C") ==
      Seq(("PROP", "stability until", "temperature")))
  }

  test("test_stability #2 (test_properties.py:29-33)") {
    assert(ents("MXene is stable up to 180°C") ==
      Seq(("PROP", "stable up to", "temperature")))
  }

  test("test_energy #1 (test_properties.py:36-42)") {
    assert(ents("we calculate the activation energy (ΔG) of benzene") ==
      Seq(("PROP", "activation energy", "energy"), ("FORMULA", "ΔG", "energy")))
  }

  test("test_energy #2 (test_properties.py:44-50)") {
    assert(ents("The formation energy of this pentameric assembly is very large (-836.7 kcal/mol)") ==
      Seq(("PROP", "formation energy", "energy")))
  }

  // --- additional pattern-family coverage (untested in the reference) ---

  test("enthalpy: 'heat of' and optional prefixes (properties.py:86-130)") {
    assert(ents("the molar heat of combustion was high") ==
      Seq(("PROP", "molar heat of combustion", "enthalpy")))
    assert(ents("the net enthalpy of formation is") ==
      Seq(("PROP", "net enthalpy of formation", "enthalpy")))
  }

  test("enthalpy FORMULA with optional subscripts (properties.py:146-173)") {
    assert(ents("ΔH fus of TNT") == Seq(("FORMULA", "ΔH fus", "enthalpy")))
    assert(ents("measured ΔH of the sample") == Seq(("FORMULA", "ΔH", "enthalpy")))
  }

  test("point patterns (properties.py:240-321)") {
    assert(ents("the melting point of TNT") == Seq(("PROP", "melting point", "temperature")))
    assert(ents("it decomposes at high temperature") ==
      Seq(("PROP", "decomposes at", "temperature")))
    assert(ents("the boiling value was") == Seq(("PROP", "boiling value", "temperature")))
  }

  test("pressure + temperature patterns (properties.py:323-395)") {
    assert(ents("the vapor pressure of water") == Seq(("PROP", "vapor pressure", "pressure")))
    assert(ents("the critical temperature is") ==
      Seq(("PROP", "critical temperature", "temperature")))
    assert(ents("with Tc = 95 K") == Seq(("FORMULA", "Tc =", "temperature")))
  }

  test("density / formula ρ (properties.py:397-419)") {
    assert(ents("the density was measured") == Seq(("PROP", "density", "density")))
    assert(ents("solubility in water") == Seq(("PROP", "solubility", "density")))
    assert(ents("with ρ of 1.8") == Seq(("FORMULA", "ρ", "density")))
  }

  test("other patterns (properties.py:421-518)") {
    assert(ents("the heat capacity of") == Seq(("PROP", "heat capacity", "heat capacity")))
    assert(ents("detonation velocity of") == Seq(("PROP", "detonation velocity", "velocity")))
    assert(ents("impact sensitivity tests") == Seq(("PROP", "impact sensitivity", "sensibility")))
    assert(ents("it is sensitive to friction") ==
      Seq(("PROP", "sensitive to friction", "sensibility")))
    assert(ents("thermal conductivity of") == Seq(("PROP", "thermal conductivity", "thermal")))
    assert(ents("vacuum stability test") == Seq(("PROP", "vacuum stability", "vaccum")))
  }

  test("longest match wins: 'heat capacity' vs 'heat value' family") {
    // "heat capacity" (2 toks, OTHER) must win over any 1-tok overlap
    assert(ents("heat capacity") == Seq(("PROP", "heat capacity", "heat capacity")))
  }
}
