package graft

import graft.functions.Text
import graft.operators.QuantityParser
import org.scalatest.funsuite.AnyFunSuite

class QuantityParserSpec extends AnyFunSuite {

  private def find(text: String) =
    QuantityParser.findEntities(text, Text.tokenize(text)).toSeq

  test("non-ASCII digits do not crash the scanner (web-text robustness)") {
    // '５' (fullwidth five) and '٣' (Arabic-Indic three) pass
    // Character.isDigit but not String.toDouble — they must be treated
    // as non-digits (old \d ASCII semantics), never parsed. And since
    // round 4's mid-token boundary guard, the ASCII digits GLUED to
    // them ("５0", "٣5") spawn no measurement either — a number cannot
    // start immediately after a letter/digit char (the reference
    // matches whole tokens; "kg/m3 K" must not yield "3 K")
    val ents = find("temperature of ５0 K or ٣5 K, measured at 40 K exactly")
    assert(ents.map(_.text) == Seq("40 K"))
    assert(ents.forall(_.label == "TEMPERATURE"))
  }

  test("mid-token glue: number punctuation is transparent to the boundary guard") {
    // "v1.5" is ONE whitespace token upstream — the reference's
    // whole-token matching emits nothing from it, so neither may the
    // scanner spawn "5 kg" from behind the '.' (walking the glue lands
    // on the digit '1': still mid-token). Same for "x-40".
    assert(find("sample v1.5 kg of material at 40 K").map(_.text) == Seq("40 K"))
    assert(find("specimen x-40 K variant at 20 K").map(_.text) == Seq("20 K"))
    // while a space-preceded negative number stays a valid start
    // (the glue walk ends at the space)
    assert(find("cooled to -40 K overnight").map(_.text).exists(_.contains("40 K")))
  }

  test("simple value with glued unit") {
    val Seq(e) = find("MXene is stable up to 180°C")
    assert(e.label == "TEMPERATURE")
    assert(e.text == "180°C")
    assert(e.value == 180.0 + 273.15)
    assert(e.unit == "K")
  }

  test("value with spaced unit and trailing period") {
    val Seq(e) = find("The melting point is 300.5 °C.")
    assert(e.label == "TEMPERATURE" && e.value == 300.5 + 273.15)
  }

  test("interval takes quantityMost (quantities.py:72-73)") {
    val Seq(e) = find("decomposition occurs around 292-419°C today")
    assert(e.label == "TEMPERATURE")
    assert(e.text == "292-419°C")
    assert(e.value == 419.0 + 273.15)
  }

  test("'to' interval") {
    val Seq(e) = find("pressures of 100 to 200 kPa were applied")
    assert(e.label == "PRESSURE" && e.value == 200.0)
  }

  test("list takes first quantity (quantities.py:76-77)") {
    val Seq(e) = find("densities of 1.2, 1.4 and 1.6 g/cm3 were found")
    assert(e.label == "DENSITY")
    assert(e.value == 1.2)
  }

  test("percent and volume special cases (quantities.py:86-88)") {
    val Seq(p) = find("a yield of 45%")
    assert(p.label == "PERCENT" && p.value == 45.0)
    val Seq(v) = find("with 30 mL of solvent")
    assert(v.label == "VOLUME" && v.value == 30.0)
  }

  test("negative energy value with conversion") {
    val Seq(e) = find("very large (-836.7 kcal/mol)")
    assert(e.label == "ENERGY")
    assert(e.value == -836.7 * 4.184)
    assert(e.unit == "kJ/mol")
  }

  test("unit guard: hPa is pressure, not hours") {
    val Seq(e) = find("at 5 hPa overnight")
    assert(e.label == "PRESSURE")
    assert(math.abs(e.value - 0.5) < 1e-12)
  }

  test("no unit, no entity (grobid None-label skip, quantities.py:161-162)") {
    assert(find("we repeated the test 5 times").isEmpty)
  }

  test("token alignment matches quantities.py:119-137 semantics") {
    val text = "stable up to 180°C always"
    val toks = Text.tokenize(text)
    val Seq(e) = find(text)
    // "180°C" is token 3; end token = first token with start >= endChar
    assert(e.startTok == 3 && e.endTok == 4)
    assert(toks(e.startTok).text == "180°C")
  }

  test("multiple measurements in one sentence") {
    val es = find("heated at 100.0 °C for 30.0 min under 2.0 bar")
    assert(es.map(_.label) == Seq("TEMPERATURE", "TIME", "PRESSURE"))
    assert(es(1).value == 30.0 * 60.0)
    assert(es(2).value == 200.0)
  }
}
