package graft

import graft.functions.Text
import graft.operators.Abbreviations
import graft.plans.Pipeline
import graft.sources.PageGen
import org.scalatest.funsuite.AnyFunSuite

/** M5/W4/P7: Schwartz-Hearst semantics golden cases (reference:
  * cprex/ner/abbreviations.py, vendored from scispacy; algorithm from
  * Schwartz & Hearst 2003).
  */
class AbbreviationsSpec extends AnyFunSuite {

  private def detect(s: String) = Abbreviations.detect(Text.tokenize(s))

  test("short form in parens: definition + long form span") {
    val abbrevs = detect(
      "Samples of high density polyethylene ( HDPE ) were prepared for analysis.")
    assert(abbrevs.length == 1)
    assert(abbrevs(0).shortText == "HDPE")
    assert(abbrevs(0).longText == "high density polyethylene")
  }

  test("global re-matching: later occurrences get the same long form") {
    val abbrevs = detect(
      "Samples of high density polyethylene ( HDPE ) were prepared; HDPE melted at 400 K.")
    assert(abbrevs.length == 2)
    assert(abbrevs.forall(_.longText == "high density polyethylene"))
    assert(abbrevs(0).shortStart < abbrevs(1).shortStart)
  }

  test("first short char must start a word (Schwartz-Hearst boundary rule)") {
    // ΔG: 'Δ' (lowercased δ) never begins a word in the long candidate
    val abbrevs = detect("The activation energy ( ΔG ) of benzene is 50 kJ/mol.")
    assert(abbrevs.isEmpty)
  }

  test("short_form_filter: word lengths in [2,10), >=50% alpha, alpha first") {
    assert(detect("The value of x ( y ) was not an abbreviation.").isEmpty) // len<2
    assert(detect("An acid sample ( 123 ) was kept.").isEmpty) // first char not alpha
    assert(detect("The trinitrotoluene sample ( 2,4,6-TNT99x ) was kept.").isEmpty) // len>=10
  }

  test("interior longer than 8 tokens produces no candidate") {
    val abbrevs = detect(
      "TNT ( a b c d e f g h i j ) was stable at 300 K.")
    assert(abbrevs.isEmpty)
  }

  test("long form in parens: short form is the word before") {
    // interior > 3 tokens => long-form-in-parens case (abbreviations.py:117-127)
    val abbrevs = detect(
      "The compound HDPE ( high density polyethylene thermoplastic polymer ) was tested.")
    assert(abbrevs.length == 1)
    assert(abbrevs(0).shortText == "HDPE")
    assert(abbrevs(0).longText.startsWith("high density polyethylene"))
  }

  test("unbalanced parens in long-form candidate are rejected") {
    val abbrevs = detect(
      "The compound HDPE ( high density ) polyethylene thermoplastic ) was tested.")
    // first interior "high density" (2 tokens) -> short-form case, fails
    // filter (long lookback over "The compound HDPE" can't match "high density");
    // wide interior contains an unbalanced ')' -> rejected
    assert(!abbrevs.exists(_.longText.contains(")")))
  }

  test("doc-initial paren span is skipped (start == 1)") {
    val abbrevs = detect("( HDPE ) high density polyethylene was tested.")
    assert(abbrevs.isEmpty)
  }

  test("pipeline stage emits abbreviation rows over the synthesized pages") {
    val spark = SparkSpec.spark
    val rows = Pipeline.abbreviations(
      Pipeline.sentences(PageGen.pages(spark, 400)))
      .select("url", "sent_id", "short_text", "long_text",
        "short_char_start", "short_char_end").collect()
    assert(rows.nonEmpty, "template 20 must produce abbreviation rows")
    // every definition binds HDPE to the dictionary long form
    assert(rows.forall(r =>
      r.getString(2) == "HDPE" && r.getString(3) == "high density polyethylene"))
    // char offsets address the surface form exactly (the oracle's check)
    assert(rows.forall(r => r.getInt(5) - r.getInt(4) == "HDPE".length))
    // the re-matched second occurrence appears for sentences of template 20
    val bySent = rows.groupBy(r => (r.getString(0), r.getInt(1)))
    assert(bySent.values.exists(_.size == 2))
  }
}
