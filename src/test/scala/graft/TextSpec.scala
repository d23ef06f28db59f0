package graft

import graft.functions.Text
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("normalize reproduces pdf_parser.py:113-114 substitutions") {
    assert(Text.normalize("Tc ¼ 95") == "Tc= 95")
    assert(Text.normalize("292 À419") == "292-419")
    assert(Text.normalize("no quirks here") == "no quirks here")
  }

  test("tokenize: basic words with offsets") {
    val toks = Text.tokenize("The melting point of TNT")
    assert(toks.map(_.text).toSeq == Seq("The", "melting", "point", "of", "TNT"))
    assert(toks.map(_.start).toSeq == Seq(0, 4, 12, 18, 21))
  }

  test("tokenize: parens and trailing punctuation peel off") {
    val toks = Text.tokenize("energy (ΔG) of benzene.")
    assert(toks.map(_.text).toSeq == Seq("energy", "(", "ΔG", ")", "of", "benzene", "."))
  }

  test("tokenize: '=' splits, hyphens/slashes/° stay attached") {
    assert(Text.tokenize("Tc=97").map(_.text).toSeq == Seq("Tc", "=", "97"))
    assert(Text.tokenize("292-419°C").map(_.text).toSeq == Seq("292-419°C"))
    assert(Text.tokenize("kcal/mol").map(_.text).toSeq == Seq("kcal/mol"))
    assert(Text.tokenize("Ti3C2Tx-SO3H-5's stability").map(_.text).toSeq ==
      Seq("Ti3C2Tx-SO3H-5's", "stability"))
  }

  test("tokenize: abbreviation keeps trailing period") {
    assert(Text.tokenize("after approx. 30 min").map(_.text).toSeq ==
      Seq("after", "approx.", "30", "min"))
  }

  test("tokenize: negative number in parens") {
    assert(Text.tokenize("large (-836.7 kcal/mol)").map(_.text).toSeq ==
      Seq("large", "(", "-836.7", "kcal/mol", ")"))
  }

  test("splitSentences: plain boundaries") {
    val s = Text.splitSentences("First sentence here. Second one follows. Third.")
    assert(s.toSeq == Seq("First sentence here.", "Second one follows.", "Third."))
  }

  test("splitSentences: approx. does not split (pipeline.py:38-41)") {
    val s = Text.splitSentences("It melted after approx. 30 min. Then it cooled.")
    assert(s.toSeq == Seq("It melted after approx. 30 min.", "Then it cooled."))
  }

  test("splitSentences: decimal points do not split") {
    val s = Text.splitSentences("The density is 0.95 g/cm3. It is stable.")
    assert(s.toSeq == Seq("The density is 0.95 g/cm3.", "It is stable."))
  }

  test("lemma: inflections used by property patterns") {
    assert(Text.lemma("decomposes") == "decompose")
    assert(Text.lemma("melting") == "melt")
    assert(Text.lemma("Stability") == "stability")
    assert(Text.lemma("densities") == "density")
    assert(Text.lemma("unknownword") == "unknownword")
  }
}
