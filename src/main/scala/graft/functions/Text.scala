package graft.functions

import graft.model.Tok
import scala.collection.mutable.ArrayBuffer

/** Deterministic text primitives: char normalization, sentence split,
  * tokenizer, lemma lookup. All pure functions — safe inside Spark
  * closures and codegen-adjacent hot paths; no regex on the hot
  * tokenize path.
  *
  * Reference semantics reproduced:
  *  - char normalization: cprex/parser/pdf_parser.py:113-114
  *    (`parse_text`: " À" -> "-", " ¼" -> "=")
  *  - "approx." no-split special case: cprex/pipeline.py:38-41
  *  - lemma-based matching for the ~60 lemmas used by the property
  *    ruler patterns (cprex/ner/properties.py) — spaCy's full
  *    lemmatizer is replaced by an explicit inflection table covering
  *    exactly the vocabulary the patterns can consume.
  */
object Text {

  /** F1/P2: the reference's GROBID-quirk char substitutions, applied to
    * every extracted text fragment. Part of the byte-identical invariant.
    */
  def normalize(s: String): String =
    s.replace(" À", "-").replace(" ¼", "=")

  /** Abbreviations a sentence boundary must not follow (reference adds
    * "approx." as a tokenizer special case; "dec." appears in the
    * property patterns, properties.py:256).
    */
  val NoSplitAbbrev: Set[String] =
    Set("approx.", "dec.", "e.g.", "i.e.", "et al.", "fig.", "ref.", "ca.")

  /** Split a paragraph into sentences. Boundary = [.!?] followed by
    * whitespace, unless the preceding word is a known abbreviation or
    * the '.' is an interior decimal point (no whitespace after digits'
    * '.'). Deterministic; the fixture generator emits text that this
    * splitter recovers exactly (gold boundaries are asserted in tests).
    */
  def splitSentences(paragraph: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val n = paragraph.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = paragraph.charAt(i)
      if ((c == '.' || c == '!' || c == '?') && i + 1 < n && paragraph.charAt(i + 1) == ' ') {
        // find the word ending at i (inclusive of the punct)
        var w = i
        while (w > start && !paragraph.charAt(w - 1).isWhitespace) w -= 1
        val word = paragraph.substring(w, i + 1).toLowerCase
        val prevTwo = if (w >= 3) paragraph.substring(w - 3, i + 1).toLowerCase else ""
        val isAbbrev = NoSplitAbbrev.contains(word) ||
          NoSplitAbbrev.exists(a => a.contains(' ') && prevTwo.endsWith(a))
        if (!isAbbrev) {
          out += paragraph.substring(start, i + 1)
          i += 1
          while (i < n && paragraph.charAt(i) == ' ') i += 1
          start = i
        } else i += 1
      } else i += 1
    }
    if (start < n) out += paragraph.substring(start)
    out.filter(_.nonEmpty).toArray
  }

  private def isOpenPunct(c: Char): Boolean =
    c == '(' || c == '[' || c == '{' || c == '"' || c == '“'
  private def isClosePunct(c: Char): Boolean =
    c == ')' || c == ']' || c == '}' || c == ',' || c == ';' || c == ':' ||
      c == '!' || c == '?' || c == '"' || c == '”' || c == '.'

  /** Tokenize a sentence, keeping char offsets. Rules (our spec,
    * documented for the fixture generator):
    *  1. split on whitespace;
    *  2. peel leading open-punct chars as single-char tokens;
    *  3. peel trailing close-punct chars as single-char tokens — but a
    *     trailing '.' stays attached when the token is a known
    *     abbreviation ("approx.", "dec.");
    *  4. '=' is always its own token (so "Tc=97" -> "Tc","=","97",
    *     matching the reference's {"TEXT":"Tc"},{"TEXT":"="} patterns);
    *  5. interior hyphens/slashes/° stay attached ("292-419°C",
    *     "kcal/mol", "Ti3C2Tx-SO3H-5's" are single tokens).
    */
  def tokenize(sentence: String): Array[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    val n = sentence.length
    var i = 0
    while (i < n) {
      while (i < n && sentence.charAt(i).isWhitespace) i += 1
      if (i < n) {
        var j = i
        while (j < n && !sentence.charAt(j).isWhitespace) j += 1
        emitWord(sentence, i, j, out)
        i = j
      }
    }
    out.toArray
  }

  private def emitWord(s: String, start0: Int, end0: Int, out: ArrayBuffer[Tok]): Unit = {
    var start = start0
    var end = end0
    // leading open punct
    while (start < end && isOpenPunct(s.charAt(start))) {
      out += Tok(s.substring(start, start + 1), start)
      start += 1
    }
    // trailing close punct (collect, emit after core token)
    val trail = ArrayBuffer.empty[Tok]
    var done = false
    while (!done && end > start && isClosePunct(s.charAt(end - 1))) {
      if (s.charAt(end - 1) == '.' &&
        NoSplitAbbrev.contains(s.substring(start, end).toLowerCase)) done = true
      else {
        trail.prepend(Tok(s.substring(end - 1, end), end - 1))
        end -= 1
      }
    }
    // split '=' into its own token(s)
    var i = start
    var segStart = start
    while (i < end) {
      if (s.charAt(i) == '=') {
        if (i > segStart) out += Tok(s.substring(segStart, i), segStart)
        out += Tok("=", i)
        segStart = i + 1
      }
      i += 1
    }
    if (end > segStart) out += Tok(s.substring(segStart, end), segStart)
    out ++= trail
  }

  /** Inflection -> lemma table covering every LEMMA attribute value the
    * property patterns reference (cprex/ner/properties.py). Identity for
    * anything not in the table. Lowercased input expected.
    */
  private val LemmaTable: Map[String, String] = Map(
    "melting" -> "melt", "melts" -> "melt", "melted" -> "melt",
    "boils" -> "boil", "boiled" -> "boil",
    "freezes" -> "freeze", "froze" -> "freeze", "frozen" -> "freeze",
    "decomposes" -> "decompose", "decomposed" -> "decompose",
    "decomposing" -> "decompose",
    "explodes" -> "explode", "exploded" -> "explode",
    "exploding" -> "explode",
    "heats" -> "heat", "heated" -> "heat", "heating" -> "heat",
    "points" -> "point", "values" -> "value",
    "pressures" -> "pressure", "temperatures" -> "temperature",
    "densities" -> "density", "solubilities" -> "solubility",
    "toxicities" -> "toxicity", "viscosities" -> "viscosity",
    "conductivities" -> "conductivity", "diffusivities" -> "diffusivity",
    "capacities" -> "capacity", "velocities" -> "velocity",
    "weights" -> "weight",
    "sensitivities" -> "sensitivity", "sensibilities" -> "sensibility",
    "stabilities" -> "stability", "enthalpies" -> "enthalpy",
    "energies" -> "energy", "discharges" -> "discharge",
    "bonds" -> "bond", "formulas" -> "formula", "formulae" -> "formula"
  )

  def lemma(token: String): String = {
    val lower = token.toLowerCase
    LemmaTable.getOrElse(lower, lower)
  }

  /** Lemma lookup when the caller already lowercased (hot-path variant:
    * the NER stage memoizes one toLowerCase per token per sentence).
    */
  def lemmaOfLower(lower: String): String = LemmaTable.getOrElse(lower, lower)
}
