package graft.operators

import graft.model.{Ent, Tok}
import scala.collection.mutable.ArrayBuffer

/** M2: quantity/measurement extraction — replaces the reference's HTTP
  * round-trip to grobid-quantities (cprex/ner/quantities.py:140-185)
  * with a deterministic number+unit parser producing the same entity
  * shape: a char span labeled with the UPPERCASED unit type
  * (quantities.py:79-93, incl. the "%"→PERCENT and "mL"→VOLUME special
  * cases), plus our north-rule extension: a parsed numeric value and a
  * normalized unit at emission time.
  *
  * Measurement forms mirror grobid-quantities' measurement types
  * (quantities.py:70-77 dispatch):
  *  - value:    "300 °C", "-836.7 kcal/mol", "45%"
  *  - interval: "292-419°C", "100 to 200 kPa"  → value = quantityMost
  *    (the upper bound), per quantities.py:72-73
  *  - list:     "1.2, 1.4 and 1.6 g/cm3"       → value = first quantity,
  *    per quantities.py:76-77
  *
  * All work is per-sentence in-row string scanning: no shuffle, no UDF
  * boundary beyond the enclosing Dataset.map.
  */
object QuantityParser {

  /** unit surface form -> (type label, factor, offset, canonical unit).
    * normalized = raw * factor + offset. Canonical units: K, kPa, kJ/mol,
    * g/cm3, g/L, m/s, mPa·s, W/(m·K), J/(g·K), cm3/mol, L/(mol·cm),
    * kJ/kg, s, mL, %, g.
    */
  val Units: Seq[(String, (String, Double, Double, String))] = Seq(
    // TEMPERATURE (°C special case incl. "• C" quirk, quantities.py:89-90)
    "°C" -> (("TEMPERATURE", 1.0, 273.15, "K")),
    "° C" -> (("TEMPERATURE", 1.0, 273.15, "K")),
    "• C" -> (("TEMPERATURE", 1.0, 273.15, "K")),
    "°F" -> (("TEMPERATURE", 5.0 / 9.0, 273.15 - 32.0 * 5.0 / 9.0, "K")),
    "K" -> (("TEMPERATURE", 1.0, 0.0, "K")),
    // DENSITY
    "g/cm3" -> (("DENSITY", 1.0, 0.0, "g/cm3")),
    "g/cm³" -> (("DENSITY", 1.0, 0.0, "g/cm3")),
    "g/cc" -> (("DENSITY", 1.0, 0.0, "g/cm3")),
    "g/mL" -> (("DENSITY", 1.0, 0.0, "g/cm3")),
    "kg/m3" -> (("DENSITY", 0.001, 0.0, "g/cm3")),
    // SOLUBILITY
    "g/L" -> (("SOLUBILITY", 1.0, 0.0, "g/L")),
    "mg/mL" -> (("SOLUBILITY", 1.0, 0.0, "g/L")),
    "mg/L" -> (("SOLUBILITY", 0.001, 0.0, "g/L")),
    // ENERGY
    "kJ/mol" -> (("ENERGY", 1.0, 0.0, "kJ/mol")),
    "kcal/mol" -> (("ENERGY", 4.184, 0.0, "kJ/mol")),
    "J/mol" -> (("ENERGY", 0.001, 0.0, "kJ/mol")),
    "eV" -> (("ENERGY", 96.485, 0.0, "kJ/mol")),
    // ENTHALPY (per-mass heats)
    "kJ/kg" -> (("ENTHALPY", 1.0, 0.0, "kJ/kg")),
    "J/g" -> (("ENTHALPY", 1.0, 0.0, "kJ/kg")),
    "cal/g" -> (("ENTHALPY", 4.184, 0.0, "kJ/kg")),
    // HEAT CAPACITY
    "J/(g·K)" -> (("HEAT CAPACITY", 1.0, 0.0, "J/(g·K)")),
    "J/g/K" -> (("HEAT CAPACITY", 1.0, 0.0, "J/(g·K)")),
    "J/(mol·K)" -> (("HEAT CAPACITY", 1.0, 0.0, "J/(mol·K)")),
    // PRESSURE
    "kPa" -> (("PRESSURE", 1.0, 0.0, "kPa")),
    "hPa" -> (("PRESSURE", 0.1, 0.0, "kPa")),
    "MPa" -> (("PRESSURE", 1000.0, 0.0, "kPa")),
    "GPa" -> (("PRESSURE", 1e6, 0.0, "kPa")),
    "Pa" -> (("PRESSURE", 0.001, 0.0, "kPa")),
    "bar" -> (("PRESSURE", 100.0, 0.0, "kPa")),
    "atm" -> (("PRESSURE", 101.325, 0.0, "kPa")),
    "mmHg" -> (("PRESSURE", 0.133322, 0.0, "kPa")),
    "Torr" -> (("PRESSURE", 0.133322, 0.0, "kPa")),
    // DYNAMIC VISCOSITY
    "mPa·s" -> (("DYNAMIC VISCOSITY", 1.0, 0.0, "mPa·s")),
    "mPa s" -> (("DYNAMIC VISCOSITY", 1.0, 0.0, "mPa·s")),
    "cP" -> (("DYNAMIC VISCOSITY", 1.0, 0.0, "mPa·s")),
    "Pa·s" -> (("DYNAMIC VISCOSITY", 1000.0, 0.0, "mPa·s")),
    // THERMAL CONDUCTIVITY
    "W/(m·K)" -> (("THERMAL CONDUCTIVITY", 1.0, 0.0, "W/(m·K)")),
    "W/m/K" -> (("THERMAL CONDUCTIVITY", 1.0, 0.0, "W/(m·K)")),
    // VELOCITY
    "m/s" -> (("VELOCITY", 1.0, 0.0, "m/s")),
    "km/s" -> (("VELOCITY", 1000.0, 0.0, "m/s")),
    "m s-1" -> (("VELOCITY", 1.0, 0.0, "m/s")),
    // MOLAR VOLUME
    "cm3/mol" -> (("MOLAR VOLUME", 1.0, 0.0, "cm3/mol")),
    "L/mol" -> (("MOLAR VOLUME", 1000.0, 0.0, "cm3/mol")),
    // ABSORPTIVITY
    "L/(mol·cm)" -> (("ABSORPTIVITY", 1.0, 0.0, "L/(mol·cm)")),
    "M-1 cm-1" -> (("ABSORPTIVITY", 1.0, 0.0, "L/(mol·cm)")),
    // TIME
    "ms" -> (("TIME", 0.001, 0.0, "s")),
    "min" -> (("TIME", 60.0, 0.0, "s")),
    "h" -> (("TIME", 3600.0, 0.0, "s")),
    "days" -> (("TIME", 86400.0, 0.0, "s")),
    "s" -> (("TIME", 1.0, 0.0, "s")),
    // PERCENT / VOLUME special cases (quantities.py:86-88)
    "%" -> (("PERCENT", 1.0, 0.0, "%")),
    "mL" -> (("VOLUME", 1.0, 0.0, "mL")),
    "µL" -> (("VOLUME", 0.001, 0.0, "mL")),
    "L" -> (("VOLUME", 1000.0, 0.0, "mL")),
    // MASS
    "mg" -> (("MASS", 0.001, 0.0, "g")),
    "kg" -> (("MASS", 1000.0, 0.0, "g")),
    "g" -> (("MASS", 1.0, 0.0, "g"))
  )

  val unitMap: Map[String, (String, Double, Double, String)] = Units.toMap

  // Measurement grammar (hand-rolled scanner — a regex alternation over
  // 60 unit surfaces measured ~3x the cost of the rest of NER combined):
  //   NUM      = [+-]?\d+(\.\d+)?([eE][+-]?\d+)?
  //   UNIT     = longest surface from Units, not followed by [A-Za-z0-9°·µ]
  //   interval = NUM \s* ([-–—] | to\s) \s* NUM \s* UNIT
  //   list     = NUM (\s*,\s* NUM)* \s+ and \s+ NUM \s* UNIT
  //   value    = NUM \s* UNIT
  // Scanning semantics mirror java.util.regex find(): leftmost match,
  // resume after the previous match's end, advance by one on failure.

  // unit surfaces grouped by first char, longest-first within a group
  private val unitsByFirstChar: java.util.HashMap[Character, Array[String]] = {
    val m = new java.util.HashMap[Character, Array[String]]()
    Units.map(_._1).groupBy(_.charAt(0)).foreach { case (c, ss) =>
      m.put(c, ss.sortBy(-_.length).toArray)
    }
    m
  }

  private def isUnitBoundary(text: String, pos: Int): Boolean =
    pos >= text.length || {
      val c = text.charAt(pos)
      !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '°' || c == '·' || c == 'µ')
    }

  /** Longest unit surface starting at `pos` with a valid boundary after;
    * null if none.
    */
  private def matchUnit(text: String, pos: Int): String = {
    if (pos >= text.length) return null
    val cands = unitsByFirstChar.get(text.charAt(pos))
    if (cands == null) return null
    var i = 0
    while (i < cands.length) {
      val u = cands(i)
      if (text.regionMatches(pos, u, 0, u.length) && isUnitBoundary(text, pos + u.length))
        return u
      i += 1
    }
    null
  }

  // ASCII-only digit test: Character.isDigit accepts Unicode digits
  // (fullwidth '５', Arabic-Indic '٣', ...) that String.toDouble cannot
  // parse — accepting them here would throw NumberFormatException in the
  // executor hot path on real web text.
  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** End index of a NUM starting exactly at `pos`; -1 if none. */
  private def matchNum(text: String, pos: Int): Int = {
    var i = pos
    val n = text.length
    if (i < n && (text.charAt(i) == '+' || text.charAt(i) == '-')) i += 1
    val d0 = i
    while (i < n && isAsciiDigit(text.charAt(i))) i += 1
    if (i == d0) return -1
    if (i < n && text.charAt(i) == '.' && i + 1 < n && isAsciiDigit(text.charAt(i + 1))) {
      i += 1
      while (i < n && isAsciiDigit(text.charAt(i))) i += 1
    }
    if (i < n && (text.charAt(i) == 'e' || text.charAt(i) == 'E')) {
      var j = i + 1
      if (j < n && (text.charAt(j) == '+' || text.charAt(j) == '-')) j += 1
      val e0 = j
      while (j < n && isAsciiDigit(text.charAt(j))) j += 1
      if (j > e0) i = j
    }
    i
  }

  private def skipSpaces(text: String, pos: Int): Int = {
    var i = pos
    while (i < text.length && Character.isWhitespace(text.charAt(i))) i += 1
    i
  }

  private final case class RawMeasure(start: Int, end: Int, num: Double, unit: String)

  /** interval = NUM ws ([-–—]|to\s) ws NUM ws UNIT at `start`; returns
    * (end, value=upper bound, unit) or null. quantities.py:72-73.
    */
  private def matchInterval(text: String, start: Int): RawMeasure = {
    val n1 = matchNum(text, start)
    if (n1 < 0) return null
    var i = skipSpaces(text, n1)
    if (i >= text.length) return null
    val c = text.charAt(i)
    if (c == '-' || c == '–' || c == '—') i += 1
    else if (text.regionMatches(i, "to", 0, 2) && i + 2 < text.length &&
      Character.isWhitespace(text.charAt(i + 2))) i += 3
    else return null
    i = skipSpaces(text, i)
    val n2 = matchNum(text, i)
    if (n2 < 0) return null
    val u = matchUnit(text, skipSpaces(text, n2))
    if (u == null) return null
    RawMeasure(start, skipSpaces(text, n2) + u.length, text.substring(i, n2).toDouble, u)
  }

  /** list = NUM (ws,wsNUM)* \s+and\s+ NUM ws UNIT; >= 2 numbers total;
    * value = first quantity (quantities.py:76-77).
    */
  private def matchList(text: String, start: Int): RawMeasure = {
    val n1 = matchNum(text, start)
    if (n1 < 0) return null
    var i = n1
    var continue = true
    while (continue) {
      val j = skipSpaces(text, i)
      if (j < text.length && text.charAt(j) == ',') {
        val k = skipSpaces(text, j + 1)
        val ne = matchNum(text, k)
        if (ne < 0) continue = false else i = ne
      } else continue = false
    }
    // \s+and\s+
    var j = skipSpaces(text, i)
    if (j == i || !text.regionMatches(j, "and", 0, 3)) return null
    var k = j + 3
    val k2 = skipSpaces(text, k)
    if (k2 == k) return null
    val ne = matchNum(text, k2)
    if (ne < 0) return null
    val up = skipSpaces(text, ne)
    val u = matchUnit(text, up)
    if (u == null) return null
    RawMeasure(start, up + u.length, text.substring(start, n1).toDouble, u)
  }

  /** value = NUM ws UNIT. */
  private def matchValue(text: String, start: Int): RawMeasure = {
    val n1 = matchNum(text, start)
    if (n1 < 0) return null
    val up = skipSpaces(text, n1)
    val u = matchUnit(text, up)
    if (u == null) return null
    RawMeasure(start, up + u.length, text.substring(start, n1).toDouble, u)
  }

  /** Scan a sentence for measurements. Priority: interval > list >
    * single value; earlier match wins within a kind; later kinds skip
    * char ranges already claimed. Deterministic left-to-right.
    */
  private def scan(text: String): ArrayBuffer[RawMeasure] = {
    val found = ArrayBuffer.empty[RawMeasure]
    // digit pre-screen: a measurement always contains a digit
    var hasDigit = false
    var ci = 0
    while (!hasDigit && ci < text.length) {
      val c = text.charAt(ci)
      if (c >= '0' && c <= '9') hasDigit = true
      ci += 1
    }
    if (!hasDigit) return found
    val claimed = ArrayBuffer.empty[(Int, Int)]
    def free(s: Int, e: Int): Boolean = !claimed.exists { case (a, b) => s < b && a < e }

    // a NUM may only start at a token-ish boundary: the reference
    // matches whole tokens, so a digit glued to a preceding
    // letter/digit ("kg/m3" followed by " K") must never spawn a
    // measurement from mid-token (caught by PropertySpec fuzzing).
    // Number-glue punctuation ('.', ',', '-', '+', '/') is transparent
    // to the check: in "v1.5" the '5' sits behind a '.', but walking
    // the glue lands on the digit '1' — still mid-token, so no match
    // may start there (while " -40" walks to the space and stays a
    // valid negative-number start).
    def numBoundary(i: Int): Boolean = {
      var j = i - 1
      while (j >= 0 && "+-.,/".indexOf(text.charAt(j)) >= 0) j -= 1
      j < 0 || !Character.isLetterOrDigit(text.charAt(j))
    }

    def pass(matcher: (String, Int) => RawMeasure): Unit = {
      var i = 0
      while (i < text.length) {
        val m = if (numBoundary(i)) matcher(text, i) else null
        if (m != null) {
          if (free(m.start, m.end)) {
            found += m
            claimed += ((m.start, m.end))
          }
          i = m.end
        } else i += 1
      }
    }
    pass(matchInterval) // interval -> quantityMost = upper bound
    pass(matchList) // listc -> first quantity
    pass(matchValue)
    found.sortBy(_.start)
  }

  /** Char-offset -> token-index alignment, doc-absolute variant
    * (cprex/ner/quantities.py:119-137): tstart = first token with
    * idx >= start; tend = first token with idx >= end, else last+1.
    */
  def tokenRange(toks: Array[Tok], startChar: Int, endChar: Int): (Int, Int) = {
    var tstart = -1
    var tend = -1
    var i = 0
    while (i < toks.length && (tstart < 0 || tend < 0)) {
      if (toks(i).start >= startChar && tstart < 0) tstart = i
      if (toks(i).start >= endChar && tend < 0) tend = i
      i += 1
    }
    if (tend < 0) tend = toks.length
    (tstart, tend)
  }

  /** Extract quantity entities from a sentence. Spans are char-accurate;
    * token ranges follow the reference's alignment quirks.
    */
  def findEntities(text: String, toks: Array[Tok]): Array[Ent] = {
    val out = ArrayBuffer.empty[Ent]
    scan(text).foreach { m =>
      unitMap.get(m.unit).foreach { case (label, factor, offset, canonUnit) =>
        val (ts, te0) = tokenRange(toks, m.start, m.end)
        if (ts >= 0) {
          val te = math.max(te0, ts + 1)
          out += Ent(ts, te, m.start, m.end, text = text.substring(m.start, m.end),
            label = label, entId = "", value = m.num * factor + offset, unit = canonUnit)
        }
      }
    }
    out.toArray
  }
}
