package graft.operators

import graft.model.{Ent, Tok}
import scala.collection.mutable.ArrayBuffer
import java.util.regex.Pattern

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

  private val NUM = "[+-]?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?"
  // longest-first so "kcal/mol" beats "cal/g" fragments etc.
  private val UNIT_ALT = Units.map(_._1).sortBy(-_.length).map(Pattern.quote).mkString("|")
  // a unit must not be immediately followed by a letter/digit ("5 hPa"
  // must not read unit "h"); '%' may be glued to the number.
  private val UNIT = s"($UNIT_ALT)(?![A-Za-z0-9°·µ])"

  private val IntervalRe = Pattern.compile(
    s"($NUM)\\s*(?:[-–—]|to\\s)\\s*($NUM)\\s*$UNIT")
  private val ListRe = Pattern.compile(
    s"($NUM)(?:\\s*,\\s*(?:$NUM))*\\s+and\\s+(?:$NUM)\\s*$UNIT")
  private val ValueRe = Pattern.compile(s"($NUM)\\s*$UNIT")

  private final case class RawMeasure(start: Int, end: Int, num: Double, unit: String)

  /** Scan a sentence for measurements. Priority: interval > list >
    * single value; earlier match wins within a kind; later kinds skip
    * char ranges already claimed. Deterministic left-to-right.
    */
  private def scan(text: String): ArrayBuffer[RawMeasure] = {
    val found = ArrayBuffer.empty[RawMeasure]
    val claimed = ArrayBuffer.empty[(Int, Int)]
    def free(s: Int, e: Int): Boolean = !claimed.exists { case (a, b) => s < b && a < e }

    val im = IntervalRe.matcher(text)
    while (im.find()) {
      // interval -> quantityMost = upper bound (quantities.py:72-73)
      if (free(im.start, im.end)) {
        found += RawMeasure(im.start, im.end, im.group(2).toDouble, im.group(3))
        claimed += ((im.start, im.end))
      }
    }
    val lm = ListRe.matcher(text)
    while (lm.find()) {
      if (free(lm.start, lm.end)) {
        // listc -> first quantity (quantities.py:76-77)
        found += RawMeasure(lm.start, lm.end, lm.group(1).toDouble, lm.group(2))
        claimed += ((lm.start, lm.end))
      }
    }
    val vm = ValueRe.matcher(text)
    while (vm.find()) {
      if (free(vm.start, vm.end)) {
        found += RawMeasure(vm.start, vm.end, vm.group(1).toDouble, vm.group(2))
        claimed += ((vm.start, vm.end))
      }
    }
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
