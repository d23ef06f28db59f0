package graft.operators

import graft.functions.Text
import graft.model.{Ent, Tok}
import scala.collection.mutable.ArrayBuffer

/** M3: property-mention ruler — a faithful re-expression of the
  * reference's spaCy entity_ruler patterns (cprex/ner/properties.py:7-530,
  * installed at cprex/pipeline.py:55-56) as a pure token matcher usable
  * inside a Spark map stage.
  *
  * Semantics reproduced:
  *  - pattern attributes LEMMA / LOWER / TEXT with IN-sets and OP:"?"
  *    optionals;
  *  - spaCy filter_spans overlap resolution: longest span wins, earlier
  *    start on ties (spacy.util.filter_spans);
  *  - ent label (PROP|FORMULA) + ent_id (property type) vocabulary.
  *
  * The matcher itself is data-driven: patterns are literal tables below,
  * matching is a short backtracking walk per (token, pattern) — O(n ×
  * |patterns| × maxPatternLen) per sentence, all in-row (no shuffle).
  */
object PropertyRuler {

  // attr kinds
  private final val LEMMA = 0
  private final val LOWER = 1
  private final val TEXT = 2

  final case class PTok(attr: Int, values: Set[String], opt: Boolean = false)
  final case class Pattern(label: String, entId: String, toks: Array[PTok])

  private def l(vs: String*) = PTok(LEMMA, vs.toSet)
  private def lo(vs: String*) = PTok(LOWER, vs.toSet)
  private def t(vs: String*) = PTok(TEXT, vs.toSet)
  private def lOpt(vs: String*) = PTok(LEMMA, vs.toSet, opt = true)
  private def loOpt(vs: String*) = PTok(LOWER, vs.toSet, opt = true)
  private def tOpt(vs: String*) = PTok(TEXT, vs.toSet, opt = true)

  private val enthalpyOf = Array("combustion", "formation", "explosion",
    "sublimation", "detonation", "decomposition")
  private val energyOf = Array("combustion", "formation", "explosion",
    "dissociation", "activation")

  /** Verbatim port of PROPERTY_PATTERNS (properties.py:520-530), in
    * reference concatenation order.
    */
  val Patterns: Array[Pattern] = Array(
    // ABSORPTIVITY_PATTERNS (properties.py:7-27)
    Pattern("PROP", "absorptivity", Array(l("absorptivity"))),
    Pattern("PROP", "absorptivity", Array(l("molar"), l("absorption", "absorptivity"))),
    Pattern("FORMULA", "absorptivity", Array(t("A"), lo("="))),
    Pattern("FORMULA", "absorptivity", Array(t("A="))),
    // VACUUM_PATTERNS (properties.py:29-38) — [sic] id "vaccum"
    Pattern("PROP", "vaccum", Array(lo("vacuum"), l("stability", "decay"))),
    // ENTHALPY_PATTERNS (properties.py:40-174)
    Pattern("PROP", "enthalpy", Array(lOpt("molar"), lOpt("volumetric"), lOpt("net"),
      l("enthalpy"), lo("of"), l(enthalpyOf: _*))),
    Pattern("PROP", "enthalpy", Array(lOpt("molar"), lOpt("volumetric"), lOpt("net"),
      l(enthalpyOf: _*), l("enthalpy"))),
    Pattern("PROP", "enthalpy", Array(lOpt("molar"), lOpt("volumetric"), lOpt("net"),
      l("heat"), lo("of"), l(enthalpyOf: _*))),
    Pattern("PROP", "enthalpy", Array(lOpt("molar"), lOpt("volumetric"), lOpt("net"),
      l(enthalpyOf: _*), l("heat"))),
    Pattern("PROP", "enthalpy", Array(t("NHOC"))),
    Pattern("PROP", "enthalpy", Array(t("VHOC"))),
    Pattern("FORMULA", "enthalpy", Array(t("Δ"), t("H"), loOpt("sub"), loOpt("fus"),
      loOpt("vap"), loOpt("f"), loOpt("exp"), loOpt("d"), loOpt("dec"))),
    Pattern("FORMULA", "enthalpy", Array(t("ΔH"), loOpt("sub"), loOpt("fus"),
      loOpt("vap"), loOpt("f"), loOpt("exp"), loOpt("d"), loOpt("dec"))),
    // ENERGY_PATTERNS (properties.py:176-238)
    Pattern("PROP", "energy", Array(l("energy"), lo("of"), l(energyOf: _*))),
    Pattern("PROP", "energy", Array(lOpt("molar"), lOpt("bond"), l(energyOf: _*), l("energy"))),
    Pattern("FORMULA", "energy", Array(t("Δ"), t("G"))),
    Pattern("FORMULA", "energy", Array(t("ΔG"))),
    Pattern("FORMULA", "energy", Array(lo("bde"))),
    // POINT_PATTERNS (properties.py:240-321)
    Pattern("PROP", "temperature", Array(l("flash", "boil", "boiling", "melt", "heat",
      "freeze", "freezing", "decomposition", "sublimation", "dec."), l("point"))),
    Pattern("PROP", "temperature", Array(l("decompose"), l("at"))),
    Pattern("PROP", "temperature", Array(l("stable", "stability"),
      l("at", "until", "up", "from"), lOpt("to"))),
    Pattern("PROP", "temperature", Array(l("explode"), l("at"))),
    Pattern("PROP", "temperature", Array(l("heat", "boil", "boiling", "melt", "freeze",
      "freezing", "calorific", "sublimation", "decomposition"), l("value"))),
    // PRESSURE_PATTERNS (properties.py:323-344)
    Pattern("PROP", "pressure", Array(l("critical", "vapor", "vapour", "heat", "freeze",
      "calorific", "detonation"), l("pressure"))),
    // TEMPERATURE_PATTERNS (properties.py:346-395)
    Pattern("PROP", "temperature", Array(l("critical", "ignition", "decomposition",
      "detonation"), l("temperature"))),
    Pattern("FORMULA", "temperature", Array(t("T"), t("c"), t("="))),
    Pattern("FORMULA", "temperature", Array(t("Tc"), t("="))),
    Pattern("FORMULA", "temperature", Array(t("T"), t("c="))),
    Pattern("FORMULA", "temperature", Array(t("Tc="))),
    Pattern("FORMULA", "temperature", Array(t("T"), t("dec"), t("="))),
    Pattern("FORMULA", "temperature", Array(t("Tdec"), t("="))),
    Pattern("FORMULA", "temperature", Array(t("T"), t("dec="))),
    Pattern("FORMULA", "temperature", Array(t("Tdec="))),
    // DENSITY_PATTERNS (properties.py:397-419)
    Pattern("PROP", "density", Array(l("density", "solubility"))),
    Pattern("PROP", "density", Array(lo("density", "solubility"))),
    Pattern("FORMULA", "density", Array(t("ρ"))),
    // OTHER_PATTERNS (properties.py:421-518)
    Pattern("PROP", "heat capacity", Array(l("heat"), l("capacity"))),
    Pattern("PROP", "toxicity", Array(l("toxicity"))),
    Pattern("PROP", "viscosity", Array(l("viscosity"))),
    Pattern("FORMULA", "viscosity", Array(t("η"), t("="))),
    Pattern("FORMULA", "viscosity", Array(t("η="))),
    Pattern("PROP", "thermal", Array(l("thermal"),
      l("stability", "conductivity", "diffusivity", "decomposition"))),
    Pattern("FORMULA", "thermal", Array(lo("t1/2"), tOpt("="))),
    Pattern("PROP", "velocity", Array(l("detonation"), l("velocity"))),
    Pattern("PROP", "formula weight", Array(l("formula"), l("weight"))),
    Pattern("PROP", "sensibility", Array(l("impact", "friction", "esd", "electrostatic"),
      l("sensibility", "sensitivity"))),
    Pattern("PROP", "sensibility", Array(l("electrostatic"), l("discharge"),
      l("sensibility", "sensitivity"))),
    Pattern("PROP", "sensibility", Array(l("sensitive"), l("to"),
      l("impact", "friction", "esd", "electrostatic")))
  )

  private def tokMatches(p: PTok, text: String, lower: String, lem: String): Boolean =
    p.attr match {
      case LEMMA => p.values.contains(lem)
      case LOWER => p.values.contains(lower)
      case TEXT  => p.values.contains(text)
    }

  /** First-token dispatch index (hot-path): a pattern can only begin at
    * a token that matches one of its leading optionals or its first
    * non-optional PTok. Three value→pattern-bitmask maps (one per attr
    * kind); per position the candidate set is the OR of three O(1)
    * lookups — instead of running all |Patterns| matchers at every
    * token. Patterns.length <= 64 so a Long bitmask suffices.
    */
  private val (firstByText, firstByLower, firstByLemma) = {
    require(Patterns.length <= 64, "first-token index uses a Long bitmask")
    val byText = new java.util.HashMap[String, Long]()
    val byLower = new java.util.HashMap[String, Long]()
    val byLemma = new java.util.HashMap[String, Long]()
    def add(m: java.util.HashMap[String, Long], v: String, p: Int): Unit =
      m.merge(v, 1L << p, (a, b) => a | b)
    Patterns.zipWithIndex.foreach { case (pat, p) =>
      var k = 0
      var continue = true
      while (continue && k < pat.toks.length) {
        val pt = pat.toks(k)
        val m = pt.attr match {
          case TEXT => byText; case LOWER => byLower; case _ => byLemma
        }
        pt.values.foreach(add(m, _, p))
        if (!pt.opt) continue = false
        k += 1
      }
    }
    (byText, byLower, byLemma)
  }

  /** Longest match of `pattern` starting at token `start`; -1 if none.
    * Backtracking over OP:"?" optionals (take-first then skip), returning
    * the maximal end — equivalent to spaCy emitting every optional
    * combination and filter_spans keeping the longest. `lowers`/`lemmas`
    * are the per-sentence memo arrays (one toLowerCase per token total).
    */
  private def matchAt(toks: Array[Tok], lowers: Array[String], lemmas: Array[String],
      start: Int, pat: Array[PTok]): Int = {
    def go(ti: Int, pi: Int): Int = {
      if (pi == pat.length) return ti
      if (ti >= toks.length) {
        // remaining pattern tokens must all be optional
        var k = pi
        while (k < pat.length && pat(k).opt) k += 1
        return if (k == pat.length) ti else -1
      }
      val p = pat(pi)
      if (p.opt) {
        val took = if (tokMatches(p, toks(ti).text, lowers(ti), lemmas(ti))) go(ti + 1, pi + 1) else -1
        val skipped = go(ti, pi + 1)
        math.max(took, skipped)
      } else if (tokMatches(p, toks(ti).text, lowers(ti), lemmas(ti))) go(ti + 1, pi + 1)
      else -1
    }
    val end = go(start, 0)
    if (end > start) end else -1 // zero-length (all-optional) is no match
  }

  /** Find all property/formula entities in a token stream, resolved to
    * non-overlapping spans per filter_spans semantics
    * (longest, then earliest start, then pattern order).
    */
  def findEntities(toks: Array[Tok]): Array[Ent] =
    findEntities(toks, Ner.lowercaseAll(toks), null)

  /** Hot-path variant with caller-supplied memo arrays (Ner.annotate
    * computes them once for all three detectors). `lemmas0` may be null.
    */
  def findEntities(toks: Array[Tok], lowers: Array[String],
      lemmas0: Array[String]): Array[Ent] = {
    val lemmas = if (lemmas0 != null) lemmas0 else lowers.map(Text.lemmaOfLower)
    val cands = ArrayBuffer.empty[(Int, Int, Int)] // (start, end, patternIdx)
    var i = 0
    while (i < toks.length) {
      var mask = firstByLemma.getOrDefault(lemmas(i), 0L) |
        firstByLower.getOrDefault(lowers(i), 0L) |
        firstByText.getOrDefault(toks(i).text, 0L)
      while (mask != 0L) {
        val p = java.lang.Long.numberOfTrailingZeros(mask)
        mask &= mask - 1
        val end = matchAt(toks, lowers, lemmas, i, Patterns(p).toks)
        if (end > i) cands += ((i, end, p))
      }
      i += 1
    }
    val sorted = cands.sortBy { case (s, e, p) => (-(e - s), s, p) }
    val claimed = new java.util.BitSet(toks.length)
    val out = ArrayBuffer.empty[Ent]
    sorted.foreach { case (s, e, p) =>
      var free = true
      var k = s
      while (k < e && free) { if (claimed.get(k)) free = false; k += 1 }
      if (free) {
        claimed.set(s, e)
        val pat = Patterns(p)
        val startChar = toks(s).start
        val endChar = toks(e - 1).end
        out += Ent(s, e, startChar, endChar, text = null, label = pat.label,
          entId = pat.entId, value = Double.NaN, unit = "")
      }
    }
    out.sortBy(_.startTok).toArray
  }
}
