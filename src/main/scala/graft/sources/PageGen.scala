package graft.sources

import graft.functions.{Html, Text}
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import scala.util.hashing.MurmurHash3

/** S1-analog: deterministic synthesized Common-Crawl-style page table
  * (FIXTURES.md §1) + gold fixtures derived from the template
  * instantiation log.
  *
  * Every choice is a pure function of the page index via murmur hashes —
  * no RNG state, so any page can be regenerated independently on any
  * executor (generation is `spark.range(n).map(genPage)`: embarrassingly
  * parallel, no shuffle, linear in n — holds at 10^12 rows).
  *
  * The html column is RENDERED FROM the ground-truth text (Html.render),
  * which guarantees the north-rule byte-identical invariant
  * `extractText(html) == text` by construction; templates additionally
  * embed the reference's GROBID quirk chars (" À", " ¼" —
  * pdf_parser.py:113-114) in the html so the normalization path is
  * exercised (the text column holds the normalized form).
  *
  * Gold entity fixtures come from the template metadata (which mention
  * sits where). Gold RELATIONS and TRIPLES are HAND-AUTHORED per
  * template (`assocs` + `emitsTriples` below): each template case
  * states, as literal index pairs, which (head, value) associations
  * the sentence truly expresses under the reference's documented
  * extraction semantics (threshold 0.45, tuples.py:59-87; max_length
  * 100, rel_trf.cfg:62; chemicals-present filter, ui/utils.py:90-95;
  * doc keep-filter, corpus.py:33-70) — WITHOUT calling the engine's
  * scorer or assembler. A regression in Relations.score /
  * Triples.assemble therefore FAILS the P/R gate instead of silently
  * shifting the gold with it (PipelineSpec includes a deliberate
  * scorer-perturbation test proving the gate's sensitivity).
  */
object PageGen {

  def hash(s: String): Int = MurmurHash3.stringHash(s, 42) & 0x7fffffff
  def pick(i: Long, salt: String, n: Int): Int = hash(s"$i:$salt") % n

  private def fmt(v: Double): String = f"$v%.1f".replace(',', '.')

  /** One mention-or-literal segment of a sentence template. */
  sealed private trait Seg
  private case class Lit(s: String) extends Seg
  private case class Mention(s: String, label: String, entId: String = "",
      value: Double = Double.NaN, unit: String = "") extends Seg

  private def chem(s: String) = Mention(s, "CHEM")
  private def prop(s: String, id: String) = Mention(s, "PROP", id)
  private def formula(s: String, id: String) = Mention(s, "FORMULA", id)

  /** Gold quantity mention. The gold numeric value is computed by
    * parsing the FORMATTED surface back (then applying the same
    * factor/offset arithmetic as the engine's unit table) so gold and
    * engine agree bit-for-bit on doubles.
    */
  private def q(raw: Double, unitSurface: String, sep: String = " "): Mention = {
    val s = fmt(raw)
    val (label, factor, offset, canon) = graft.operators.QuantityParser.unitMap(unitSurface)
    Mention(s"$s$sep$unitSurface", label, "", s.toDouble * factor + offset, canon)
  }

  /** Gold interval mention — value = upper bound (quantityMost). */
  private def qi(raw1: Double, raw2: Double, unitSurface: String, sep: String = ""): Mention = {
    val s1 = fmt(raw1); val s2 = fmt(raw2)
    val (label, factor, offset, canon) = graft.operators.QuantityParser.unitMap(unitSurface)
    Mention(s"$s1-$s2$sep$unitSurface", label, "", s2.toDouble * factor + offset, canon)
  }

  /** @param assocs hand-authored true (head, value) associations as
    *   indexes into the sentence's MENTION list (== ents array order);
    *   the semantic ground truth of which entity pairs the sentence
    *   expresses, authored per template — never computed by the engine.
    * @param emitsTriples hand-authored outcome of the doc keep-filter +
    *   chemicals-present filter for this template: when false, the
    *   extractor must emit NO triples from this sentence even though
    *   associations may exist (corpus.py:59-70, ui/utils.py:90-95).
    */
  final case class GoldSentence(text: String, htmlText: String, ents: Array[Ent],
      assocs: Array[(Int, Int)], emitsTriples: Boolean)

  /** Assemble segments into a gold sentence: compute char offsets, then
    * token offsets with the engine's alignment rule (first tok.start >=
    * startChar / >= endChar).
    */
  private def build(segs: Seq[Seg], assocs: Seq[(Int, Int)] = Nil,
      emitsTriples: Boolean = false): GoldSentence = {
    val sb = new StringBuilder
    val raw = ArrayBuffer.empty[(Int, Int, Mention)]
    segs.foreach {
      case Lit(s) => sb.append(s)
      case m: Mention =>
        val st = sb.length
        sb.append(m.s)
        raw += ((st, sb.length, m))
    }
    val text = sb.toString
    val toks = Text.tokenize(text)
    val ents = raw.map { case (sc, ec, m) =>
      var ts = -1; var te = -1; var k = 0
      while (k < toks.length && (ts < 0 || te < 0)) {
        if (toks(k).start >= sc && ts < 0) ts = k
        if (toks(k).start >= ec && te < 0) te = k
        k += 1
      }
      if (te < 0) te = toks.length
      Ent(ts, te, sc, ec, m.s, m.label, m.entId, m.value, m.unit)
    }.toArray
    GoldSentence(text, text, ents, assocs.toArray, emitsTriples)
  }

  /** The template bank. Index is load-bearing (deterministic choice);
    * negatives exercise P3 drop, unit-compat drop, distance cap, W2
    * traps, the competing-value threshold trap and the
    * char-normalization quirk.
    *
    * `assocs`/`emitsTriples` per case are the HAND-AUTHORED gold:
    * mention-index pairs stating which (head, value) associations the
    * sentence expresses under the reference's documented extraction
    * semantics, and whether the doc keep-filter + chemicals-present
    * filter let this sentence emit triples at all. Authored by reading
    * each sentence, not by running the scorer.
    */
  private def template(t: Int, i: Long, c: String, slot: String): GoldSentence = {
    val v = 50.0 + pick(i, s"v:$slot", 3500) / 10.0
    val v2 = v + 10.0 + pick(i, s"v2:$slot", 100)
    t match {
      // m0=PROP m1=CHEM m2=Q: both heads name the value
      case 0 => build(Seq(Lit("The "), prop("melting point", "temperature"), Lit(" of "),
        chem(c), Lit(" is "), q(v, "°C"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      // m0=CHEM m1=PROP m2=Q
      case 1 => build(Seq(chem(c), Lit(" has a "), prop("density", "density"), Lit(" of "),
        q(v / 100, "g/cm3"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      // m0=FORMULA m1=CHEM m2=Q
      case 2 => build(Seq(formula("ΔH fus", "enthalpy"), Lit(" of "), chem(c),
        Lit(" was measured at "), q(v, "kJ/mol"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case 3 => build(Seq(Lit("The "), prop("detonation velocity", "velocity"), Lit(" of "),
        chem(c), Lit(" reached "), q(v * 10, "m/s"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case 4 => build(Seq(chem(c), Lit(" "), prop("decomposes at", "temperature"), Lit(" "),
        q(v, "°C"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case 5 => build(Seq(Lit("The "), prop("heat capacity", "heat capacity"), Lit(" of "),
        chem(c), Lit(" is "), q(v / 100, "J/(g·K)"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case 6 => build(Seq(Mention("Thermal stability", "PROP", "thermal"), Lit(" of "), chem(c),
        Lit(" was maintained up to "), q(v, "°C"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case 7 => build(Seq(Lit("The "), prop("vapor pressure", "pressure"), Lit(" of "), chem(c),
        Lit(" is "), q(v, "kPa"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      // m0=PROP m1=FORMULA m2=CHEM m3=Q: all three heads
      case 8 => build(Seq(Lit("The "), prop("activation energy", "energy"), Lit(" ("),
        formula("ΔG", "energy"), Lit(") of "), chem(c), Lit(" is "),
        q(v, "kJ/mol"), Lit(".")),
        assocs = Seq(0 -> 3, 1 -> 3, 2 -> 3), emitsTriples = true)
      case 9 => build(Seq(Lit(s"the "), prop("thermal decomposition", "thermal"), Lit(s" of "),
        chem(c), Lit(" occurs around "), qi(v, v2, "°C"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      // m0=PROP m1=CHEM(c) m2=CHEM(water) m3=Q: the solvent is also a
      // head of the solubility value in the reference's tuple shape
      case 10 => build(Seq(Lit("The "), prop("solubility", "density"), Lit(" of "), chem(c),
        Lit(" in "), chem("water"), Lit(" is "), q(v / 10, "g/L"), Lit(".")),
        assocs = Seq(0 -> 3, 1 -> 3, 2 -> 3), emitsTriples = true)
      case 11 => build(Seq(Lit("The "), prop("density", "density"), Lit(" of "),
        chem("high density polyethylene"), Lit(" is "), q(v / 400, "g/cm3"), Lit(".")),
        assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      // m0=CHEM m1=Q(K) m2=Q(min): the temperature is the compound's
      // melting value; the duration is event circumstance, NOT a
      // property value (hand-gold negative). No PROP/FORMULA in the
      // sentence -> doc keep-filter drops it -> no triples either way.
      case 12 => build(Seq(Lit("Samples of "), chem("compound 95"), Lit(" melted at "),
        q(v + 200, "K"), Lit(" after approx. "), q(v / 10, "min"), Lit(".")),
        assocs = Seq(0 -> 1), emitsTriples = false)
      // m0=Q(mL) m1=CHEM(ethanol) m2=Q(g) m3=CHEM(c): each chem is
      // associated with ITS amount only (cross pairs are hand-gold
      // negatives); no property -> keep-filter drops -> no triples
      case 13 => build(Seq(Lit("A mixture was prepared with "),
        q(v / 10, "mL"), Lit(" of "), chem("ethanol"),
        Lit(" and "), q(v / 20, "g"), Lit(" of "), chem(c), Lit(".")),
        assocs = Seq(1 -> 0, 3 -> 2), emitsTriples = false)
      // m0=FORMULA m1=Q m2=CHEM
      case 14 => build(Seq(formula("Tc =", "temperature"), Lit(" "),
        q(v, "K"), Lit(" for "), chem(c), Lit(" single crystals.")),
        assocs = Seq(0 -> 1, 2 -> 1), emitsTriples = true)
      case 15 =>
        // char-normalization quirk: html carries " ¼", text carries "="
        // (pdf_parser.py:113-114)
        val g = build(Seq(formula("Tc=", "temperature"), Lit(" "),
          q(v, "K"), Lit(" was found for "), chem(c), Lit(".")),
          assocs = Seq(0 -> 1, 2 -> 1), emitsTriples = true)
        g.copy(htmlText = g.text.replace("Tc=", "Tc ¼"))
      // ---- negatives ----
      case 16 => build(Seq(Lit("The "), prop("toxicity", "toxicity"), Lit(" of "), chem(c),
        Lit(" is still under review."))) // P3 drop: no quantity, no assocs
      case 17 => build(Seq(Lit(s"Batch ${pick(i, s"b:$slot", 90) + 10} was stored in the dark for later analysis.")))
      // m0=PROP m1=CHEM m2=Q(kPa): the sentence DOES assert the value
      // for the chem (hand-gold association), but the stated property
      // is unit-incompatible (density vs PRESSURE) so the doc
      // keep-filter rejects the sentence -> no triples
      case 18 => build(Seq(Lit("The "), prop("density", "density"), Lit(" of "), chem(c),
        Lit(" was reported previously at "), q(v, "kPa"), Lit(".")),
        assocs = Seq(1 -> 2), emitsTriples = false)
      // m0=CHEM m1=PROP m2=Q: distance cap (>100 tokens) removes the
      // chem association by documented reference semantics
      // (max_length, rel_trf.cfg:62); the property association remains
      // but with no chem head the chemicals-present filter drops the
      // tuple -> no triples
      case 19 =>
        val filler = "the procedure was repeated with an inert filler material and "
        build(Seq(chem(c), Lit(" was combined as follows: " + filler * 18 + "the product was "),
          prop("stable up to", "temperature"), Lit(" "), q(v, "°C"), Lit(".")),
          assocs = Seq(1 -> 2), emitsTriples = false)
      case 20 =>
        // Schwartz-Hearst abbreviation definition + a global re-match
        // occurrence (M5/W4); both HDPE surfaces are gold CHEM because
        // the gazetteer carries the synonym. All three mentions of the
        // one compound plus the property head name the value.
        build(Seq(Lit("Samples of "), chem("high density polyethylene"), Lit(" ( "),
          chem("HDPE"), Lit(" ) were prepared; "), chem("HDPE"), Lit(" showed a "),
          prop("density", "density"), Lit(" of "), q(v / 400, "g/cm3"), Lit(".")),
          assocs = Seq(0 -> 4, 1 -> 4, 2 -> 4, 3 -> 4), emitsTriples = true)
      // m0=PROP m1=CHEM m2=Q1 m3=Q2 m4=Q3: competing same-label values.
      // Q1 is the stated melting point; Q2/Q3 are instrument readings
      // during calibration — hand-gold negatives ~80 tokens downstream.
      // The documented scorer suppresses them (distance decay +
      // same-label competition); a perturbed scorer attaches them and
      // MUST fail the P/R gate (PipelineSpec perturbation test).
      case 21 =>
        val filler = "the measurement was repeated under identical conditions with careful control and "
        build(Seq(Lit("The "), prop("melting point", "temperature"), Lit(" of "),
          chem(c), Lit(" is "), q(v, "°C"),
          Lit(", a value confirmed as follows: " + filler * 6 + "the furnace display showed "),
          q(v2, "°C"), Lit(" and later "), q(v2 + 13.0, "°C"),
          Lit(" during calibration.")),
          assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
      case _ => build(Seq(Lit("Supplementary data are provided in the appendix.")))
    }
  }

  val TemplateBankSize = 23

  /** Deterministic skewed chem choice: ~32% of sentences reference a
    * head entity (water/NaCl/benzene) — the J1 salting workload.
    */
  private def chemSurface(i: Long, slot: String): String = {
    val r = pick(i, s"chem:$slot", 100)
    if (r < 15) "water"
    else if (r < 25) "NaCl"
    else if (r < 32) "benzene"
    else {
      val e = ChemDict.entries(pick(i, s"chemIdx:$slot", ChemDict.entries.length))
      e.synonyms(pick(i, s"chemSyn:$slot", e.synonyms.length))
    }
  }

  final case class GoldPage(page: Page, sentences: Array[Sentence],
      triples: Array[Triple])

  // deterministic author-name bank (pdf_parser.py:78-98 analog content)
  private val FirstNames = Array("Alice", "Bruno", "Chen", "Dana", "Emil",
    "Farah", "Goro", "Hana", "Igor", "Jule")
  private val LastNames = Array("Moreau", "Okafor", "Petrov", "Quinn", "Rossi",
    "Sato", "Tanaka", "Ueda", "Vargas", "Weiss")

  private def genAuthors(i: Long): Array[String] = {
    val n = 1 + pick(i, "nAuthors", 3)
    (0 until n).map { k =>
      s"${FirstNames(pick(i, s"af:$k", FirstNames.length))} ${LastNames(pick(i, s"al:$k", LastNames.length))}"
    }.toArray
  }

  private def genPubDate(i: Long): String = {
    val y = 2015 + pick(i, "pubY", 10)
    val m = 1 + pick(i, "pubM", 12)
    val d = 1 + pick(i, "pubD", 28)
    f"$y%04d-$m%02d-$d%02d"
  }

  /** One gold table data row: (cells with colspans, gold sentence over
    * the tab-joined row text). Three row variants; variant 2 exercises
    * the colspan-advance cell keying (c_0, c_2, c_3).
    */
  private def tableDataRow(i: Long, r: Int): (Array[(String, Int)], GoldSentence) = {
    val slot = s"tblrow:$r"
    val c = chemSurface(i, slot)
    val v = 50.0 + pick(i, s"tv:$slot", 3500) / 10.0
    pick(i, s"tvar:$slot", 3) match {
      case 0 =>
        val g = build(Seq(chem(c), Lit("\t"), prop("density", "density"), Lit("\t"),
          q(v / 100, "g/cm3")), assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
        (Array(c -> 1, "density" -> 1, g.ents(2).text -> 1), g)
      case 1 =>
        val g = build(Seq(chem(c), Lit("\t"), prop("melting point", "temperature"),
          Lit("\t"), q(v, "°C")), assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
        (Array(c -> 1, "melting point" -> 1, g.ents(2).text -> 1), g)
      case _ =>
        val g = build(Seq(chem(c), Lit("\t"), prop("vapor pressure", "pressure"),
          Lit("\t"), q(v, "kPa")), assocs = Seq(0 -> 2, 1 -> 2), emitsTriples = true)
        // chem cell spans 2 columns: keys c_0, c_2, c_3
        (Array(c -> 2, "vapor pressure" -> 1, g.ents(2).text -> 1), g)
    }
  }

  // the abstract is a distinct Article field (pdf_parser.py:128-141) —
  // generated separately from the body sections, but with the SAME
  // "Abstract:<p>:<s>" slot keys as before so surfaces/templates (and
  // therefore every golden byte) are unchanged
  private val AbstractPlan: Array[Int] = Array(2) // 1 paragraph of 2 sentences
  private val SectionPlan: Array[(String, Array[Int])] = Array(
    ("Results", Array(2, 2)), // 2 paragraphs of 2 sentences
    ("Thermal analysis", Array(2)) // 1 paragraph of 2 sentences
  )

  /** Generate page i plus its gold sentence rows (ents + rels filled by
    * the shared rule code).
    */
  def genPage(i: Long): GoldPage = {
    val lang = if (i % 17 == 0) "de" else if (i % 23 == 0) "fr" else "en"
    val url = f"https://synth.example/corpus/doc-$i%08d"
    val doi = s"10.5555/synth.$i"
    val primary = chemSurface(i, "primary")
    val title = s"Properties of $primary"
    val authors = genAuthors(i)
    val pubDate = genPubDate(i)

    val goldSents = ArrayBuffer.empty[(String, GoldSentence)] // (section, gold)
    val htmlSections = ArrayBuffer.empty[Html.Section]
    val textSections = ArrayBuffer.empty[Html.Section]
    val abstractHtml = ArrayBuffer.empty[String]
    val abstractText = ArrayBuffer.empty[String]

    if (lang == "en") {
      def genParas(heading: String, paras: Array[Int],
          htmlOut: ArrayBuffer[String], textOut: ArrayBuffer[String]): Unit =
        paras.zipWithIndex.foreach { case (nSents, p) =>
          val gs = (0 until nSents).map { s =>
            val slot = s"$heading:$p:$s"
            val c = if (pick(i, s"useP:$slot", 100) < 40) primary else chemSurface(i, slot)
            val t = pick(i, s"tpl:$slot", TemplateBankSize)
            val g = template(t, i, c, slot)
            goldSents += ((heading, g))
            g
          }
          htmlOut += gs.map(_.htmlText).mkString(" ")
          textOut += gs.map(_.text).mkString(" ")
        }
      genParas("Abstract", AbstractPlan, abstractHtml, abstractText)
      SectionPlan.foreach { case (heading, paras) =>
        val htmlParas = ArrayBuffer.empty[String]
        val textParas = ArrayBuffer.empty[String]
        genParas(heading, paras, htmlParas, textParas)
        htmlSections += Html.Section(heading, htmlParas.toArray)
        textSections += Html.Section(heading, textParas.toArray)
      }
    } else {
      // non-en pages: pass through extraction untouched, no NLP gold
      val para =
        if (lang == "de") "Die Dichte von Wasser beträgt 0.997 g/cm3. Weitere Angaben folgen."
        else "La densité de l'eau est de 0.997 g/cm3. Voir les annexes."
      htmlSections += Html.Section("Zusammenfassung", Array(para))
      textSections += Html.Section("Zusammenfassung", Array(para))
    }

    // ~35% of en pages carry a properties table (P1 tables,
    // pdf_parser.py:170-222): header row + 2 data rows; each data row
    // is also a gold pseudo-sentence (section "table:<heading>") that
    // must yield triples through the normal NER/relation path
    val tableHeading = "Measured properties"
    val tables: Array[Html.Table] =
      if (lang == "en" && pick(i, "hasTable", 100) < 35) {
        def mkRow(cells: Array[(String, Int)]): Html.TableRow = {
          var idx = 0
          val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
          cells.foreach { case (txt, span) => m(s"c_$idx") = txt; idx += span }
          Html.TableRow(m.toMap)
        }
        val headerCells = Array("Compound" -> 1, "Property" -> 1, "Value" -> 1)
        val headerGold = build(Seq(Lit("Compound\tProperty\tValue")))
        val dataRows = (0 until 2).map(r => tableDataRow(i, r))
        goldSents += ((s"table:$tableHeading", headerGold))
        dataRows.foreach { case (_, g) => goldSents += ((s"table:$tableHeading", g)) }
        Array(Html.Table(tableHeading,
          Array("Selected property values measured in this work."),
          (headerCells +: dataRows.map(_._1)).map(mkRow).toArray))
      } else Array.empty[Html.Table]

    val htmlDoc = Html.ExtractedDoc(title, doi, htmlSections.toArray, authors, pubDate,
      tables, abstractHtml.toArray)
    val textDoc = Html.ExtractedDoc(title, doi, textSections.toArray, authors, pubDate,
      tables, abstractText.toArray)
    val page = Page(url, new Timestamp(1700000000000L + i * 60000L),
      Html.render(htmlDoc), textDoc.text, lang)

    // gold rels = the hand-authored associations as binary 1.0
    // annotations (the reference's label-studio gold shape,
    // parse_data.py:149-176) — NOT the engine scorer's output
    val sentences = goldSents.zipWithIndex.map { case ((section, g), sid) =>
      val toks = Text.tokenize(g.text)
      val rels = g.assocs.map { case (h, t) =>
        RelEdge(g.ents(h).startTok, g.ents(t).startTok, "has_value", 1.0)
      }
      Sentence(url, i, sid, section, title, doi, g.text, toks, g.ents, rels,
        authors = authors, pubDate = pubDate, isAbstract = section == "Abstract")
    }.toArray

    // gold triples = hand-authored associations materialized directly:
    // one row per assoc of a triple-emitting sentence (tuples.py:32-44
    // row shape). No scorer, no assembler.
    val triples = goldSents.zipWithIndex.flatMap { case ((section, g), sid) =>
      if (!g.emitsTriples) Array.empty[Triple]
      else g.assocs.map { case (h, t) =>
        val head = g.ents(h); val value = g.ents(t)
        Triple(url, doi, section, sid, g.text,
          headLabel = head.label, headText = head.text,
          propType = if (head.label == "PROP" || head.label == "FORMULA") head.entId else "",
          valueLabel = value.label, valueText = value.text,
          value = value.value, unit = value.unit, score = 1.0, title = title)
      }
    }.toArray
    GoldPage(page, sentences, triples)
  }

  /** Page count per driver scale dir (sf0.001 -> 200 etc.). */
  def numPagesFor(sfDir: String): Int = {
    val s = sfDir.replaceAll("/+$", "")
    if (s.endsWith("sf0.1")) 20000
    else if (s.endsWith("sf0.01")) 2000
    else 200
  }

  def pages(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map(i => genPage(i).page)
  }

  /** Materialize the page table to partitioned Parquet (the Iceberg-
    * style input table of the north rule) if not already present;
    * returns a Dataset[Page] reading from disk. Benchmarks use this so
    * engine throughput is measured against a real table scan, not
    * fused with generator CPU.
    */
  /** Bump when the generator's output changes (templates, dict, html
    * shape) — invalidates materialized bench inputs cached under
    * /tmp/graft_pages.
    */
  val GeneratorVersion = 3

  def materializedPages(spark: SparkSession, n: Long, baseDir: String = "/tmp/graft_pages")
      : Dataset[Page] = {
    import spark.implicits._
    // 1024 files: each file is one parquet row group, and row groups are
    // the REAL split granularity — maxPartitionBytes below file size
    // only manufactures empty tasks (a 256-file table always ran as 256
    // working tasks no matter the split setting; measured round 2).
    // 1024 row groups give the 16-slot wide level 64 genuine waves.
    val files = 1024
    val dir = s"$baseDir/v$GeneratorVersion-n=$n-f$files"
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir + "/_SUCCESS"))) {
      pages(spark, n, partitions = files).write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir).as[Page]
  }

  def goldSentences(spark: SparkSession, n: Long): Dataset[Sentence] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .flatMap(i => genPage(i).sentences)
  }

  /** Gold triples = the hand-authored per-template association lists
    * materialized directly (see `template`) — fully independent of the
    * engine's scorer (Relations.score), keep-filter and assembler
    * (Triples.assemble), so a regression in any of those fails the P/R
    * gate instead of shifting the gold with it.
    */
  def goldTriples(spark: SparkSession, n: Long): Dataset[Triple] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .flatMap(i => genPage(i).triples)
  }
}
