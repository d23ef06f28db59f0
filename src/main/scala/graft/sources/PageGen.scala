package graft.sources

import graft.functions.{Html, Text}
import graft.model._
import graft.operators.{Relations, Triples}
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
  * Gold entity/triple fixtures come from the template metadata (which
  * mention sits where), with relation/tuple rules applied via the SAME
  * rule code the engine uses (Relations/Triples) — i.e. the ground truth
  * is recoverable from the documented rules, not by luck (SURVEY.md §7
  * risk 4).
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

  final case class GoldSentence(text: String, htmlText: String, ents: Array[Ent])

  /** Assemble segments into a gold sentence: compute char offsets, then
    * token offsets with the engine's alignment rule (first tok.start >=
    * startChar / >= endChar).
    */
  private def build(segs: Seq[Seg]): GoldSentence = {
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
    GoldSentence(text, text, ents)
  }

  /** The template bank. Index is load-bearing (deterministic choice);
    * negatives exercise P3 drop, unit-compat drop, distance cap, W2
    * traps and the char-normalization quirk.
    */
  private def template(t: Int, i: Long, c: String, slot: String): GoldSentence = {
    val v = 50.0 + pick(i, s"v:$slot", 3500) / 10.0
    val v2 = v + 10.0 + pick(i, s"v2:$slot", 100)
    t match {
      case 0 => build(Seq(Lit("The "), prop("melting point", "temperature"), Lit(" of "),
        chem(c), Lit(" is "), q(v, "°C"), Lit(".")))
      case 1 => build(Seq(chem(c), Lit(" has a "), prop("density", "density"), Lit(" of "),
        q(v / 100, "g/cm3"), Lit(".")))
      case 2 => build(Seq(formula("ΔH fus", "enthalpy"), Lit(" of "), chem(c),
        Lit(" was measured at "), q(v, "kJ/mol"), Lit(".")))
      case 3 => build(Seq(Lit("The "), prop("detonation velocity", "velocity"), Lit(" of "),
        chem(c), Lit(" reached "), q(v * 10, "m/s"), Lit(".")))
      case 4 => build(Seq(chem(c), Lit(" "), prop("decomposes at", "temperature"), Lit(" "),
        q(v, "°C"), Lit(".")))
      case 5 => build(Seq(Lit("The "), prop("heat capacity", "heat capacity"), Lit(" of "),
        chem(c), Lit(" is "), q(v / 100, "J/(g·K)"), Lit(".")))
      case 6 => build(Seq(Mention("Thermal stability", "PROP", "thermal"), Lit(" of "), chem(c),
        Lit(" was maintained up to "), q(v, "°C"), Lit(".")))
      case 7 => build(Seq(Lit("The "), prop("vapor pressure", "pressure"), Lit(" of "), chem(c),
        Lit(" is "), q(v, "kPa"), Lit(".")))
      case 8 => build(Seq(Lit("The "), prop("activation energy", "energy"), Lit(" ("),
        formula("ΔG", "energy"), Lit(") of "), chem(c), Lit(" is "),
        q(v, "kJ/mol"), Lit(".")))
      case 9 => build(Seq(Lit(s"the "), prop("thermal decomposition", "thermal"), Lit(s" of "),
        chem(c), Lit(" occurs around "), qi(v, v2, "°C"), Lit(".")))
      case 10 => build(Seq(Lit("The "), prop("solubility", "density"), Lit(" of "), chem(c),
        Lit(" in "), chem("water"), Lit(" is "), q(v / 10, "g/L"), Lit(".")))
      case 11 => build(Seq(Lit("The "), prop("density", "density"), Lit(" of "),
        chem("high density polyethylene"), Lit(" is "), q(v / 400, "g/cm3"), Lit(".")))
      case 12 => build(Seq(Lit("Samples of "), chem("compound 95"), Lit(" melted at "),
        q(v + 200, "K"), Lit(" after approx. "), q(v / 10, "min"), Lit(".")))
      case 13 => build(Seq(Lit("A mixture was prepared with "),
        q(v / 10, "mL"), Lit(" of "), chem("ethanol"),
        Lit(" and "), q(v / 20, "g"), Lit(" of "), chem(c), Lit(".")))
      case 14 => build(Seq(formula("Tc =", "temperature"), Lit(" "),
        q(v, "K"), Lit(" for "), chem(c), Lit(" single crystals.")))
      case 15 =>
        // char-normalization quirk: html carries " ¼", text carries "="
        // (pdf_parser.py:113-114)
        val g = build(Seq(formula("Tc=", "temperature"), Lit(" "),
          q(v, "K"), Lit(" was found for "), chem(c), Lit(".")))
        g.copy(htmlText = g.text.replace("Tc=", "Tc ¼"))
      // ---- negatives ----
      case 16 => build(Seq(Lit("The "), prop("toxicity", "toxicity"), Lit(" of "), chem(c),
        Lit(" is still under review."))) // P3 drop: no quantity
      case 17 => build(Seq(Lit(s"Batch ${pick(i, s"b:$slot", 90) + 10} was stored in the dark for later analysis.")))
      case 18 => build(Seq(Lit("The "), prop("density", "density"), Lit(" of "), chem(c),
        Lit(" was reported previously at "), q(v, "kPa"), Lit(".")))
      // unit-incompat: P3 drops sentence (density needs DENSITY/SOLUBILITY)
      case 19 =>
        val filler = "the procedure was repeated with an inert filler material and "
        build(Seq(chem(c), Lit(" was combined as follows: " + filler * 18 + "the product was "),
          prop("stable up to", "temperature"), Lit(" "), q(v, "°C"), Lit(".")))
      // distance cap: chem >100 tokens from value -> no chem edge ->
      // requireChem drops the tuple
      case 20 =>
        // Schwartz-Hearst abbreviation definition + a global re-match
        // occurrence (M5/W4); both HDPE surfaces are gold CHEM because
        // the gazetteer carries the synonym
        build(Seq(Lit("Samples of "), chem("high density polyethylene"), Lit(" ( "),
          chem("HDPE"), Lit(" ) were prepared; "), chem("HDPE"), Lit(" showed a "),
          prop("density", "density"), Lit(" of "), q(v / 400, "g/cm3"), Lit(".")))
      case _ => build(Seq(Lit("Supplementary data are provided in the appendix.")))
    }
  }

  val TemplateBankSize = 22

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

  final case class GoldPage(page: Page, sentences: Array[Sentence])

  private val SectionPlan: Array[(String, Array[Int])] = Array(
    ("Abstract", Array(2)), // 1 paragraph of 2 sentences
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

    val goldSents = ArrayBuffer.empty[(String, GoldSentence)] // (section, gold)
    val htmlSections = ArrayBuffer.empty[Html.Section]
    val textSections = ArrayBuffer.empty[Html.Section]

    if (lang == "en") {
      SectionPlan.foreach { case (heading, paras) =>
        val htmlParas = ArrayBuffer.empty[String]
        val textParas = ArrayBuffer.empty[String]
        paras.zipWithIndex.foreach { case (nSents, p) =>
          val gs = (0 until nSents).map { s =>
            val slot = s"$heading:$p:$s"
            val c = if (pick(i, s"useP:$slot", 100) < 40) primary else chemSurface(i, slot)
            val t = pick(i, s"tpl:$slot", TemplateBankSize)
            val g = template(t, i, c, slot)
            goldSents += ((heading, g))
            g
          }
          htmlParas += gs.map(_.htmlText).mkString(" ")
          textParas += gs.map(_.text).mkString(" ")
        }
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

    val htmlDoc = Html.ExtractedDoc(title, doi, htmlSections.toArray)
    val textDoc = Html.ExtractedDoc(title, doi, textSections.toArray)
    val page = Page(url, new Timestamp(1700000000000L + i * 60000L),
      Html.render(htmlDoc), textDoc.text, lang)

    val sentences = goldSents.zipWithIndex.map { case ((section, g), sid) =>
      val toks = Text.tokenize(g.text)
      val rels = Relations.relate(g.ents)
      Sentence(url, i, sid, section, title, doi, g.text, toks, g.ents, rels)
    }.toArray
    GoldPage(page, sentences)
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
  val GeneratorVersion = 2

  def materializedPages(spark: SparkSession, n: Long, baseDir: String = "/tmp/graft_pages")
      : Dataset[Page] = {
    import spark.implicits._
    val dir = s"$baseDir/v$GeneratorVersion-n=$n"
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir + "/_SUCCESS"))) {
      // 256 files: parquet tasks can't split below row-group (≈file)
      // granularity here, so file count bounds scan parallelism
      pages(spark, n, partitions = 256).write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir).as[Page]
  }

  def goldSentences(spark: SparkSession, n: Long): Dataset[Sentence] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .flatMap(i => genPage(i).sentences)
  }

  /** Gold triples = documented rules applied to gold mentions: P3 filter
    * then tuple assembly at threshold 0.45 (the reference lifecycle,
    * corpus.py:92-94 + tuples.py:59-87).
    */
  def goldTriples(spark: SparkSession, n: Long): Dataset[Triple] = {
    import spark.implicits._
    goldSentences(spark, n)
      .filter(s => Relations.keepDoc(s.ents))
      .flatMap(s => Triples.assemble(s))
  }
}
