package graft.operators

import graft.model.Sentence
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lag}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** The reference's displacy relation renderer re-expressed as a per-row
  * Spark operator: entities highlighted as `<mark>` fragments and scored
  * relations drawn as stacked arc segments under the text
  * (cprex/displacy/render.py:226-506 `RelRenderer`, templates from
  * cprex/displacy/templates.py:3-61 verbatim).
  *
  * The whole render is in-row string assembly over an annotated
  * `Sentence` — zero shuffle; at 10^12 pages this stage fuses into the
  * annotate map like every other per-row stage. The only cross-row state
  * the reference has is the section-title dedup of `render_docs`
  * (render.py:109-118: a doc gets a title iff its section differs from
  * the previous doc's) — that becomes a `lag` window over (url, sentId),
  * the narrowest possible exchange (url-partitioned, two small string
  * columns).
  *
  * Determinism: the reference keys relations with `uuid4()`
  * (render.py:198,217) but the ids never reach the markup — they are
  * only dict keys — so the HTML itself is deterministic; we use the
  * in-row entity/relation indexes as ids and the output is char-exact
  * to the reference's (RenderSpec goldens).
  *
  * Oracle strategy: the sequential open-relation state machine
  * (render.py:336-411 `_assemble_per_fragment_info`) is exposed as a
  * per-fragment row dump (`fragments`) whose text/label/color/
  * relation-topology columns are recomputed independently in DuckDB
  * from the kg_sentences + kg_entities + kg_relations dumps
  * (interval-cover counting); the greedy render-slot assignment
  * (render.py:502-506) is path-dependent and is covered by char-exact
  * golden specs instead.
  */
object Render {

  // ---- option defaults (render.py:33-35, 250-254) ----
  val DefaultLang = "en"
  val DefaultDir = "ltr"
  val DefaultEntityColor = "#ddd"
  val TopOffset = 40
  val SpanLabelOffset = 20
  val OffsetStep = 17
  val DefaultThreshold = 0.45 // render.py:207

  /** Verbatim label→color map (render.py:36-54). */
  val DefaultLabelColors: Map[String, String] = Map(
    "CHEM" -> "pink",
    "PROP" -> "#feca74",
    "FORMULA" -> "#c887fb",
    "TEMPERATURE" -> "#7aecec",
    "DENSITY" -> "#7aecec",
    "TIME" -> "#ddd",
    "PERCENT" -> "#ddd",
    "ENTHALPY" -> "#7aecec",
    "MOLAR VOLUME" -> "#7aecec",
    "ABSORPTIVITY" -> "#7aecec",
    "SOLUBILITY" -> "#7aecec",
    "ENERGY" -> "#7aecec",
    "MAXIMUM ENERGY PRODUCT" -> "#7aecec",
    "VELOCITY" -> "#7aecec",
    "HEAT CAPACITY" -> "#7aecec",
    "THERMAL CONDUCTIVITY" -> "#7aecec",
    "DYNAMIC VISCOSITY" -> "#7aecec"
  )

  /** Verbatim arc color scale (render.py:55-64). */
  val ColorScale: IndexedSeq[String] = IndexedSeq(
    "#7fc97f", "#beaed4", "#fdc086", "#ffff99",
    "#386cb0", "#f0027f", "#bf5b17", "#666666")

  // ---- templates, verbatim (cprex/displacy/templates.py:3-61; the
  // page/figure/title/ents wrappers are spaCy's public displacy
  // templates, stable across releases) ----
  // Quirk kept: "border-radius: 0.35em;display" (no space) in TPL_ENT.
  val TplEnt: String =
    "\n<mark class=\"entity\" style=\"background: {bg}; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em;display: inline-block;\">\n    {text}\n    <span style=\"font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-left: 0.5rem\">{label}{kb_link}</span>\n</mark>\n"

  val TplSpan: String =
    "\n<span style=\"display: inline-block; position: relative; height: {total_height}px;\">\n    {text}\n    {span_slices}\n    {span_starts}\n</span>\n"

  val TplSpanSlice: String =
    "\n<span style=\"background: {bg}; top: {top_offset}px; height: 4px; left: -1px; width: calc(100% + 4px); position: absolute;\">\n</span>\n"

  val TplSpanStart: String =
    "\n<span style=\"background: {bg}; top: {top_offset}px; height: 4px; border-top-left-radius: 3px; border-bottom-left-radius: 3px; left: -1px; width: calc(100% + 4px); position: absolute;\">\n    <span style=\"background: {bg}; z-index: 10; color: #000; top: -0.5em; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        {label}{kb_link}\n    </span>\n</span>\n"

  val TplSpanStartInv: String =
    "\n<span style=\"background: {bg}; top: {top_offset}px; height: 4px; border-top-left-radius: 3px; border-bottom-left-radius: 3px; left: -1px; width: calc(100% + 2px); position: absolute;\">\n    <span style=\"background: {bg}; z-index: 10; color: #000; top: -0.5em; right: -2px; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        {label}{kb_link}\n    </span>\n</span>\n"

  val TplSpanEnd: String =
    "\n<span style=\"background: {bg}; top: {top_offset}px; height: 4px; left: -1px; width: calc(100% - 20px); position: absolute;\">\n    <span style=\"background: {bg}; z-index: 10; color: {bg}; bottom: 0px; right: 0px; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        |\n    </span>\n</span>\n"

  val TplSpanEndInv: String =
    "\n<span style=\"background: {bg}; top: {top_offset}px; height: 4px; left: -1px; width: calc(100% - 20px); position: absolute; margin-left: 20px;\">\n    <span style=\"background: {bg}; z-index: 10; color: {bg}; bottom: 0px; left: 0px; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        |\n    </span>\n</span>\n"

  val TplEnts: String =
    "\n<div class=\"entities\" style=\"line-height: 2.5; direction: {dir}\">{content}</div>\n"

  val TplTitle: String = "\n<h2 style=\"margin: 0\">{title}</h2>\n"

  /** Single-pass `{name}` substitution — Python str.format semantics for
    * these templates (substituted values are never re-scanned, so text
    * containing literal braces renders verbatim, as it does upstream).
    */
  private[operators] def fill(template: String, vars: Map[String, String]): String = {
    val sb = new java.lang.StringBuilder(template.length + 64)
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '{') {
        val close = template.indexOf('}', i)
        sb.append(vars(template.substring(i + 1, close)))
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** spaCy's escape_html: &, <, >, " in that order. */
  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Python `f"{p:.02f}"`: correctly-rounded decimal of the binary
    * double, half-even — BigDecimal over the exact double value.
    */
  def fmt2(x: Double): String =
    new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** One fragment of the assembled per-fragment info
    * (render.py:336-411): either inter-entity text (`kind="text"`,
    * label/bg empty) or an entity mark (`kind="ent"`). `text` is
    * HTML-escaped. nRels counts relations attached to the fragment
    * (touching + passing-through), nHead/nTail the touching ends,
    * maxSlot the highest render slot among them (0 when none).
    */
  final case class Frag(
      fragIdx: Int,
      kind: String,
      text: String,
      label: String,
      bg: String,
      nRels: Int,
      nHead: Int,
      nTail: Int,
      maxSlot: Int)

  private final case class RelIn(id: Int, headEnt: Int, tailEnt: Int, label: String)

  private final case class FragRel(
      slot: Int,
      label: String,
      color: String,
      touching: Boolean,
      isHead: Boolean,
      isTail: Boolean,
      rtl: Boolean)

  /** render.py:502-506. */
  private def slotAndColor(taken: mutable.Set[Int]): (Int, String) = {
    var s = 1
    while (taken.contains(s)) s += 1
    (s, ColorScale((s - 1) % ColorScale.length))
  }

  /** Port of `_assemble_per_fragment_info` + `_render_markup` +
    * `render_spans` for one sentence. Returns (html, fragments).
    * Entities are normalized to (startChar, endChar) order (render.py:178
    * manual-mode sort; doc.ents is already start-ordered upstream).
    */
  def renderSentence(s: Sentence, threshold: Double = DefaultThreshold,
      title: Option[String] = None): (String, Seq[Frag]) = {
    val ents = s.ents.sortBy(e => (e.startChar, e.endChar))
    // ent_start_to_id keyed on TOKEN start (render.py:203 uses ent.start,
    // the spaCy token index, while spans carry char offsets)
    val tokToIdx = ents.zipWithIndex.map { case (e, i) => e.startTok -> i }.toMap
    val rels: Array[RelIn] = s.rels.iterator.zipWithIndex.collect {
      case (r, i) if r.score >= threshold =>
        RelIn(i, tokToIdx(r.headTok), tokToIdx(r.tailTok),
          s"${r.label} (${fmt2(r.score)})")
    }.toArray

    val fragMeta = ArrayBuffer.empty[Frag]
    val markup = new java.lang.StringBuilder
    // open_relations: rel id → (slot, label, color); insertion-ordered
    // like the Python dict (render.py:344)
    val open = mutable.LinkedHashMap.empty[Int, (Int, String, String)]
    var offset = 0
    var fragIdx = 0

    def emit(kind: String, text: String, label: String, bg: String,
        fr: Seq[FragRel]): Unit = {
      val content =
        if (kind == "ent")
          fill(TplEnt, Map("bg" -> bg, "text" -> text, "label" -> label, "kb_link" -> ""))
        else text
      if (fr.nonEmpty) {
        val slices = fr.map { r =>
          val top = TopOffset + OffsetStep * (r.slot - 1)
          if (r.touching && r.isTail && r.rtl)
            fill(TplSpanEndInv, Map("bg" -> r.color, "top_offset" -> top.toString))
          else if (r.touching && r.isTail)
            fill(TplSpanEnd, Map("bg" -> r.color, "top_offset" -> top.toString))
          else
            fill(TplSpanSlice, Map("bg" -> r.color, "top_offset" -> top.toString))
        }.mkString
        val starts = fr.map { r =>
          val top = TopOffset + OffsetStep * (r.slot - 1)
          if (r.touching && r.isHead && r.rtl)
            fill(TplSpanStartInv, Map("bg" -> r.color, "top_offset" -> top.toString,
              "label" -> r.label, "kb_link" -> ""))
          else if (r.touching && r.isHead)
            fill(TplSpanStart, Map("bg" -> r.color, "top_offset" -> top.toString,
              "label" -> r.label, "kb_link" -> ""))
          else ""
        }.mkString
        val maxSlot = fr.map(_.slot).max
        val totalHeight = TopOffset + SpanLabelOffset + OffsetStep * (maxSlot - 1)
        markup.append(fill(TplSpan, Map("text" -> content,
          "span_slices" -> slices, "span_starts" -> starts,
          "total_height" -> totalHeight.toString)))
        fragMeta += Frag(fragIdx, kind, text, label, bg, fr.size,
          fr.count(r => r.touching && r.isHead), fr.count(r => r.touching && r.isTail),
          maxSlot)
      } else {
        markup.append(content)
        fragMeta += Frag(fragIdx, kind, text, label, bg, 0, 0, 0, 0)
      }
      fragIdx += 1
    }

    ents.zipWithIndex.foreach { case (ent, entIdx) =>
      val offsetText = s.text.substring(offset, ent.startChar)
      // whitespace-only inter-entity text is DROPPED (render.py:348) —
      // Python str.strip(); generated corpora are ASCII so trim matches
      if (offsetText.trim.nonEmpty)
        emit("text", escapeHtml(offsetText), "", "",
          open.values.map { case (slot, lbl, colr) =>
            FragRel(slot, lbl, colr, touching = false, isHead = false,
              isTail = false, rtl = false)
          }.toSeq)

      val bg = DefaultLabelColors.getOrElse(ent.label.toUpperCase, DefaultEntityColor)
      val taken = mutable.Set.empty[Int] ++ open.values.map(_._1)
      val fragRels = ArrayBuffer.empty[FragRel]
      rels.foreach { rel =>
        if (rel.headEnt == entIdx || rel.tailEnt == entIdx) {
          val (slot, color, rtl) =
            open.remove(rel.id) match {
              case Some((s0, _, c0)) => (s0, c0, rel.headEnt == entIdx) // closing
              case None => // opening
                val (s0, c0) = slotAndColor(taken)
                taken += s0
                open(rel.id) = (s0, rel.label, c0)
                (s0, c0, rel.tailEnt == entIdx)
            }
          fragRels += FragRel(slot, rel.label, color, touching = true,
            isHead = rel.headEnt == entIdx, isTail = rel.tailEnt == entIdx, rtl = rtl)
        } else open.get(rel.id).foreach { case (slot, lbl, colr) =>
          fragRels += FragRel(slot, lbl, colr, touching = false,
            isHead = false, isTail = false, rtl = false)
        }
      }
      emit("ent", escapeHtml(s.text.substring(ent.startChar, ent.endChar)),
        ent.label, bg, fragRels.toSeq)
      offset = ent.endChar
    }
    // trailing fragment appended unconditionally, even when empty
    // (render.py:410 — no strip check, no rels key)
    emit("text", escapeHtml(s.text.substring(offset)), "", "", Seq.empty)

    var html = fill(TplEnts, Map("content" -> markup.toString, "dir" -> DefaultDir))
    title.foreach(t => html = fill(TplTitle, Map("title" -> t)) + html)
    (html, fragMeta.toSeq)
  }

  /** Annotated sentences with the render_docs title rule resolved:
    * title = section iff it differs from the previous sentence's section
    * within the url (render.py:109-118), else null.
    */
  private def withTitle(annotated: Dataset[Sentence]): Dataset[(Sentence, String)] = {
    val spark = annotated.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("url")).orderBy(col("sentId"))
    annotated.toDF()
      .withColumn("prev_section", lag(col("section"), 1).over(w))
      .as[(String, Long, Int, String, String, String, String,
        Array[graft.model.Tok], Array[graft.model.Ent],
        Array[graft.model.RelEdge], Array[String], String, Boolean, String)]
      .map { t =>
        val s = Sentence(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9,
          t._10, t._11, t._12, t._13)
        val title = if (t._14 != t._4 && t._4 != "") t._4 else null
        (s, title)
      }
  }

  /** Per-sentence rendered markup: (url, sent_id, title, html) — one
    * `render_spans` output per row; page-level assembly is a
    * string_agg away and deliberately left to the consumer.
    *
    * This generic form is safe under ANY partitioning of `annotated`:
    * the title rule's lag rides a `Window.partitionBy(url)`, which
    * costs one url-keyed exchange of the full annotated rows (nested
    * token/ent/rel arrays). For pipeline-layout input — the only shape
    * the engine itself produces — use [[htmlContiguous]], which
    * computes the same titles with zero shuffle.
    */
  def html(annotated: Dataset[Sentence], threshold: Double = DefaultThreshold): DataFrame = {
    val spark = annotated.sparkSession
    import spark.implicits._
    withTitle(annotated).map { case (s, title) =>
      (s.url, s.sentId, title, renderSentence(s, threshold, Option(title))._1)
    }.toDF("url", "sent_id", "title", "html")
  }

  /** Zero-shuffle variant of [[html]] for pipeline-layout input.
    *
    * Precondition (what `Pipeline.sentences`/`annotate` produce by
    * construction): every url's sentences are contiguous and
    * sentId-ordered within one partition, because a page is ONE input
    * row and its sentences are emitted by one flatMap call — a url can
    * never span partitions or interleave with another. Under that
    * layout the title lag is a per-partition scan, so the corpus never
    * rides an exchange (at 10^12 pages the windowed form's url-keyed
    * shuffle of nested token arrays IS the cost of the query).
    *
    * The in-partition half of the precondition is guarded loudly: a
    * url recurring after another url fails the task rather than
    * mis-titling. (A url *split across* partitions — impossible for
    * pipeline output, possible after an external repartition — is not
    * detectable partition-locally; use [[html]] for arbitrary layouts.)
    */
  def htmlContiguous(annotated: Dataset[Sentence],
      threshold: Double = DefaultThreshold): DataFrame = {
    val spark = annotated.sparkSession
    import spark.implicits._
    annotated.mapPartitions { it =>
      val seen = mutable.HashSet.empty[String]
      var prevUrl: String = null
      var prevSection: String = null
      it.map { s =>
        if (s.url != prevUrl) {
          require(seen.add(s.url),
            s"pipeline-layout precondition violated: url ${s.url} recurs " +
              "after another url in this partition — use Render.html " +
              "(windowed) for arbitrary layouts")
          prevSection = null
        }
        val title = if (s.section != prevSection && s.section != "") s.section else null
        prevUrl = s.url
        prevSection = s.section
        (s.url, s.sentId, title, renderSentence(s, threshold, Option(title))._1)
      }
    }.toDF("url", "sent_id", "title", "html")
  }

  /** Per-fragment dump for the DuckDB oracle: (url, sent_id, frag_idx,
    * kind, frag_text, label, bg, n_rels, n_head, n_tail). maxSlot is
    * excluded — greedy slot assignment is path-dependent (not
    * SQL-recomputable) and is golden-tested in RenderSpec instead.
    */
  def fragments(annotated: Dataset[Sentence], threshold: Double = DefaultThreshold): DataFrame = {
    val spark = annotated.sparkSession
    import spark.implicits._
    annotated.flatMap { s =>
      renderSentence(s, threshold)._2.map(f =>
        (s.url, s.sentId, f.fragIdx, f.kind, f.text, f.label, f.bg,
          f.nRels, f.nHead, f.nTail))
    }.toDF("url", "sent_id", "frag_idx", "kind", "frag_text", "label", "bg",
      "n_rels", "n_head", "n_tail")
  }
}
