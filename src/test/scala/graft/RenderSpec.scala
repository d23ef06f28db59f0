package graft

import graft.model._
import graft.operators.Render
import graft.plans.Pipeline
import graft.sources.{ChemDict, PageGen}
import org.scalatest.funsuite.AnyFunSuite

/** Char-exact goldens for the displacy relation renderer
  * (cprex/displacy/render.py RelRenderer + templates.py). Expected
  * strings are hand-assembled here, independently of Render's template
  * constants, so a transcription slip in either side fails the test.
  */
class RenderSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def ent(startTok: Int, startChar: Int, endChar: Int, text: String,
      label: String): Ent =
    Ent(startTok, startTok + 1, startChar, endChar, text, label, "", Double.NaN, "")

  private def sent(text: String, ents: Array[Ent], rels: Array[RelEdge]): Sentence =
    Sentence("u", 0L, 0, "Results", "t", "d", text,
      tokens = Array.empty, ents = ents, rels = rels)

  // ---- hand-assembled expected building blocks (independent of Render.Tpl*) ----

  private def mark(bg: String, text: String, label: String): String =
    "\n<mark class=\"entity\" style=\"background: " + bg +
      "; padding: 0.45em 0.6em; margin: 0 0.25em; line-height: 1; border-radius: 0.35em;display: inline-block;\">\n    " +
      text +
      "\n    <span style=\"font-size: 0.8em; font-weight: bold; line-height: 1; border-radius: 0.35em; vertical-align: middle; margin-left: 0.5rem\">" +
      label + "</span>\n</mark>\n"

  private def slice(bg: String, top: Int): String =
    "\n<span style=\"background: " + bg + "; top: " + top +
      "px; height: 4px; left: -1px; width: calc(100% + 4px); position: absolute;\">\n</span>\n"

  private def startArc(bg: String, top: Int, label: String): String =
    "\n<span style=\"background: " + bg + "; top: " + top +
      "px; height: 4px; border-top-left-radius: 3px; border-bottom-left-radius: 3px; left: -1px; width: calc(100% + 4px); position: absolute;\">\n    <span style=\"background: " +
      bg + "; z-index: 10; color: #000; top: -0.5em; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        " +
      label + "\n    </span>\n</span>\n"

  private def endArc(bg: String, top: Int): String =
    "\n<span style=\"background: " + bg + "; top: " + top +
      "px; height: 4px; left: -1px; width: calc(100% - 20px); position: absolute;\">\n    <span style=\"background: " +
      bg + "; z-index: 10; color: " + bg +
      "; bottom: 0px; right: 0px; padding: 2px 3px; position: absolute; font-size: 0.6em; font-weight: bold; line-height: 1; border-radius: 3px\">\n        |\n    </span>\n</span>\n"

  private def spanWrap(height: Int, text: String, slices: String, starts: String): String =
    "\n<span style=\"display: inline-block; position: relative; height: " + height +
      "px;\">\n    " + text + "\n    " + slices + "\n    " + starts + "\n</span>\n"

  private def entsDiv(content: String): String =
    "\n<div class=\"entities\" style=\"line-height: 2.5; direction: ltr\">" + content + "</div>\n"

  test("golden: ltr relation renders start/slice/end arcs char-exact") {
    val s = sent("water melts at 0 K.",
      Array(ent(0, 0, 5, "water", "CHEM"), ent(3, 15, 18, "0 K", "TEMPERATURE")),
      Array(RelEdge(0, 3, "has_value", 0.5)))
    val (html, frags) = Render.renderSentence(s)

    val g = "#7fc97f" // ColorScale(0)
    val expected = entsDiv(
      spanWrap(60, mark("pink", "water", "CHEM"), slice(g, 40),
        startArc(g, 40, "has_value (0.50)")) +
        spanWrap(60, " melts at ", slice(g, 40), "") +
        spanWrap(60, mark("#7aecec", "0 K", "TEMPERATURE"), endArc(g, 40), "") +
        ".")
    assert(html == expected)

    assert(frags.map(f => (f.fragIdx, f.kind, f.text, f.label, f.bg,
      f.nRels, f.nHead, f.nTail, f.maxSlot)) == Seq(
      (0, "ent", "water", "CHEM", "pink", 1, 1, 0, 1),
      (1, "text", " melts at ", "", "", 1, 0, 0, 1),
      (2, "ent", "0 K", "TEMPERATURE", "#7aecec", 1, 0, 1, 1),
      (3, "text", ".", "", "", 0, 0, 0, 0)))
  }

  test("rtl relation (head after tail) uses inverted end+start templates") {
    // value first, chem later: arrow points backwards (render.py:378,389)
    val s = sent("at 0 K, water melts.",
      Array(ent(1, 3, 6, "0 K", "TEMPERATURE"), ent(4, 8, 13, "water", "CHEM")),
      Array(RelEdge(4, 1, "has_value", 0.47)))
    val (html, frags) = Render.renderSentence(s)

    // open-at-tail: inverted end slice (margin-left: 20px, pipe on left)
    assert(html.contains("width: calc(100% - 20px); position: absolute; margin-left: 20px;"))
    assert(html.contains("bottom: 0px; left: 0px;"))
    // close-at-head: inverted start (label box right-aligned, width +2px)
    assert(html.contains("right: -2px;"))
    assert(html.contains("width: calc(100% + 2px)"))
    assert(html.contains("has_value (0.47)"))
    // no non-inverted start/end variants anywhere
    assert(!html.contains("width: calc(100% + 4px); position: absolute;\">\n    <span"))
    assert(html.contains("at ")) // leading text fragment plain

    assert(frags.map(f => (f.kind, f.nRels, f.nHead, f.nTail)) == Seq(
      ("text", 0, 0, 0), ("ent", 1, 0, 1), ("text", 1, 0, 0),
      ("ent", 1, 1, 0), ("text", 0, 0, 0)))
  }

  test("overlapping relations stack slots; freed slot is not reused within the closing fragment") {
    // A--C and B--D overlap: B opens on slot 2 (top 57), heights go to 77;
    // D closes slot 2 and opens D--E, which reuses freed slot 1.
    val t = "A x B y C z D w E."
    //       0 2 4 6 8 ...  A=0,B=4,C=8,D=12,E=16
    val es = Array(
      ent(0, 0, 1, "A", "CHEM"), ent(2, 4, 5, "B", "CHEM"),
      ent(4, 8, 9, "C", "TEMPERATURE"), ent(6, 12, 13, "D", "TEMPERATURE"),
      ent(8, 16, 17, "E", "TEMPERATURE"))
    val rs = Array(
      RelEdge(0, 4, "has_value", 0.5), // A -> C  slot 1
      RelEdge(2, 6, "has_value", 0.5), // B -> D  slot 2
      RelEdge(6, 8, "has_value", 0.5)) // D -> E  (D is head) reuses slot 1
    val (html, frags) = Render.renderSentence(sent(t, es, rs))

    assert(html.contains("height: 77px")) // 40 + 20 + 17
    assert(html.contains("top: 57px"))    // slot 2 offset
    val byIdx = frags.map(f => (f.kind, f.text, f.nRels, f.maxSlot))
    assert(byIdx == Seq(
      ("ent", "A", 1, 1), ("text", " x ", 1, 1),
      ("ent", "B", 2, 2), ("text", " y ", 2, 2),
      ("ent", "C", 2, 2), ("text", " z ", 1, 2),
      ("ent", "D", 2, 2), // closes slot-2 B--D, opens slot-1 D--E
      ("text", " w ", 1, 1),
      ("ent", "E", 1, 1), ("text", ".", 0, 0)))
  }

  test("whitespace-only inter-entity text drops; trailing empty fragment kept") {
    val s = sent("A B",
      Array(ent(0, 0, 1, "A", "CHEM"), ent(1, 2, 3, "B", "CHEM")),
      Array.empty)
    val (html, frags) = Render.renderSentence(s)
    assert(frags.map(f => (f.fragIdx, f.kind, f.text)) == Seq(
      (0, "ent", "A"), (1, "ent", "B"), (2, "text", "")))
    // the single space between the marks is GONE from the markup
    assert(html == entsDiv(mark("pink", "A", "CHEM") + mark("pink", "B", "CHEM")))
  }

  test("escape_html: & < > \" escaped in order, in both entity and text fragments") {
    val s = sent("H&M <q> \"x\"",
      Array(ent(0, 0, 3, "H&M", "CHEM")), Array.empty)
    val (html, frags) = Render.renderSentence(s)
    assert(frags(0).text == "H&amp;M")
    assert(frags(1).text == " &lt;q&gt; &quot;x&quot;")
    assert(html == entsDiv(mark("pink", "H&amp;M", "CHEM") + " &lt;q&gt; &quot;x&quot;"))
  }

  test("unknown label falls back to default color; lookup is case-insensitive") {
    val s = sent("X y",
      Array(ent(0, 0, 1, "X", "MYSTERY")), Array.empty)
    val (_, frags) = Render.renderSentence(s)
    assert(frags(0).bg == "#ddd")
    val s2 = sent("X y", Array(ent(0, 0, 1, "X", "chem")), Array.empty)
    assert(Render.renderSentence(s2)._2.head.bg == "pink")
  }

  test("relations below threshold are not rendered") {
    val s = sent("water melts at 0 K.",
      Array(ent(0, 0, 5, "water", "CHEM"), ent(3, 15, 18, "0 K", "TEMPERATURE")),
      Array(RelEdge(0, 3, "has_value", 0.44)))
    val (html, frags) = Render.renderSentence(s)
    assert(!html.contains("has_value"))
    assert(frags.forall(_.nRels == 0))
  }

  test("score label formatting matches python .02f half-even") {
    assert(Render.fmt2(0.5) == "0.50")
    assert(Render.fmt2(0.455) == "0.46") // 0.455 binary is 0.45500000000000001554...
    assert(Render.fmt2(0.445) == "0.45") // 0.445 binary is 0.44500000000000000622...
    assert(Render.fmt2(1.0) == "1.00")
    assert(Render.fmt2(0.07500000000000001) == "0.08")
  }

  test("title rule: h2 only when section changes (render_docs)") {
    import spark.implicits._
    val rows = Seq(
      sent("a b", Array.empty, Array.empty).copy(sentId = 0, section = "Intro"),
      sent("c d", Array.empty, Array.empty).copy(sentId = 1, section = "Intro"),
      sent("e f", Array.empty, Array.empty).copy(sentId = 2, section = "Results"))
    val out = Render.html(spark.createDataset(rows)).orderBy("sent_id")
      .collect().map(r => (r.getInt(1), r.getString(3)))
    assert(out(0)._2.startsWith("\n<h2 style=\"margin: 0\">Intro</h2>\n"))
    assert(!out(1)._2.contains("<h2"))
    assert(out(2)._2.startsWith("\n<h2 style=\"margin: 0\">Results</h2>\n"))
  }

  test("htmlContiguous: identical to windowed html on pipeline layout, zero exchange, loud on violation") {
    import spark.implicits._
    val annotated = Pipeline.annotate(
      Pipeline.sentences(PageGen.pages(spark, 40)),
      ChemDict.entries.flatMap(_.synonyms)).cache()
    try {
      val windowed = Render.html(annotated).collect().map(_.toSeq).toSet
      val contiguous = Render.htmlContiguous(annotated).collect().map(_.toSeq).toSet
      assert(windowed == contiguous)
      assert(contiguous.nonEmpty)
      // the whole point: the corpus never rides an exchange
      val plan = Render.htmlContiguous(annotated).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"contiguous render plan shuffles:\n$plan")
      assert(Render.html(annotated).queryExecution.executedPlan.toString
        .contains("Exchange")) // and the generic path does (sanity of the assertion)
    } finally { annotated.unpersist(); () }
    // interleaved urls in one partition: refuse loudly, don't mis-title
    val bad = Seq(
      sent("a b", Array.empty, Array.empty),
      sent("c d", Array.empty, Array.empty).copy(url = "u2"),
      sent("e f", Array.empty, Array.empty).copy(sentId = 1))
    val ex = intercept[Exception] {
      Render.htmlContiguous(spark.createDataset(bad).coalesce(1)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("e2e over generated pages: mark count == entity count; partition-invariant") {
    import spark.implicits._
    val annotated = Pipeline.annotate(
      Pipeline.sentences(PageGen.pages(spark, 50)),
      ChemDict.entries.flatMap(_.synonyms)).cache()
    try {
      val perSent = annotated.map(s =>
        (s.url, s.sentId, s.ents.length,
          Render.renderSentence(s)._1.sliding(5).count(_ == "<mark")))
        .collect()
      assert(perSent.nonEmpty)
      perSent.foreach { case (u, i, nEnts, nMarks) =>
        assert(nEnts == nMarks, s"$u#$i: $nEnts ents but $nMarks marks")
      }
      val f1 = Render.fragments(annotated).collect().map(_.toSeq).toSet
      val f2 = Render.fragments(annotated.repartition(7)).collect().map(_.toSeq).toSet
      assert(f1 == f2)
      assert(f1.nonEmpty)
    } finally { annotated.unpersist(); () }
  }
}
