package graft.functions

import scala.collection.mutable.ArrayBuffer

/** HTML render/extract pair for the synthesized Common-Crawl-style page
  * table.
  *
  * The north-rule invariant is "byte-identical extracted text per url"
  * (BASELINE.json input_hint). We control both sides: the generator
  * renders `html` FROM the section/sentence text via the fixed template
  * below, and `extract` inverts it, so `extract(render(doc)).text ==
  * doc.text` holds by construction and is asserted byte-for-byte in
  * tests (FIXTURES.md §1).
  *
  * The extractor replaces the reference's GROBID PDF→TEI step
  * (cprex/parser/pdf_parser.py:39-75,225-244): title/doi metadata +
  * (heading, paragraphs[sentences]) sections, with the reference's
  * char normalization (pdf_parser.py:113-114) applied to every fragment.
  *
  * Implementation is a single linear scan (no DOM, no regex) — this
  * runs once per row over 10^12 rows, so per-row cost dominates; a
  * hand-rolled scanner keeps it allocation-light and branch-predictable.
  */
object Html {

  final case class Section(heading: String, paragraphs: Array[String])
  final case class ExtractedDoc(title: String, doi: String, sections: Array[Section]) {

    /** Canonical text serialization: sections joined by "\n\n", each
      * section = heading + "\n" + paragraphs joined by "\n".
      */
    def text: String =
      sections.map(s => s.heading + "\n" + s.paragraphs.mkString("\n")).mkString("\n\n")
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        if (s.startsWith("&amp;", i)) { sb.append('&'); i += 5 }
        else if (s.startsWith("&lt;", i)) { sb.append('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { sb.append('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { sb.append('"'); i += 6 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Render a page to html bytes (UTF-8). Fixed template — the page
    * generator's single source of html shape.
    */
  def render(doc: ExtractedDoc): Array[Byte] = {
    val sb = new StringBuilder(1024)
    sb.append("<html><head><meta charset=\"utf-8\"/><title>")
      .append(escape(doc.title))
      .append("</title></head><body>\n<article data-doi=\"")
      .append(escape(doc.doi))
      .append("\">\n<h1>").append(escape(doc.title)).append("</h1>\n")
    doc.sections.foreach { sec =>
      sb.append("<section><h2>").append(escape(sec.heading)).append("</h2>\n")
      sec.paragraphs.foreach { p =>
        sb.append("<p>").append(escape(p)).append("</p>\n")
      }
      sb.append("</section>\n")
    }
    sb.append("</article>\n</body></html>")
    sb.toString.getBytes("UTF-8")
  }

  private def between(s: String, open: String, close: String, from: Int): Option[(String, Int)] = {
    val a = s.indexOf(open, from)
    if (a < 0) return None
    val b = s.indexOf(close, a + open.length)
    if (b < 0) return None
    Some((s.substring(a + open.length, b), b + close.length))
  }

  /** Extract title, doi and sections from html bytes. Applies
    * `Text.normalize` (F1) to every fragment — part of the invariant.
    */
  def extract(html: Array[Byte]): ExtractedDoc = {
    val s = new String(html, "UTF-8")
    val title = between(s, "<title>", "</title>", 0)
      .map(t => Text.normalize(unescape(t._1))).getOrElse("")
    val doi = between(s, "data-doi=\"", "\"", 0)
      .map(t => unescape(t._1)).getOrElse("")
    val sections = ArrayBuffer.empty[Section]
    var pos = 0
    var continue = true
    while (continue) {
      val secStart = s.indexOf("<section>", pos)
      if (secStart < 0) continue = false
      else {
        val secEnd = s.indexOf("</section>", secStart)
        val end = if (secEnd < 0) s.length else secEnd
        val heading = between(s, "<h2>", "</h2>", secStart)
          .filter(_._2 <= end)
          .map(t => Text.normalize(unescape(t._1))).getOrElse("")
        val paras = ArrayBuffer.empty[String]
        var p = secStart
        var inner = true
        while (inner) {
          between(s, "<p>", "</p>", p) match {
            case Some((body, next)) if next <= end + "</p>".length && s.indexOf("<p>", p) < end =>
              paras += Text.normalize(unescape(body))
              p = next
            case _ => inner = false
          }
        }
        sections += Section(heading, paras.toArray)
        pos = end + "</section>".length
      }
    }
    ExtractedDoc(title, doi, sections.toArray)
  }

  /** Convenience: full extracted text from html bytes. */
  def extractText(html: Array[Byte]): String = extract(html).text
}
