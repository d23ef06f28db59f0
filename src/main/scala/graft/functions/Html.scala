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

  /** One table row: ragged cells keyed c_0..c_n, where a cell with
    * colspan k advances the column index by k (reference
    * pdf_parser.py:193-222 `parse_table`, `cell.get("cols")`).
    */
  final case class TableRow(cells: Map[String, String])

  /** Article table (reference pdf_parser.py:21-25 Table(heading,
    * description, data)); description = figDesc paragraphs.
    */
  final case class Table(heading: String, description: Array[String],
      rows: Array[TableRow])

  /** Cells of a row in original left-to-right order (keys c_i sorted by
    * numeric column index).
    */
  def rowCellsInOrder(r: TableRow): Array[String] =
    r.cells.toArray.sortBy(kv => kv._1.drop(2).toInt).map(_._2)

  /** Canonical single-line serialization of a table row: cells joined
    * by tabs — also the text fed to the NLP stages for table rows.
    */
  def rowText(r: TableRow): String = rowCellsInOrder(r).mkString("\t")

  /** `abstractParas` is a DISTINCT field from `sections`, mirroring the
    * reference's Article.abstract vs Article.sections split
    * (pdf_parser.py:128-141) — consumers can tell abstract text apart
    * without relying on a section named "Abstract".
    */
  final case class ExtractedDoc(title: String, doi: String, sections: Array[Section],
      authors: Array[String] = Array.empty, pubDate: String = "",
      tables: Array[Table] = Array.empty,
      abstractParas: Array[String] = Array.empty) {

    /** Canonical text serialization: the abstract block first (rendered
      * with the literal "Abstract" heading), then sections joined by
      * "\n\n", each section = heading + "\n" + paragraphs joined by
      * "\n"; then each table as heading + description paragraphs + one
      * tab-joined line per row. Authors/pub_date are metadata fields,
      * not text.
      */
    def text: String = {
      val abs =
        if (abstractParas.isEmpty) Array.empty[String]
        else Array("Abstract\n" + abstractParas.mkString("\n"))
      val secs = sections.map(s => s.heading + "\n" + s.paragraphs.mkString("\n"))
      val tbls = tables.map { t =>
        (t.heading +: (t.description ++ t.rows.map(rowText))).mkString("\n")
      }
      (abs ++ secs ++ tbls).mkString("\n\n")
    }
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
      .append("</title>\n")
    doc.authors.foreach { a =>
      sb.append("<meta name=\"citation_author\" content=\"")
        .append(escape(a)).append("\"/>\n")
    }
    if (doc.pubDate.nonEmpty)
      sb.append("<meta name=\"citation_date\" content=\"")
        .append(escape(doc.pubDate)).append("\"/>\n")
    sb.append("</head><body>\n<article data-doi=\"")
      .append(escape(doc.doi))
      .append("\">\n<h1>").append(escape(doc.title)).append("</h1>\n")
    if (doc.abstractParas.nonEmpty) {
      sb.append("<section data-field=\"abstract\"><h2>Abstract</h2>\n")
      doc.abstractParas.foreach { p =>
        sb.append("<p>").append(escape(p)).append("</p>\n")
      }
      sb.append("</section>\n")
    }
    doc.sections.foreach { sec =>
      sb.append("<section><h2>").append(escape(sec.heading)).append("</h2>\n")
      sec.paragraphs.foreach { p =>
        sb.append("<p>").append(escape(p)).append("</p>\n")
      }
      sb.append("</section>\n")
    }
    doc.tables.foreach { t =>
      sb.append("<figure data-type=\"table\"><h3>").append(escape(t.heading))
        .append("</h3>\n<figcaption>")
      t.description.foreach(d => sb.append("<p>").append(escape(d)).append("</p>"))
      sb.append("</figcaption>\n<table>\n")
      t.rows.foreach { r =>
        sb.append("<tr>")
        val keys = r.cells.keysIterator.toArray.sortBy(_.drop(2).toInt)
        keys.zipWithIndex.foreach { case (k, pos) =>
          val idx = k.drop(2).toInt
          val nextIdx = if (pos + 1 < keys.length) keys(pos + 1).drop(2).toInt
            else idx + 1
          val span = nextIdx - idx
          if (span > 1) sb.append("<td colspan=\"").append(span).append("\">")
          else sb.append("<td>")
          sb.append(escape(r.cells(k))).append("</td>")
        }
        sb.append("</tr>\n")
      }
      sb.append("</table></figure>\n")
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
    val abstractParas = ArrayBuffer.empty[String]
    var pos = 0
    var continue = true
    while (continue) {
      val secStart = s.indexOf("<section", pos)
      if (secStart < 0) continue = false
      else {
        // abstract is a distinct Article field (pdf_parser.py:128-141),
        // marked in the html; regular sections keep their heading
        val isAbstract = s.startsWith("<section data-field=\"abstract\">", secStart)
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
        if (isAbstract) abstractParas ++= paras
        else sections += Section(heading, paras.toArray)
        pos = end + "</section>".length
      }
    }

    // authors + pub date from citation meta tags (pdf_parser.py:78-110
    // analog: sourceDesc/persName + publicationStmt/date@when)
    val authors = ArrayBuffer.empty[String]
    var ap = 0
    var acont = true
    while (acont) {
      between(s, "name=\"citation_author\" content=\"", "\"", ap) match {
        case Some((a, next)) => authors += unescape(a); ap = next
        case None => acont = false
      }
    }
    val pubDate = between(s, "name=\"citation_date\" content=\"", "\"", 0)
      .map(t => unescape(t._1)).getOrElse("")

    // tables (pdf_parser.py:170-222 analog): figure[data-type=table] ->
    // heading, figDesc paragraphs, ragged rows keyed c_0..c_n with the
    // colspan-advance rule; cell text gets the same char normalization
    // as paragraphs (parse_text applied per cell, pdf_parser.py:213)
    val tables = ArrayBuffer.empty[Table]
    var tpos = 0
    var tcont = true
    while (tcont) {
      val figStart = s.indexOf("<figure data-type=\"table\">", tpos)
      if (figStart < 0) tcont = false
      else {
        val figEnd0 = s.indexOf("</figure>", figStart)
        val figEnd = if (figEnd0 < 0) s.length else figEnd0
        val heading = between(s, "<h3>", "</h3>", figStart).filter(_._2 <= figEnd)
          .map(t => Text.normalize(unescape(t._1))).getOrElse("")
        val desc = ArrayBuffer.empty[String]
        val capEnd = s.indexOf("</figcaption>", figStart)
        val capStart = s.indexOf("<figcaption>", figStart)
        if (capStart >= 0 && capEnd > capStart && capEnd <= figEnd) {
          var p = capStart
          var pc = true
          while (pc) {
            between(s, "<p>", "</p>", p) match {
              case Some((body, next)) if s.indexOf("<p>", p) >= 0 &&
                s.indexOf("<p>", p) < capEnd =>
                desc += Text.normalize(unescape(body)); p = next
              case _ => pc = false
            }
          }
        }
        val rows = ArrayBuffer.empty[TableRow]
        val tblEnd0 = s.indexOf("</table>", figStart)
        val tblEnd = if (tblEnd0 < 0) figEnd else tblEnd0
        var rp = s.indexOf("<table>", figStart)
        var rc = rp >= 0 && rp < figEnd
        while (rc) {
          val trStart = s.indexOf("<tr>", rp)
          if (trStart < 0 || trStart >= tblEnd) rc = false
          else {
            val trEnd0 = s.indexOf("</tr>", trStart)
            val trEnd = if (trEnd0 < 0) tblEnd else trEnd0
            val cells = scala.collection.mutable.LinkedHashMap.empty[String, String]
            var idx = 0
            var cp = trStart
            var cc = true
            while (cc) {
              val tdStart = s.indexOf("<td", cp)
              if (tdStart < 0 || tdStart >= trEnd) cc = false
              else {
                val gt = s.indexOf(">", tdStart)
                val tdEnd = s.indexOf("</td>", gt)
                if (gt < 0 || tdEnd < 0) cc = false
                else {
                  val attrs = s.substring(tdStart + 3, gt)
                  val ci = attrs.indexOf("colspan=\"")
                  val span = if (ci < 0) 1 else {
                    var j = ci + 9
                    var v = 0
                    while (j < attrs.length && attrs.charAt(j) >= '0' && attrs.charAt(j) <= '9') {
                      v = v * 10 + (attrs.charAt(j) - '0'); j += 1
                    }
                    math.max(v, 1)
                  }
                  cells(s"c_$idx") = Text.normalize(unescape(s.substring(gt + 1, tdEnd)))
                  idx += span
                  cp = tdEnd + 5
                }
              }
            }
            rows += TableRow(cells.toMap)
            rp = trEnd + 5
          }
        }
        tables += Table(heading, desc.toArray, rows.toArray)
        tpos = figEnd + 9
      }
    }
    ExtractedDoc(title, doi, sections.toArray, authors.toArray, pubDate,
      tables.toArray, abstractParas.toArray)
  }

  /** Convenience: full extracted text from html bytes. */
  def extractText(html: Array[Byte]): String = extract(html).text
}
