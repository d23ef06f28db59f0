package graft

import graft.functions.Html
import graft.sources.PageGen
import org.scalatest.funsuite.AnyFunSuite

/** P1 completion: table extraction (pdf_parser.py:170-222 semantics —
  * ragged c_0..c_n cell keying with colspan advance), author/pub_date
  * metadata projection (pdf_parser.py:78-110), and the render/extract
  * round-trip that underpins the byte-identical text invariant.
  */
class TableSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("render/extract round-trips tables, authors and pub date exactly") {
    val doc = Html.ExtractedDoc(
      title = "A title with <angle> & amp",
      doi = "10.1/x_y",
      sections = Array(Html.Section("Intro", Array("One sentence here."))),
      authors = Array("Alice Moreau", "Chen Sato"),
      pubDate = "2021-07-03",
      tables = Array(Html.Table(
        heading = "Measured properties",
        description = Array("Values measured in this work."),
        rows = Array(
          Html.TableRow(Map("c_0" -> "Compound", "c_1" -> "Property", "c_2" -> "Value")),
          Html.TableRow(Map("c_0" -> "water", "c_1" -> "density", "c_2" -> "1.0 g/cm3")),
          // ragged row: first cell spans 2 columns -> keys c_0, c_2, c_3
          Html.TableRow(Map("c_0" -> "spanning & cell", "c_2" -> "melting point",
            "c_3" -> "95.0 °C"))))))
    val back = Html.extract(Html.render(doc))
    assert(back.title == doc.title)
    assert(back.doi == doc.doi)
    assert(back.authors.toSeq == doc.authors.toSeq)
    assert(back.pubDate == doc.pubDate)
    assert(back.tables.length == 1)
    val t = back.tables(0)
    assert(t.heading == "Measured properties")
    assert(t.description.toSeq == Seq("Values measured in this work."))
    assert(t.rows.map(_.cells).toSeq == doc.tables(0).rows.map(_.cells).toSeq)
    // colspan advance rule preserved
    assert(t.rows(2).cells.keySet == Set("c_0", "c_2", "c_3"))
    // canonical text serialization covers tables (tab-joined rows)
    assert(back.text == doc.text)
    assert(doc.text.contains("water\tdensity\t1.0 g/cm3"))
  }

  test("cell text gets char normalization (parse_text per cell, pdf_parser.py:213)") {
    val html = ("<html><head><title>t</title></head><body><article data-doi=\"d\">" +
      "<figure data-type=\"table\"><h3>h</h3><figcaption><p>d</p></figcaption>" +
      "<table><tr><td>Tc ¼ 95</td><td>292 À419</td></tr></table>" +
      "</figure></article></body></html>").getBytes("UTF-8")
    val t = Html.extract(html).tables(0)
    assert(t.rows(0).cells("c_0") == "Tc= 95")
    assert(t.rows(0).cells("c_1") == "292-419")
  }

  test("generated pages: table rows become gold pseudo-sentences that emit triples") {
    import spark.implicits._
    val gps = (0L until 300L).map(PageGen.genPage)
    val withTables = gps.filter(gp =>
      Html.extract(gp.page.html).tables.nonEmpty)
    assert(withTables.nonEmpty, "no generated page carries a table")
    // every table page has gold sentences in the table section and at
    // least one gold triple sourced from a table row
    withTables.foreach { gp =>
      val tblSents = gp.sentences.filter(_.section.startsWith("table:"))
      assert(tblSents.length == 3, s"expected header+2 rows, got ${tblSents.length}")
      val tblTriples = gp.triples.filter(_.section.startsWith("table:"))
      assert(tblTriples.nonEmpty, s"no table triples for ${gp.page.url}")
      // triple provenance carries the title
      assert(gp.triples.forall(_.title == gp.sentences.head.title))
    }
    // some generated row uses the colspan variant
    val colspanRows = withTables.flatMap(gp =>
      Html.extract(gp.page.html).tables.flatMap(_.rows)
        .filter(r => r.cells.contains("c_2") && !r.cells.contains("c_1")))
    assert(colspanRows.nonEmpty, "colspan variant never generated")
  }

  test("engine sentences carry authors and pub date columns") {
    import spark.implicits._
    val sents = graft.plans.Pipeline.sentences(PageGen.pages(spark, 30))
    val row = sents.filter(_.authors.nonEmpty).head()
    assert(row.authors.nonEmpty && row.authors.forall(_.contains(" ")))
    assert(row.pubDate.matches("\\d{4}-\\d{2}-\\d{2}"))
  }
}
