package graft.plans

import graft.functions.{Html, Text}
import graft.model._
import graft.operators._
import graft.sources.ChemDict
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** The KG-construction dataflow (SURVEY.md §7 stage architecture):
  *
  *   pages → sentences → annotated (NER) → related → triples
  *
  * Design-for-scale notes:
  *  - every stage up to `triples` is a per-row map/flatMap — NO shuffle;
  *    at 10^12 pages the only shuffles in the whole pipeline are the
  *    mention-count aggregation (A1), the (optional) salted linking join
  *    (J1) and the canonicalization loop (J5);
  *  - the gazetteer ships as a broadcast value; its trie is built lazily
  *    once per executor (not per row, not per task);
  *  - `html: binary` is only read by the extraction stage — downstream
  *    stages select typed Sentence columns so Parquet column pruning
  *    keeps the big binary column out of every later scan.
  */
object Pipeline {

  /** S4 + explode: per-row HTML→text extraction, sentence segmentation,
    * tokenization. Non-English pages are extracted but not segmented
    * (the reference pipeline is English-only; lang passthrough per
    * FIXTURES.md §1).
    */
  def sentences(pages: Dataset[Page]): Dataset[Sentence] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // columnar filter + projection BEFORE the typed flatMap: the lang
    // predicate pushes down to the parquet scan and ReadSchema prunes to
    // (url, html) — the `text` column (≈half the table bytes) is never
    // read. A typed filter here would deserialize full Page rows and
    // defeat both (verified by PlanSpec).
    pages.toDF()
      .filter(col("lang") === "en")
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, html) =>
        val doc = Html.extract(html)
        val out = ArrayBuffer.empty[Sentence]
        var sid = 0
        // abstract first (document order): a distinct Article field in
        // the reference, carried as isAbstract=true rows here
        doc.abstractParas.foreach { para =>
          Text.splitSentences(para).foreach { sent =>
            out += Sentence(url, docId = 0L, sentId = sid, section = "Abstract",
              title = doc.title, doi = doc.doi, text = sent,
              tokens = Text.tokenize(sent), ents = Array.empty, rels = Array.empty,
              authors = doc.authors, pubDate = doc.pubDate, isAbstract = true)
            sid += 1
          }
        }
        doc.sections.foreach { sec =>
          sec.paragraphs.foreach { para =>
            Text.splitSentences(para).foreach { sent =>
              out += Sentence(url, docId = 0L, sentId = sid, section = sec.heading,
                title = doc.title, doi = doc.doi, text = sent,
                tokens = Text.tokenize(sent), ents = Array.empty, rels = Array.empty,
                authors = doc.authors, pubDate = doc.pubDate)
              sid += 1
            }
          }
        }
        // table rows as pseudo-sentences (one per row, tab-joined cells)
        // — tables are where chemistry papers put most property values;
        // downstream NER/relations treat them like any sentence
        doc.tables.foreach { t =>
          t.rows.foreach { r =>
            val sent = Html.rowText(r)
            out += Sentence(url, docId = 0L, sentId = sid, section = s"table:${t.heading}",
              title = doc.title, doi = doc.doi, text = sent,
              tokens = Text.tokenize(sent), ents = Array.empty, rels = Array.empty,
              authors = doc.authors, pubDate = doc.pubDate)
            sid += 1
          }
        }
        out
      }
  }

  /** M1+M2+M3 under W2, then J3+M4 relation scoring. One fused map —
    * entity detection and pair scoring are both in-row, so fusing them
    * avoids a second pass over the sentence table.
    */
  def annotate(sents: Dataset[Sentence], gazetteerNames: Array[String]): Dataset[Sentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(new ChemGazetteer(gazetteerNames))
    sents.mapPartitions { it =>
      val gaz = bc.value
      it.map { s =>
        val ents = Ner.annotate(s.text, s.tokens, gaz)
        val rels = Relations.relate(ents)
        s.copy(ents = ents, rels = rels)
      }
    }
  }

  /** P3 keep-filter + J4/P5 tuple assembly at threshold 0.45. */
  def triples(annotated: Dataset[Sentence]): Dataset[Triple] = {
    val spark = annotated.sparkSession
    import spark.implicits._
    annotated
      .filter(s => Relations.keepDoc(s.ents))
      .flatMap(s => Triples.assemble(s))
  }

  /** Full chain from pages with the default dictionary. */
  def run(pages: Dataset[Page]): Dataset[Triple] = {
    val names = ChemDict.entries.flatMap(_.synonyms)
    triples(annotate(sentences(pages), names))
  }

  /** M5/W4 optional stage (reference default off, pipeline.py:30):
    * Schwartz-Hearst abbreviation definitions + re-matched occurrences
    * per sentence. In-row work only — no shuffle.
    */
  def abbreviations(sents: Dataset[Sentence]): org.apache.spark.sql.DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.flatMap { s =>
      Abbreviations.detect(s.tokens).map { a =>
        // char offsets into the sentence text + the SURFACE substring at
        // those offsets (spaCy span.text analog) — lets the DuckDB
        // oracle check substring equality + parenthesis adjacency
        // directly against the kg_sentences dump
        val scs = s.tokens(a.shortStart).start
        val sce = s.tokens(a.shortEnd - 1).end
        val lcs = s.tokens(a.longStart).start
        val lce = s.tokens(a.longEnd - 1).end
        (s.url, s.sentId,
          s.text.substring(scs, sce), a.shortStart, a.shortEnd, scs, sce,
          s.text.substring(lcs, lce), a.longStart, a.longEnd, lcs, lce)
      }
    }.toDF("url", "sent_id",
      "short_text", "short_start", "short_end", "short_char_start", "short_char_end",
      "long_text", "long_start", "long_end", "long_char_start", "long_char_end")
  }
}
