package graft.model

import java.sql.Timestamp

/** Typed stage boundaries for the KG-construction pipeline.
  *
  * Shapes derive from the reference's data model (SURVEY.md §1):
  *  - page/input shape per BASELINE.json `input_hint`
  *  - sentence/entity/relation shapes from spaCy Doc + Span usage
  *    (reference: cprex/pipeline.py:61-71, cprex/rel/rel_pipe.py:104-107)
  *  - triple shape from cprex/corpus/tuples.py:32-56
  *  - entity-dictionary shape from cprex/pubchem/linker.py:29-53
  */

/** North-rule input row: Common-Crawl-style web page. */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One token, with char offset into its sentence (spaCy Token analog). */
final case class Tok(text: String, start: Int) {
  def end: Int = start + text.length
}

/** One entity span over a sentence (spaCy Span analog).
  * label ∈ {CHEM, PROP, FORMULA, <QUANTITY-TYPE>, VALUE, PERCENT, ...}
  * (SURVEY.md §1.3); entId = property type for PROP/FORMULA
  * (reference ent_id_, cprex/ner/properties.py pattern "id").
  * For quantity entities, `value`/`unit` carry the parsed+normalized
  * numeric payload (our north-rule extension of tuples.py raw spans).
  */
final case class Ent(
    startTok: Int,
    endTok: Int, // exclusive
    startChar: Int,
    endChar: Int, // exclusive
    text: String,
    label: String,
    entId: String, // "" when n/a
    value: Double, // NaN when n/a
    unit: String // normalized unit, "" when n/a
)

/** A scored relation edge between two entities of one sentence
  * (reference doc._.rel: (headStartTok, tailStartTok) -> {label: score},
  * cprex/rel/rel_pipe.py:104-107; single label "has_value").
  */
final case class RelEdge(
    headTok: Int,
    tailTok: Int,
    label: String,
    score: Double
)

/** A sentence row: the unit of NLP processing (spaCy Doc analog;
  * one Doc per sentence as in cprex/ner/chem_ner.py:77).
  */
final case class Sentence(
    url: String,
    docId: Long,
    sentId: Int,
    section: String,
    title: String,
    doi: String,
    text: String,
    tokens: Array[Tok],
    ents: Array[Ent],
    rels: Array[RelEdge],
    // article-level provenance carried per row (pdf_parser.py:78-110:
    // Article.authors / Article.pub_date); trailing defaults keep the
    // core-10-field constructor shape stable
    authors: Array[String] = Array.empty,
    pubDate: String = "",
    // true when the row comes from the article's abstract — a distinct
    // Article field in the reference (pdf_parser.py:128-141), not just
    // a section heading
    isAbstract: Boolean = false
)

/** Emitted (chemical, property, value-with-unit) triple
  * (reference ChemPropValueRelation.to_dict, cprex/corpus/tuples.py:32-44,
  * flattened to one row per (head, value) pair).
  */
final case class Triple(
    url: String,
    doi: String,
    section: String,
    sentId: Int,
    sentence: String,
    headLabel: String, // CHEM | PROP | FORMULA
    headText: String,
    propType: String, // ent_id_ for PROP/FORMULA heads, "" for CHEM
    valueLabel: String, // quantity type label
    valueText: String, // raw measured span
    value: Double, // normalized numeric value (NaN if unparsed)
    unit: String, // normalized unit ("" if none)
    score: Double,
    // title provenance (tuples.py:32-44 to_dict carries title alongside
    // doi); trailing default keeps existing constructor call sites
    title: String = ""
)

/** PubChem-style dictionary row (reference linker.py:29-53 semantics;
  * synthesized deterministically — FIXTURES.md §2).
  */
final case class ChemDictEntry(
    cid: Long,
    canonicalName: String,
    synonyms: Array[String],
    molecularFormula: String,
    molecularWeight: Double,
    canonicalSmiles: String,
    iupacName: String
)

/** Canonicalized entity-table row (north rule: CC over near-dup names). */
final case class CanonicalEntity(
    clusterId: Long,
    cid: Long,
    canonicalName: String,
    memberNames: Array[String],
    molecularFormula: String,
    molecularWeight: Double
)

/** Per-stage, per-partition lineage/metrics row (north rule). */
final case class LineageRow(
    stage: String,
    bucket: Int,
    rows: Long,
    startedAtMs: Long,
    finishedAtMs: Long
)
