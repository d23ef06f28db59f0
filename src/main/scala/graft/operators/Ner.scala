package graft.operators

import graft.model.{Ent, Tok}
import scala.collection.mutable.ArrayBuffer

/** W2: the NER stage orchestrator — runs the three detectors in the
  * reference's pipeline order (cprex/pipeline.py:44-56: ChemNER →
  * QuantitiesNER → entity_ruler) with first-writer-wins token-overlap
  * suppression (chem_ner.py:91-101, quantities.py:171-180; spaCy allows
  * one entity per token).
  *
  * Determinism note (SURVEY.md §7 risk 2): resolution is entirely
  * in-row, ordered by (stage priority, scan order) — independent of
  * partitioning, verified by the multi-parallelism spec.
  */
object Ner {

  /** One toLowerCase per token, shared by all detectors (the hot path
    * runs over 10^12 rows; per-token rework is the scaling lever on
    * allocation-bandwidth-bound hosts — see BENCH.md).
    */
  def lowercaseAll(toks: Array[Tok]): Array[String] = {
    val out = new Array[String](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = toks(i).text.toLowerCase; i += 1 }
    out
  }

  /** Annotate one sentence: returns the merged, non-overlapping entity
    * array sorted by startTok, with `text` filled from the sentence.
    */
  def annotate(text: String, toks: Array[Tok], gazetteer: ChemGazetteer): Array[Ent] = {
    val claimed = new java.util.BitSet(toks.length)
    val out = ArrayBuffer.empty[Ent]
    val lowers = lowercaseAll(toks)
    val lemmas = new Array[String](toks.length)
    var k0 = 0
    while (k0 < toks.length) { lemmas(k0) = graft.functions.Text.lemmaOfLower(lowers(k0)); k0 += 1 }

    def claimIfFree(e: Ent): Unit = {
      var free = true
      var k = e.startTok
      while (k < e.endTok && free) { if (claimed.get(k)) free = false; k += 1 }
      if (free) {
        claimed.set(e.startTok, e.endTok)
        out += (if (e.text == null) e.copy(text = text.substring(e.startChar, e.endChar)) else e)
      }
    }

    // 1. CHEM (highest priority — runs first in the reference pipeline)
    gazetteer.findEntities(toks, lowers).foreach(claimIfFree)
    // 2. quantities (skip tokens claimed by CHEM)
    QuantityParser.findEntities(text, toks).foreach(claimIfFree)
    // 3. property ruler (spaCy entity_ruler overwrite_ents=False: matches
    //    overlapping existing ents are dropped)
    PropertyRuler.findEntities(toks, lowers, lemmas).foreach(claimIfFree)

    out.sortBy(_.startTok).toArray
  }
}
