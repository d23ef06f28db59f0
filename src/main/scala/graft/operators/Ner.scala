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

  /** Annotate one sentence: returns the merged, non-overlapping entity
    * array sorted by startTok, with `text` filled from the sentence.
    */
  def annotate(text: String, toks: Array[Tok], gazetteer: ChemGazetteer): Array[Ent] = {
    val claimed = new java.util.BitSet(toks.length)
    val out = ArrayBuffer.empty[Ent]

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
    gazetteer.findEntities(toks).foreach(claimIfFree)
    // 2. quantities (skip tokens claimed by CHEM)
    QuantityParser.findEntities(text, toks).foreach(claimIfFree)
    // 3. property ruler (spaCy entity_ruler overwrite_ents=False: matches
    //    overlapping existing ents are dropped)
    PropertyRuler.findEntities(toks).foreach(claimIfFree)

    out.sortBy(_.startTok).toArray
  }
}
