package graft.operators

import graft.model.{Ent, RelEdge, Sentence, Triple}
import scala.collection.mutable.ArrayBuffer

/** J4 + F10 + P5: tuple assembly — the reference's
  * `extract_tuple_relations` (cprex/corpus/tuples.py:59-87) flattened to
  * one Triple row per (head, value) pair.
  *
  * Semantics reproduced:
  *  - rel edges with prob >= 0.45 attach their head to the tail's tuple
  *    (tuples.py:78-86); heads are CHEM (chemicals) or PROP/FORMULA
  *    (properties) (tuples.py:14-19);
  *  - entity lookup by start-token via the ent_start_to_ent map
  *    (tuples.py:72-74) — here an in-row map, no shuffle (SURVEY.md J4);
  *  - P5 chemicals-present filter (cprex/ui/utils.py:90-95): only values
  *    with at least one CHEM head produce output rows; the value's PROP/
  *    FORMULA heads ride along (flattened).
  *  - value+unit normalization happened upstream at quantity parse
  *    (north-rule extension); Triple carries both raw span text and the
  *    normalized (value, unit).
  */
object Triples {

  def assemble(
      sent: Sentence,
      threshold: Double = Relations.ExtractionThreshold,
      requireChem: Boolean = true
  ): Array[Triple] = {
    if (sent.rels.isEmpty) return Array.empty
    val byStart: Map[Int, Ent] = sent.ents.map(e => e.startTok -> e).toMap
    // group surviving edges by tail (the value)
    val byTail = sent.rels.filter(_.score >= threshold).groupBy(_.tailTok)
    val out = ArrayBuffer.empty[Triple]
    byTail.toArray.sortBy(_._1).foreach { case (tailTok, edges) =>
      val value = byStart(tailTok)
      val heads = edges.sortBy(_.headTok)
      val hasChem = heads.exists(e => byStart(e.headTok).label == "CHEM")
      if (!requireChem || hasChem) {
        heads.foreach { edge =>
          val head = byStart(edge.headTok)
          out += Triple(
            url = sent.url, doi = sent.doi, section = sent.section,
            sentId = sent.sentId, sentence = sent.text,
            headLabel = head.label, headText = head.text,
            propType = if (head.label == "PROP" || head.label == "FORMULA") head.entId else "",
            valueLabel = value.label, valueText = value.text,
            value = value.value, unit = value.unit, score = edge.score,
            title = sent.title)
        }
      }
    }
    out.toArray
  }
}
