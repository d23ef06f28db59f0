package graft.operators

import graft.model.{Ent, RelEdge}
import scala.collection.mutable.ArrayBuffer

/** J3 + M4 + P3: relation-candidate generation, deterministic scoring,
  * and the doc keep-filter.
  *
  * Candidate semantics are a verbatim port of `can_link_instances`
  * (cprex/rel/rel_model.py:117-147) with `max_length = 100` tokens
  * (rel_trf.cfg:62). Scoring replaces the reference's learned
  * Linear>>Logistic pair scorer (rel_model.py:22-27) with a documented
  * deterministic feature function (distance decay + intervening-entity
  * penalties); thresholds keep the reference's values: 0.5 for the
  * pipeline component (rel_trf.cfg:42), 0.45 at tuple extraction
  * (cprex/corpus/tuples.py:60).
  *
  * Everything here is per-sentence in-row work (the reference's Doc =
  * one sentence, chem_ner.py:77): the pair "self-join" is an array
  * cross-product inside the row — no shuffle (SURVEY.md J3).
  */
object Relations {

  val MaxLength = 100 // rel_trf.cfg:62
  val PipelineThreshold = 0.5 // rel_trf.cfg:42
  val ExtractionThreshold = 0.45 // tuples.py:60

  val HeadLabels: Set[String] = Set("CHEM", "PROP", "FORMULA")

  /** Verbatim port of PROPERTY_TO_UNITS (cprex/ner/quantities.py:24-38). */
  val PropertyToUnits: Map[String, List[String]] = Map(
    "enthalpy" -> List("ENERGY", "ENTHALPY", "MAXIMUM ENERGY PRODUCT"),
    "energy" -> List("ENERGY", "ENTHALPY", "MAXIMUM ENERGY PRODUCT"),
    "absorptivity" -> List("ABSORPTIVITY"),
    "heat capacity" -> List("HEAT CAPACITY"),
    "temperature" -> List("TEMPERATURE"),
    "pressure" -> List("PRESSURE"),
    "density" -> List("SOLUBILITY", "DENSITY"),
    "viscosity" -> List("DYNAMIC VISCOSITY"),
    "velocity" -> List("VELOCITY"),
    "toxicity" -> List(),
    "thermal" -> List("TIME", "TEMPERATURE"),
    "formula weight" -> List(),
    "sensibility" -> List()
  )

  /** can_link_instances (rel_model.py:117-147). */
  def canLink(head: Ent, tail: Ent, maxLength: Int = MaxLength): Boolean = {
    if (head == tail) return false
    if (maxLength > 0 && math.abs(tail.startTok - head.startTok) > maxLength) return false
    // only CHEM/PROP/FORMULA -> non-(CHEM/PROP/FORMULA) (rel_model.py:125-130)
    if (!HeadLabels.contains(head.label) || HeadLabels.contains(tail.label)) return false
    // unit-compatibility safety check (rel_model.py:136-145)
    if ((head.label == "PROP" || head.label == "FORMULA") && tail.label != "VALUE") {
      PropertyToUnits.get(head.entId) match {
        case Some(units) if head.entId.nonEmpty && units.nonEmpty &&
          !units.contains(tail.label) => return false
        case _ =>
      }
    }
    true
  }

  /** Deterministic pair score in [0,1] (replaces the learned scorer,
    * SURVEY.md M4). Features:
    *  - token-distance decay: 1 - dist/(2·maxLength)  (≥0.5 within cap);
    *  - −0.3 per other quantity entity with the SAME label strictly
    *    between head and tail (a nearer value of the same kind competes);
    *  - −0.15 per other head entity with the same label strictly between
    *    (a nearer chem/property competes).
    * Capped at 2 intervening penalties each; threshold 0.45 then keeps
    * nearest associations and drops doubly-shadowed pairs.
    */
  def score(head: Ent, tail: Ent, ents: Array[Ent]): Double = {
    val dist = math.abs(tail.startTok - head.startTok)
    val lo = math.min(head.startTok, tail.startTok)
    val hi = math.max(head.startTok, tail.startTok)
    var sameTail = 0
    var sameHead = 0
    var i = 0
    while (i < ents.length) {
      val e = ents(i)
      if (e.startTok > lo && e.startTok < hi) {
        if (e.label == tail.label && (e.startTok != tail.startTok)) sameTail += 1
        if (e.label == head.label && (e.startTok != head.startTok)) sameHead += 1
      }
      i += 1
    }
    val base = 1.0 - dist.toDouble / (2.0 * MaxLength)
    val s = base - 0.3 * math.min(sameTail, 2) - 0.15 * math.min(sameHead, 2)
    math.max(0.0, math.min(1.0, s))
  }

  /** Candidate pairs + scores for one sentence's entities (doc._.rel
    * analog keyed by (headStartTok, tailStartTok), rel_pipe.py:104-107).
    * Like the reference pipe, ALL candidate scores are materialized
    * (rel_pipe.py:97-108 stores every instance's probability); the
    * extraction threshold (0.45) is applied downstream at tuple
    * assembly, so `threshold` here defaults to 0.
    */
  def relate(ents: Array[Ent], threshold: Double = 0.0): Array[RelEdge] = {
    val out = ArrayBuffer.empty[RelEdge]
    var i = 0
    while (i < ents.length) {
      var j = 0
      while (j < ents.length) {
        if (i != j && canLink(ents(i), ents(j))) {
          val s = score(ents(i), ents(j), ents)
          if (s >= threshold)
            out += RelEdge(ents(i).startTok, ents(j).startTok, "has_value", s)
        }
        j += 1
      }
      i += 1
    }
    out.toArray
  }

  /** P3 doc keep-filter (cprex/corpus/corpus.py:33-70): keep a sentence
    * iff some property type present has a compatible-unit quantity in
    * the same sentence (empty unit list ⇒ any quantity counts).
    */
  def keepDoc(ents: Array[Ent]): Boolean = {
    val propTypes = ents.map(_.entId).filter(_.nonEmpty).toSet
    val quantityLabels = ents.map(_.label).filterNot(HeadLabels.contains)
    PropertyToUnits.exists { case (prop, units) =>
      propTypes.contains(prop) && (
        (units.isEmpty && quantityLabels.nonEmpty) ||
          units.exists(quantityLabels.contains)
      )
    }
  }
}
