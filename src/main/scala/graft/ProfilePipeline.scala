package graft

import graft.functions.{Html, Text}
import graft.operators._
import graft.sources.{ChemDict, PageGen}

/** Dev tool: single-threaded per-stage cost breakdown of the page→triple
  * hot path, outside Spark (no encoder/scheduler noise). Guides
  * allocation/bandwidth optimization — the sandbox host's memory
  * subsystem saturates beyond ~8 threads (see BENCH.md), so per-row
  * allocation is the scaling lever.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val gaz = new ChemGazetteer(ChemDict.entries.flatMap(_.synonyms))
    // pre-generate pages so generation cost stays out of the measurement
    val pages = (0L until n).map(i => PageGen.genPage(i).page).toArray
    var tExtract = 0L; var tSplit = 0L; var tTok = 0L; var tNer = 0L
    var tRel = 0L; var tAsm = 0L
    var tGaz = 0L; var tQty = 0L; var tProp = 0L
    var nTriples = 0L
    for (round <- 1 to 3) {
      tExtract = 0; tSplit = 0; tTok = 0; tNer = 0; tRel = 0; tAsm = 0
      tGaz = 0; tQty = 0; tProp = 0
      nTriples = 0
      val t0 = System.nanoTime()
      pages.foreach { p =>
        if (p.lang == "en") {
          var t = System.nanoTime()
          val doc = Html.extract(p.html)
          tExtract += System.nanoTime() - t
          doc.sections.foreach { sec =>
            sec.paragraphs.foreach { para =>
              t = System.nanoTime()
              val sents = Text.splitSentences(para)
              tSplit += System.nanoTime() - t
              sents.foreach { sent =>
                t = System.nanoTime()
                val toks = Text.tokenize(sent)
                tTok += System.nanoTime() - t
                t = System.nanoTime()
                val g = gaz.findEntities(toks)
                tGaz += System.nanoTime() - t
                t = System.nanoTime()
                val q = QuantityParser.findEntities(sent, toks)
                tQty += System.nanoTime() - t
                t = System.nanoTime()
                val pr = PropertyRuler.findEntities(toks)
                tProp += System.nanoTime() - t
                t = System.nanoTime()
                val ents = Ner.annotate(sent, toks, gaz)
                tNer += System.nanoTime() - t
                if (g.length + q.length + pr.length < 0) println("impossible")
                t = System.nanoTime()
                val rels = Relations.relate(ents)
                tRel += System.nanoTime() - t
                t = System.nanoTime()
                if (Relations.keepDoc(ents)) {
                  val s = graft.model.Sentence(p.url, 0L, 0, sec.heading, doc.title,
                    doc.doi, sent, toks, ents, rels)
                  nTriples += Triples.assemble(s).length
                }
                tAsm += System.nanoTime() - t
              }
            }
          }
        }
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"round $round: total=$total%.2fs triples=$nTriples " +
        f"extract=${tExtract / 1e9}%.2f split=${tSplit / 1e9}%.2f tok=${tTok / 1e9}%.2f " +
        f"ner=${tNer / 1e9}%.2f (gaz=${tGaz / 1e9}%.2f qty=${tQty / 1e9}%.2f prop=${tProp / 1e9}%.2f) " +
        f"rel=${tRel / 1e9}%.2f assemble=${tAsm / 1e9}%.2f " +
        f"pages_per_s=${n / total}%.0f")
    }
  }
}
