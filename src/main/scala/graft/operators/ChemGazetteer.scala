package graft.operators

import graft.model.{Ent, Tok}
import scala.collection.mutable.ArrayBuffer

/** M1: chemical-mention detection — replaces the reference's per-sentence
  * PubMedBERT NER (cprex/ner/chem_ner.py:62-106) with broadcast-dictionary
  * gazetteer matching, per the north star. Emits the same span shape:
  * (startTok, endTok, "CHEM").
  *
  * The matcher is a token-level trie (Aho-Corasick-lite: at each position
  * take the longest dictionary phrase; left-to-right, first-writer-wins —
  * matching the BIO-merge + overlap-suppression order of the reference,
  * chem_ner.py:91-101). Matching is case-insensitive on token text,
  * EXCEPT short all-caps acronym entries ("AN", "TNT", "H2O": <= 5 chars,
  * no lowercase letters) which match case-sensitively — the standard
  * gazetteer guard against tagging the article "an" as ammonium nitrate
  * (the contextual BERT model the gazetteer replaces is case-aware).
  *
  * Scale note: the trie is built ONCE per executor from a broadcast
  * Array[String] (lazy transient), not per row — the dictionary at real
  * scale is O(100 MB); per-row work is O(tokens × maxPhraseLen).
  */
class ChemGazetteer(names: Array[String]) extends Serializable {

  @transient private lazy val trie: TokenTrie = {
    val t = new TokenTrie
    names.foreach { n =>
      val caseSensitive = n.length <= 5 && !n.exists(_.isLower)
      t.add(n.split("\\s+"), caseSensitive)
    }
    t
  }

  /** Find CHEM entities over a token stream; `claimed` tokens (from
    * higher-priority stages — none for CHEM, which runs first) are
    * skipped.
    */
  def findEntities(toks: Array[Tok]): Array[Ent] =
    findEntities(toks, Ner.lowercaseAll(toks))

  /** Hot-path variant with a caller-supplied lowercase memo array. */
  def findEntities(toks: Array[Tok], lowers: Array[String]): Array[Ent] = {
    val out = ArrayBuffer.empty[Ent]
    var i = 0
    while (i < toks.length) {
      val len = trie.longestMatch(toks, lowers, i)
      if (len > 0) {
        val startChar = toks(i).start
        val endChar = toks(i + len - 1).end
        out += Ent(i, i + len, startChar, endChar, text = null, label = "CHEM",
          entId = "", value = Double.NaN, unit = "")
        i += len
      } else i += 1
    }
    out.toArray
  }
}

/** Minimal token-sequence trie with longest-match lookup. Keys are
  * lowercased; case-sensitive entries additionally store their exact
  * surface, verified at the terminal.
  */
final class TokenTrie {
  private final class Node {
    var children: java.util.HashMap[String, Node] = _
    var anyCase: Boolean = false // a case-insensitive entry ends here
    var exactForms: java.util.HashSet[String] = _ // case-sensitive surfaces
  }
  private val root = new Node

  def add(tokens: Array[String], caseSensitive: Boolean): Unit = {
    var n = root
    tokens.foreach { t =>
      if (n.children == null) n.children = new java.util.HashMap[String, Node]()
      val key = t.toLowerCase
      var c = n.children.get(key)
      if (c == null) { c = new Node; n.children.put(key, c) }
      n = c
    }
    if (caseSensitive) {
      if (n.exactForms == null) n.exactForms = new java.util.HashSet[String]()
      n.exactForms.add(tokens.mkString(" "))
    } else n.anyCase = true
  }

  /** Length (in tokens) of the longest phrase starting at `start`; 0 if none. */
  def longestMatch(toks: Array[Tok], lowers: Array[String], start: Int): Int = {
    var n = root
    var i = start
    var best = 0
    var continue = true
    while (continue && i < toks.length && n.children != null) {
      val c = n.children.get(lowers(i))
      if (c == null) continue = false
      else {
        i += 1
        n = c
        val accepted = n.anyCase || (n.exactForms != null && {
          val surface = toks.slice(start, i).map(_.text).mkString(" ")
          n.exactForms.contains(surface)
        })
        if (accepted) best = i - start
      }
    }
    best
  }
}
