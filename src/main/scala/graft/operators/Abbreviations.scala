package graft.operators

import graft.model.Tok
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** M5/W4/P7: Schwartz–Hearst abbreviation detection — a token-level
  * re-expression of the reference's detector
  * (cprex/ner/abbreviations.py:14-283, itself vendored from scispacy),
  * as a pure in-row function usable inside a Spark map stage. Optional
  * stage, off by default, as in the reference
  * (cprex/pipeline.py:30 `detect_abbreviations: bool = False`).
  *
  * Semantics reproduced:
  *  - candidate enumeration: every `( interior )` token span
  *    (abbreviations.py:186 matcher pattern), interior taken without
  *    brackets (abbreviations.py:227);
  *  - filter_matches (abbreviations.py:102-139): interior > 8 tokens or
  *    doc-initial dropped; interior > 3 tokens ⇒ long-form-in-parens
  *    (short = the word before the paren, long must have balanced
  *    parens); else short-form-in-parens with the Schwartz–Hearst
  *    lookback window `max_words = min(len+5, len*2)`;
  *  - short_form_filter (abbreviations.py:142-154): word lengths in
  *    [2,10), >= 50% alpha, alpha first char;
  *  - find_abbreviation (abbreviations.py:14-85): right-to-left char
  *    matching, first short char must hit a word start;
  *  - dedup by (long text, short text) first-wins + global re-matching
  *    of each defined short form across the doc
  *    (abbreviations.py:231-259).
  */
object Abbreviations {

  final case class Abbrev(shortStart: Int, shortEnd: Int, shortText: String,
      longStart: Int, longEnd: Int, longText: String)

  private def spanText(toks: Array[Tok], s: Int, e: Int): String = {
    val sb = new StringBuilder
    var i = s
    while (i < e) {
      if (i > s) sb.append(' ')
      sb.append(toks(i).text)
      i += 1
    }
    sb.toString
  }

  /** short_form_filter (abbreviations.py:142-154). */
  private def shortFormFilter(toks: Array[Tok], s: Int, e: Int): Boolean = {
    if (s >= e) return false
    var i = s
    while (i < e) {
      val len = toks(i).text.length
      if (len < 2 || len >= 10) return false
      i += 1
    }
    val text = spanText(toks, s, e)
    if (text.count(_.isLetter).toDouble / text.length < 0.5) return false
    text.charAt(0).isLetter
  }

  /** span_contains_unbalanced_parentheses (abbreviations.py:88-99). */
  private def unbalancedParens(toks: Array[Tok], s: Int, e: Int): Boolean = {
    var depth = 0
    var i = s
    while (i < e) {
      val t = toks(i).text
      if (t == "(") depth += 1
      else if (t == ")") {
        if (depth > 0) depth -= 1 else return true
      }
      i += 1
    }
    depth != 0
  }

  /** find_abbreviation (abbreviations.py:14-85): returns the start token
    * index of the long form within [ls, le), or -1 if no match.
    */
  def findAbbreviation(toks: Array[Tok], ls: Int, le: Int, ss: Int, se: Int): Int = {
    if (ls >= le) return -1
    val longForm = spanText(toks, ls, le)
    val shortForm = spanText(toks, ss, se)
    var li = longForm.length - 1
    var si = shortForm.length - 1
    while (si >= 0) {
      val c = Character.toLowerCase(shortForm.charAt(si))
      if (!Character.isLetterOrDigit(c)) si -= 1
      else {
        while (li >= 0 && (Character.toLowerCase(longForm.charAt(li)) != c ||
          (si == 0 && li > 0 && Character.isLetterOrDigit(longForm.charAt(li - 1))))) li -= 1
        if (li < 0) return -1
        li -= 1
        si -= 1
      }
    }
    li += 1
    // char offset -> first token starting after it (abbreviations.py:74-82;
    // text_with_ws length = token length + 1 joining space)
    var wordLengths = 0
    var i = ls
    while (i < le) {
      wordLengths += toks(i).text.length + 1
      if (wordLengths > li) return i
      i += 1
    }
    -1
  }

  /** Detect abbreviation definitions + all their occurrences in one
    * token stream (= one reference Doc). Deterministic output order:
    * (shortStart, shortEnd).
    */
  def detect(toks: Array[Tok]): Array[Abbrev] = {
    // candidate (longStart, longEnd, shortStart, shortEnd) after filter_matches
    val filtered = ArrayBuffer.empty[(Int, Int, Int, Int)]
    var i = 0
    while (i < toks.length) {
      if (toks(i).text == "(") {
        var j = i + 1
        // interior > 8 is dropped anyway: bound the scan
        val jMax = math.min(toks.length, i + 11)
        while (j < jMax) {
          if (toks(j).text == ")" && j > i + 1) {
            val start = i + 1 // interior start (matcher output minus bracket)
            val end = j // interior end (exclusive)
            if (end - start <= 8 && start != 1) {
              if (end - start > 3) {
                // long form inside parens; short = one word before the paren
                if (!unbalancedParens(toks, start, end) &&
                  shortFormFilter(toks, start - 2, start - 1))
                  filtered += ((start, end, start - 2, start - 1))
              } else {
                // normal case: short form inside parens
                if (shortFormFilter(toks, start, end)) {
                  var abbrevLength = 0
                  var k = start
                  while (k < end) { abbrevLength += toks(k).text.length; k += 1 }
                  val maxWords = math.min(abbrevLength + 5, abbrevLength * 2)
                  val ls = math.max(start - maxWords - 1, 0)
                  filtered += ((ls, start - 1, start, end))
                }
              }
            }
          }
          j += 1
        }
      }
      i += 1
    }

    // find_matches_for (abbreviations.py:231-259): dedup + global rematch
    val seenLong = scala.collection.mutable.Set.empty[String]
    val seenShort = scala.collection.mutable.Set.empty[String]
    // long text -> (longStart, longEnd, short token sequence)
    val rules = LinkedHashMap.empty[String, (Int, Int, Array[String])]
    val out = ArrayBuffer.empty[Abbrev]
    filtered.foreach { case (ls0, le0, ss, se) =>
      val ls = findAbbreviation(toks, ls0, le0, ss, se)
      if (ls >= 0) {
        val longText = spanText(toks, ls, le0)
        val shortText = spanText(toks, ss, se)
        if (!seenLong.contains(longText) && !seenShort.contains(shortText)) {
          seenLong += longText
          seenShort += shortText
          rules(longText) = ((ls, le0, (ss until se).map(toks(_).text).toArray))
          out += Abbrev(ss, se, shortText, ls, le0, longText)
        }
      }
    }
    // global matcher: every other exact-token occurrence of a defined
    // short form gets the same long form
    rules.foreach { case (longText, (ls, le, shortToks)) =>
      var p = 0
      while (p + shortToks.length <= toks.length) {
        var q = 0
        while (q < shortToks.length && toks(p + q).text == shortToks(q)) q += 1
        if (q == shortToks.length) {
          val ss = p; val se = p + shortToks.length
          // the defining occurrence is already recorded
          if (!out.exists(a => a.shortStart == ss && a.shortEnd == se))
            out += Abbrev(ss, se, spanText(toks, ss, se), ls, le, longText)
        }
        p += 1
      }
    }
    out.sortBy(a => (a.shortStart, a.shortEnd)).toArray
  }
}
