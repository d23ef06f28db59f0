package graft.functions

import java.text.Normalizer

/** F6: deterministic chemical-name canonicalization for linking keys.
  *
  * The reference keys its PubChem synonym cache by `compound.lower()`
  * (cprex/pubchem/linker.py:39,52). The north star extends this to
  * "InChI/SMILES-style canonicalization as deterministic Catalyst
  * expressions": here that is a pure string normalization —
  * NFKC fold, lowercase, dash/underscore/whitespace folding — exposed
  * both as a Scala function (for typed stages) and as a registered
  * Spark function `chem_norm` (see GraftFunctions) so it stays inside
  * codegen'd projections where used from SQL/DataFrame code.
  */
object Normalize {

  def chemNorm(name: String): String = {
    if (name == null) return null
    val nfkc = Normalizer.normalize(name, Normalizer.Form.NFKC)
    val sb = new StringBuilder(nfkc.length)
    var prevSpace = false
    var i = 0
    while (i < nfkc.length) {
      val c = nfkc.charAt(i)
      val mapped =
        if (c == '-' || c == '_' || c.isWhitespace) ' '
        else Character.toLowerCase(c)
      if (mapped == ' ') {
        if (!prevSpace && sb.nonEmpty) { sb.append(' '); prevSpace = true }
      } else { sb.append(mapped); prevSpace = false }
      i += 1
    }
    // trim trailing space
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Character n-gram shingles of a normalized name (for min-hash
    * blocking, SURVEY.md J5).
    */
  def shingles(name: String, n: Int = 3): Set[String] = {
    val s = chemNorm(name)
    if (s.length <= n) Set(s)
    else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet
  }

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size
      inter.toDouble / (a.size + b.size - inter)
    }
  }

  /** k min-hash values over shingles (seeded murmur family). */
  def minhash(sh: Set[String], k: Int = 8): Array[Int] = {
    val out = new Array[Int](k)
    var j = 0
    while (j < k) {
      var best = Int.MaxValue
      sh.foreach { g =>
        val h = scala.util.hashing.MurmurHash3.stringHash(g, 1000 + j)
        if (h < best) best = h
      }
      out(j) = best
      j += 1
    }
    out
  }
}
