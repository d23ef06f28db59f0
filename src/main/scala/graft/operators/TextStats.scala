package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a document
  * table. Everything here is built from org.apache.spark.sql.functions
  * Column expressions where possible (whole-stage codegen); only
  * language-ID uses a UDF (set lookups over a broadcastable constant).
  */
object TextStats {

  // ---------- language ID (n-gram/stopword heuristic) ----------

  private val StopwordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "is", "in", "to", "was", "it", "for", "with",
      "on", "as", "are", "at", "this", "that", "be", "by"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "für", "auf",
      "ein", "eine", "nicht", "den", "im", "zu", "war", "sind", "beträgt"),
    "fr" -> Set("le", "la", "les", "et", "est", "de", "des", "un", "une", "du",
      "pour", "avec", "dans", "sur", "par", "au", "ne", "pas"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "de", "en", "un", "una",
      "del", "por", "con", "para", "no", "se", "que", "al")
  )

  /** Deterministic language ID: argmax stopword hits; ties and zero
    * hits resolve to "und" (undetermined). Pure function, UDF-wrapped.
    */
  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    var bestLang = "und"
    var bestScore = 0
    // deterministic iteration order
    StopwordProfiles.toSeq.sortBy(_._1).foreach { case (lang, stops) =>
      val score = words.count(stops.contains)
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }
    bestLang
  }

  val detectLangUdf = udf((s: String) => detectLang(s))

  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("lang_pred", detectLangUdf(col(textCol)))

  // ---------- token counting ----------

  /** Whitespace token count — pure Column expression. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, " "), t => length(t) > 0))

  /** BPE-ish subword-piece count: word chunks + digit runs + punct
    * singles, via regex token class — a deterministic proxy for a
    * tokenizer's piece count (Column expression, codegen'd).
    */
  def bpeishTokenCount(c: Column): Column =
    size(filter(split(c, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => length(trim(t)) > 0))

  // ---------- quality scoring ----------

  /** Integer quality signals (exactly SQL-reproducible). */
  def withQualitySignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", wsTokenCount(t))
      .withColumn("n_punct", length(t) - length(regexp_replace(t, "[^\\p{L}\\p{N}\\s]", "")))
      .withColumn("n_digits", length(t) - length(regexp_replace(t, "[0-9]", "")))
      .withColumn("n_upper", length(t) - length(regexp_replace(t, "[A-Z]", "")))
  }

  /** Composite quality score in [0,1] (documented formula):
    * penalizes extreme length, high punct/digit ratios, low stopword
    * ratio. Deterministic double arithmetic over the integer signals.
    */
  def withQualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = withQualitySignals(docs, textCol)
    // stopword hits as a pure Column expression (split + filter HOF +
    // array_contains over a literal array) — stays in whole-stage
    // codegen; the former UDF broke the codegen span here
    val stopArr = array(StopwordProfiles("en").toSeq.sorted.map(lit): _*)
    val stopHits = size(filter(split(lower(col(textCol)), "\\W+"),
      w => array_contains(stopArr, w)))
    d.withColumn("stop_hits", coalesce(stopHits, lit(0)))
      .withColumn("len_score",
        least(col("n_tokens").cast("double") / lit(20.0), lit(1.0)))
      .withColumn("punct_score",
        greatest(lit(0.0), lit(1.0) - col("n_punct").cast("double") * 4.0 /
          greatest(col("n_chars_m"), lit(1)).cast("double")))
      .withColumn("stop_score",
        least(col("stop_hits").cast("double") * 4.0 /
          greatest(col("n_tokens"), lit(1)).cast("double"), lit(1.0)))
      .withColumn("quality",
        round((col("len_score") + col("punct_score") + col("stop_score")) / 3.0, 6))
  }

  // ---------- intra-document repetition (Gopher-style) ----------

  private def nonEmptyArr(arr: Column): Column = filter(arr, x => x =!= lit(""))

  /** IEEE division of two exact integer counts (bit-identical in any
    * engine — the decontam-fraction precedent); 0.0 on an empty
    * denominator.
    */
  private def safeFrac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  private def charLen(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + length(x))

  /** Word n-grams of the lowercased \W+ tokenization as a Column
    * expression (same tokenization as the dedup/decontam family).
    * Guarded: sequence(1, k) with k < 1 would generate DESCENDING.
    */
  private def wordNgrams(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Occurrence count of the most frequent element — the longest run in
    * the sorted array (O(n log n), a built-in array expression —
    * higher-order functions evaluate interpreted but shuffle-free and
    * UDF-free; a per-element recount would be O(n²) per row).
    */
  private def topRunCount(arr: Column): Column =
    coalesce(
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("best")),
        (st, x) => {
          val run = when(st.getField("prev").isNotNull &&
            st.getField("prev") === x, st.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(st.getField("best"), run).as("best"))
        },
        st => st.getField("best")),
      lit(0L))

  /** Gopher-style repetition signals (Rae et al. 2021, Table A1
    * analogs) — the quality dimension the length/punct/stopword family
    * cannot see: boilerplate-heavy and loop-generated pages repeat
    * lines and n-grams. Every fraction is an IEEE division of exact
    * integer counts, so a SQL engine reproduces the doubles
    * bit-exactly:
    *  - dup_line_frac / dup_line_char_frac — share of non-empty line
    *    instances (resp. their characters) beyond each line's first
    *    occurrence;
    *  - dup_para_frac — the same at \n\n paragraph granularity;
    *  - top_2gram_frac — occurrence share of the most frequent word
    *    2-gram (occurrence-fraction variant of Gopher's char fraction);
    *  - dup_5gram_frac — share of word-5-gram occurrences beyond each
    *    gram's first occurrence.
    * One projection over the text column — no shuffle, no UDF
    * (plan-asserted in TextStatsSpec).
    */
  def withRepetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lines = nonEmptyArr(split(t, "\n"))
    val paras = nonEmptyArr(split(t, "\n\n"))
    val words = nonEmptyArr(split(lower(t), "\\W+"))
    val g2 = wordNgrams(words, 2)
    val g5 = wordNgrams(words, 5)
    docs
      .withColumn("n_lines", size(lines))
      .withColumn("dup_line_frac",
        safeFrac(size(lines) - size(array_distinct(lines)), size(lines)))
      .withColumn("dup_line_char_frac",
        safeFrac(charLen(lines) - charLen(array_distinct(lines)), charLen(lines)))
      .withColumn("dup_para_frac",
        safeFrac(size(paras) - size(array_distinct(paras)), size(paras)))
      .withColumn("n_2grams", size(g2))
      .withColumn("top_2gram_frac", safeFrac(topRunCount(g2), size(g2)))
      .withColumn("dup_5gram_frac",
        safeFrac(size(g5) - size(array_distinct(g5)), size(g5)))
  }

  /** One native pass computing ALL seven repetition signals — the
    * scale path. The Column-expression form above is the executable
    * specification (and what the DuckDB oracle replays), but Spark
    * evaluates higher-order functions interpreted, per element, and the
    * n-gram builders measured ~9 ms/row (5-grams) + ~3.4 ms/row
    * (top-2-gram) on 56-word documents — at 10^12 documents that is the
    * whole job. This UDF computes the identical integer counts in one
    * linear scan (hash-set dedup, rolling gram join) and performs the
    * SAME IEEE divisions, so every output is bit-identical
    * (TextStatsSpec asserts frame equality on fixtures and random
    * corpora; the text_repetition oracle checks this path against
    * DuckDB). Null-intolerant like the split()-based form: callers pass
    * non-null text.
    */
  private[graft] def repSignalsOf(t: String)
      : (Int, Double, Double, Double, Int, Double, Double) = {
    val lines = t.split("\n", -1).filter(_.nonEmpty)
    val paras = t.split("\n\n", -1).filter(_.nonEmpty)
    val words = t.toLowerCase(java.util.Locale.ROOT).split("\\W+", -1)
      .filter(_.nonEmpty)
    def frac(num: Long, den: Long): Double =
      if (den > 0) num.toDouble / den.toDouble else 0.0
    // lines: instance count, distinct count, char sums (code points —
    // Spark's length() counts code points, not UTF-16 units)
    val distinctLines = new java.util.HashSet[String]()
    var lchars = 0L
    var dchars = 0L
    var li = 0
    while (li < lines.length) {
      val s = lines(li)
      val n = s.codePointCount(0, s.length).toLong
      lchars += n
      if (distinctLines.add(s)) dchars += n
      li += 1
    }
    val distinctParas = new java.util.HashSet[String]()
    paras.foreach(distinctParas.add)
    // top 2-gram occurrence count (max multiplicity)
    val n2 = if (words.length >= 2) words.length - 1 else 0
    var top2 = 0L
    if (n2 > 0) {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < words.length - 1) {
        val c = m.merge(words(i) + " " + words(i + 1), 1, Integer.sum(_, _))
        if (c.intValue > top2) top2 = c.intValue.toLong
        i += 1
      }
    }
    // duplicate 5-gram occurrence share
    val n5 = if (words.length >= 5) words.length - 4 else 0
    var d5 = 0
    if (n5 > 0) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + 5 <= words.length) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < 5) { sb.append(' ').append(words(i + j)); j += 1 }
        if (seen.add(sb.toString)) d5 += 1
        i += 1
      }
    }
    (lines.length,
      frac(lines.length.toLong - distinctLines.size, lines.length.toLong),
      frac(lchars - dchars, lchars),
      frac(paras.length.toLong - distinctParas.size, paras.length.toLong),
      n2, frac(top2, n2.toLong), frac(n5.toLong - d5, n5.toLong))
  }

  private val repSignalsUdf = udf((t: String) => repSignalsOf(t))

  /** [[withRepetitionSignals]] via the single-pass native scan — same
    * columns, bit-identical values (see [[repSignalsOf]]). The struct
    * is computed once per row (ScalaUDF is codegen-compatible, so
    * whole-stage subexpression elimination shares it across the seven
    * field extracts).
    */
  def withRepetitionSignalsFast(docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.withColumn("__rep", repSignalsUdf(col(textCol)))
      .withColumn("n_lines", col("__rep._1"))
      .withColumn("dup_line_frac", col("__rep._2"))
      .withColumn("dup_line_char_frac", col("__rep._3"))
      .withColumn("dup_para_frac", col("__rep._4"))
      .withColumn("n_2grams", col("__rep._5"))
      .withColumn("top_2gram_frac", col("__rep._6"))
      .withColumn("dup_5gram_frac", col("__rep._7"))
      .drop("__rep")

  /** Repetition keep-filter with Gopher-flavored default thresholds —
    * the survivor set a corpus release would train on (the fast signal
    * pass; values identical to the Column-expression form).
    */
  def repetitionKeep(docs: DataFrame, textCol: String = "text",
      maxDupLineFrac: Double = 0.30,
      maxTop2GramFrac: Double = 0.20,
      maxDup5GramFrac: Double = 0.15): DataFrame =
    withRepetitionSignalsFast(docs, textCol)
      .filter(col("dup_line_frac") <= maxDupLineFrac &&
        col("top_2gram_frac") <= maxTop2GramFrac &&
        col("dup_5gram_frac") <= maxDup5GramFrac)
      .select(docs.columns.map(col): _*)

  // ---------- document fingerprinting ----------

  /** 64-bit rolling (Rabin-Karp-style) content fingerprint over the
    * normalized text — stable under whitespace-only edits.
    */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L // prime
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  val fingerprintUdf = udf((s: String) => fingerprint64(s))
}
