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

  /** Repetition keep-filter with Gopher-flavored default thresholds —
    * the survivor set a corpus release would train on.
    */
  def repetitionKeep(docs: DataFrame, textCol: String = "text",
      maxDupLineFrac: Double = 0.30,
      maxTop2GramFrac: Double = 0.20,
      maxDup5GramFrac: Double = 0.15): DataFrame =
    withRepetitionSignals(docs, textCol)
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
