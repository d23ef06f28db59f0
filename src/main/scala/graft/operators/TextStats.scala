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
