package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for a training-corpus release — the
  * scrub pass that runs between quality filtering and the final write
  * (emails, phone numbers, IP addresses, SSN- and credit-card-shaped
  * digit runs). Everything is regexp Column expressions: one
  * projection, no shuffle, no UDF.
  *
  * The patterns are deliberately restricted to the regex subset that
  * behaves identically in Java regex (Spark) and RE2 (DuckDB, and the
  * Go/Rust scanners a production pipeline would pair this with): no
  * lookarounds, no backreferences, explicit character classes only.
  * That keeps the whole stage SQL-replayable — the driver oracle
  * recomputes both the per-category counts and the redacted text
  * character-exactly.
  *
  * Redaction order matters and is fixed: email → SSN → credit card →
  * phone → IPv4. SSN/CC run before phone because their dashed digit
  * runs are substrings a greedy phone pattern would otherwise consume;
  * IPv4 runs last because nothing else matches dotted quads.
  */
object Pii {

  /** (name, pattern, replacement) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("cc", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b", "<CC>"),
    ("phone", "\\+\\d{7,15}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  )

  /** Per-category match counts plus the total. Counts run over the RAW
    * text independently (detection is a reporting concern); redaction
    * applies the same patterns sequentially (order above).
    */
  def withPiiSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val counted = Patterns.foldLeft(docs) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(t, lit(pat)))
    }
    counted.withColumn("n_pii",
      Patterns.map { case (name, _, _) => col(s"n_$name") }
        .reduce(_ + _))
  }

  /** The redacted text as a Column — sequential regexp_replace in the
    * fixed order documented above.
    */
  def redacted(textCol: Column): Column =
    Patterns.foldLeft(textCol) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Corpus with `text` replaced by its redacted form (original text
    * dropped — a release artifact must not carry the raw column).
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redacted(col(textCol)))

  /** Documents with no detected PII at all (the strictest release
    * policy — drop rather than redact).
    */
  def piiFree(docs: DataFrame, textCol: String = "text"): DataFrame =
    withPiiSignals(docs, textCol)
      .filter(col("n_pii") === 0)
      .select(docs.columns.map(col): _*)
}
