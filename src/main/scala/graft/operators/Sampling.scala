package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — the "data recipe" stage of a
  * training-corpus build: every source gets a target weight, w <= 1
  * downsamples (keep a w-fraction), w > 1 upsamples (floor(w) full
  * epochs plus a frac(w)-fraction extra epoch), and the realized
  * corpus is the per-document copy count.
  *
  * Seed-free and partition-invariant: the keep/extra-copy decision for
  * a document is a pure function of its key (the md5-prefix uniform
  * hash the split/kfold operators already use — [[Corpus.hash32]]),
  * NOT of rand() or row position, so the same recipe replays
  * bit-identically across runs, cluster sizes, and resumes — and the
  * DuckDB oracle recomputes the whole assignment exactly (md5 agrees
  * everywhere; the fractional threshold comparison happens in IEEE
  * double on both engines).
  *
  * At 10^12 rows: the weights table is tiny (one row per source) and
  * broadcast — the corpus side never shuffles; copy materialization is
  * an explode whose output size is the recipe's token budget, which is
  * the output the user asked for.
  */
object Sampling {

  private val Two32 = 4294967296.0 // 2^32, the hash32 range

  /** Uniform u in [0, 2^32) per (key, salt) — salted so independent
    * sampling decisions (mixture vs split vs dedup survivor) never
    * correlate.
    */
  def keyHash(keyCol: String, salt: String) =
    Corpus.hash32(concat_ws(":", col(keyCol).cast("string"), lit(salt)))

  /** Adds `w` (the source weight; missing sources get 0.0 = dropped)
    * and `n_copies` = floor(w) + (hash < frac(w) ? 1 : 0). Broadcast
    * join on the per-source weights — no corpus shuffle.
    */
  def mixtureCopies(
      docs: DataFrame,
      weights: Map[String, Double],
      keyCol: String = "doc_id",
      sourceCol: String = "source",
      salt: String = "mix"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF(sourceCol, "w"))
    val h = keyHash(keyCol, salt).cast("double")
    docs.join(wdf, Seq(sourceCol), "left")
      .withColumn("w", coalesce(col("w"), lit(0.0)))
      .withColumn("n_copies",
        (floor(col("w")) +
          when(h < (col("w") - floor(col("w"))) * Two32, 1L).otherwise(0L))
          .cast("long"))
  }

  /** The realized mixture: one row per copy (`copy_idx` in [1,
    * n_copies]); documents with n_copies = 0 vanish. Output size = the
    * recipe's budget.
    */
  def sampleMixture(
      docs: DataFrame,
      weights: Map[String, Double],
      keyCol: String = "doc_id",
      sourceCol: String = "source",
      salt: String = "mix"): DataFrame =
    mixtureCopies(docs, weights, keyCol, sourceCol, salt)
      .where(col("n_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("n_copies"))))
      .drop("w", "n_copies")

  /** Plain deterministic Bernoulli downsample at `rate` (the w <= 1
    * special case without a source dimension).
    */
  def sampleByRate(
      docs: DataFrame,
      rate: Double,
      keyCol: String = "doc_id",
      salt: String = "rate"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    docs.where(keyHash(keyCol, salt).cast("double") < rate * Two32)
  }
}
