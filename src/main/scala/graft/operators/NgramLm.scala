package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the KenLM/CCNet-style
  * filter of a web-corpus pipeline: train n-gram counts on a trusted
  * reference slice, score every document by its smoothed per-bigram
  * log-probability, and keep documents above a threshold. Documents
  * that look like the reference (natural prose) score high;
  * boilerplate, gibberish, and wrong-language text score low.
  *
  * Scale shape: counting is one hash aggregation over the exploded
  * bigram stream (map-side combine; compact (w1, w2, count) rows); the
  * model table is BROADCAST to the scoring pass, which is one
  * projection + two broadcast left joins + one aggregation — the
  * corpus text never rides an exchange. The broadcast-sized claim is
  * STRUCTURAL, not by contract: [[lmTable]] floors seen bigrams at
  * `minBigramCount` (KenLM prunes singletons by default — a 10-TB
  * reference slice's raw bigram vocabulary is ~1e9-1e10 entries, over
  * any broadcast budget, and the floor is the dial that brings it
  * under; the pruned mass resolves through the backoff/OOV tiers that
  * already exist, exactly KenLM's discipline). Head totals c1 keep
  * counting ALL bigrams, so surviving rows' probabilities are
  * unchanged by the prune.
  *
  * Determinism: counts are integers (fully SQL-replayable); the only
  * transcendental is the smoothed log-probability, so — like the BM25
  * idf — the model table is DUMPED as data and the scoring oracle
  * JOINS it. Log-probs are accumulated in FIXED POINT: the table
  * carries lpq = floor(lp * 2^32 + 0.5), and the per-document sum is a
  * plain integer sum — associative, hence bit-exact and partition-
  * invariant as a true partial aggregate (map-side combine; no
  * position-ordered struct-list fold riding the exchange — the shape
  * that survives 10^12-document scoring). sum_lp = sum_lpq / 2^32
  * (exact power-of-two scaling; quantization error < 2^-32 per
  * bigram), avg_lp one further IEEE division — bit-exact replay.
  *
  * Smoothing: add-one over the reference head counts.
  *   lp(w1,w2) = log((c12 + 1) / (c1 + V))   seen bigram
  *   lp(w1,·)  = log(1 / (c1 + V))           seen head, unseen tail
  *   lp(·,·)   = log(1 / V)                  unseen head (OOV)
  * where c1 = Σ_w2 c12 (head-position count) and V = |ref vocab| + 1.
  */
object NgramLm {

  /** Sentinel for the backoff/OOV rows of the model table — real
    * tokens are never empty (the tokenizer drops empties).
    */
  val Backoff = ""

  /** Fixed-point scale for log-probs: 2^32. */
  val Shift = 4294967296.0

  /** (doc key, pos, w1, w2) bigram stream — pure Column exprs (zip of
    * the token array with its shift, posexplode), no UDF.
    */
  def bigrams(
      docs: DataFrame,
      textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    val ws = Search.searchTokens(col(textCol))
    docs
      .select(col(keyCol).as("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), posexplode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))))
      .select(col("doc_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
  }

  /** Reference bigram counts: (w1, w2, c12, c1) with c1 the
    * head-position total. Integer, fully oracle-checkable.
    */
  def counts(refDocs: DataFrame, textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    val bg = bigrams(refDocs, textCol, keyCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val heads = bg.groupBy("w1").agg(sum("c12").as("c1"))
    bg.join(heads, Seq("w1")).select("w1", "w2", "c12", "c1")
  }

  /** Default seen-bigram floor: singletons never enter the LUT (the
    * KenLM default; see the scale-shape note in the class doc).
    */
  val DefaultMinBigramCount: Long = 2L

  /** The model table: seen-bigram rows with `c12 >= minBigramCount`
    * + one backoff row per seen head (w2 = "") + one global OOV row
    * (w1 = w2 = ""). Floored-out bigrams resolve through their head's
    * backoff row (whose c1 total still counts them — the smoothing
    * denominator is prune-invariant). lp is the one transcendental —
    * this table is the dumped LUT the scoring oracle joins.
    */
  def lmTable(counts: DataFrame, vocabSize: Long,
      minBigramCount: Long = DefaultMinBigramCount): DataFrame = {
    val v = lit(vocabSize.toDouble)
    val seen = counts
      .where(col("c12") >= minBigramCount)
      .select(col("w1"), col("w2"),
        log((col("c12") + lit(1.0)) / (col("c1") + v)).as("lp"))
    val backoff = counts.groupBy("w1").agg(max("c1").as("c1"))
      .select(col("w1"), lit(Backoff).as("w2"),
        log(lit(1.0) / (col("c1") + v)).as("lp"))
    val oov = counts.sparkSession.range(1)
      .select(lit(Backoff).as("w1"), lit(Backoff).as("w2"),
        log(lit(1.0) / v).as("lp"))
    seen.unionByName(backoff).unionByName(oov)
      .withColumn("lpq", floor(col("lp") * lit(Shift) + lit(0.5)).cast("long"))
  }

  /** Reference vocabulary size + 1 (the OOV type). */
  def vocabSize(refDocs: DataFrame, textCol: String = "text"): Long = {
    import refDocs.sparkSession.implicits._
    refDocs.select(explode(Search.searchTokens(col(textCol))).as("w"))
      .distinct().count() + 1
  }

  /** Per-document LM score: n_bigrams, sum_lp = the fixed-point
    * log-prob sum scaled back (exact), and the average (one IEEE
    * division). Two broadcast left joins resolve each bigram to
    * seen / backoff / OOV; the shuffle carries (count, sum) partial
    * aggregates only.
    */
  /** Materialize a broadcast-sized LM table once and split it into the
    * three resolution tiers as small frames (column names suffixed by
    * `sfx` so two models can be resolved side by side — [[Dsir]]).
    * The model is broadcast-sized BY CONTRACT (it is the build side of
    * every scoring join); collecting avoids replaying its counting
    * subplan under each of the three branches.
    */
  private[operators] def lutFrames(
      lm: DataFrame, sfx: String): (DataFrame, DataFrame, DataFrame) = {
    val spark = lm.sparkSession
    import spark.implicits._
    val tag = if (sfx.isEmpty) "" else s"_$sfx"
    val rows = lm.select(col("w1"), col("w2"), col("lpq"))
      .as[(String, String, Long)].collect()
    val seen = rows.filter(_._2 != Backoff).toSeq
      .toDF("w1", "w2", s"lpq_seen$tag")
    val backoff = rows.filter(r => r._2 == Backoff && r._1 != Backoff)
      .map(r => (r._1, r._3)).toSeq.toDF("w1", s"lpq_backoff$tag")
    val oov = rows.filter(r => r._1 == Backoff && r._2 == Backoff)
      .map(_._3).toSeq.toDF(s"lpq_oov$tag")
    (seen, backoff, oov)
  }

  def score(
      docs: DataFrame, lm: DataFrame,
      textCol: String = "text", keyCol: String = "doc_id"): DataFrame = {
    val (seen, backoff, oovLp) = lutFrames(lm, "")
    val resolved = bigrams(docs, textCol, keyCol)
      .join(broadcast(seen), Seq("w1", "w2"), "left")
      .join(broadcast(backoff), Seq("w1"), "left")
      .crossJoin(broadcast(oovLp))
      .withColumn("lpq_r",
        coalesce(col("lpq_seen"), col("lpq_backoff"), col("lpq_oov")))
    resolved
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lpq_r")).as("sum_lpq"))
      .withColumn("sum_lp", col("sum_lpq").cast("double") / lit(Shift))
      .withColumn("avg_lp", col("sum_lp") / col("n_bigrams"))
      .drop("sum_lpq")
  }

  /** The quality keep-filter: documents whose average bigram log-prob
    * under the reference model clears `minAvgLp`.
    */
  def keep(scored: DataFrame, minAvgLp: Double): DataFrame =
    scored.where(col("avg_lp") >= minAvgLp)
}
