package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023): score every document under a TARGET language model (trained
  * on the trusted/high-quality slice) and a RAW model (trained on a
  * plain-corpus slice), take the log importance ratio of the two
  * per-token averages, and accept documents by a deterministic
  * Bernoulli draw with probability min(1, exp(ratio)) — the importance-
  * resampling acceptance rule. Documents that look more like the
  * target than the raw distribution survive with probability 1;
  * raw-typical documents survive proportionally to their ratio.
  *
  * Scale shape: both models are broadcast LUTs (the [[NgramLm]]
  * contract); scoring is ONE bigram pass resolving both models side by
  * side (not two scoring passes), shuffling only doc-keyed partial
  * aggregates; the accept draw reuses the seed-free md5 uniform of the
  * [[Sampling]] recipe — a pure function of doc_id, so the selection
  * replays bit-identically across runs, partitionings, and resumes.
  *
  * Determinism/oracle: both LUTs dump as data with fixed-point lpq
  * columns (the [[NgramLm.Shift]] discipline); per-model sums are
  * associative integer sums (true partial aggregates — no struct-list
  * fold rides the exchange), scaled back exactly, and lw = sum_t/n -
  * sum_r/n in that spelled IEEE order — so `dsir_weights` hash-matches
  * bit-exactly. accept_p = exp(min(lw, 0)) is the one transcendental
  * and passes through as dumped data (the idf/LM-log discipline) under
  * range consistency; `dsir_sample` chains the md5-threshold draw off
  * the dump.
  */
object Dsir {

  /** exp via StrictMath (fdlibm-specified, bit-identical on every JVM
    * and JIT tier) — java.lang.Math.exp's HotSpot intrinsic is allowed
    * 1 ulp of error and can differ BETWEEN COMPILATION TIERS of the
    * same JVM, which would make accept_p (and thus a boundary draw)
    * run-dependent. A UDF here is free: it runs on the post-aggregation
    * one-row-per-document frame, not the token stream.
    */
  private val strictExp = udf((x: Double) => StrictMath.exp(x))

  /** Per-document importance weights against the two broadcast LM
    * tables: (doc_id, n_bigrams, sum_lp_target, sum_lp_raw, lw,
    * accept_p). One bigram pass; docs with < 2 tokens are absent (no
    * evidence, same contract as LM scoring).
    */
  def weights(
      docs: DataFrame, targetLm: DataFrame, rawLm: DataFrame,
      textCol: String = "text", keyCol: String = "doc_id"): DataFrame = {
    val (seenT, backT, oovT) = NgramLm.lutFrames(targetLm, "t")
    val (seenR, backR, oovR) = NgramLm.lutFrames(rawLm, "r")
    NgramLm.bigrams(docs, textCol, keyCol)
      .join(broadcast(seenT), Seq("w1", "w2"), "left")
      .join(broadcast(backT), Seq("w1"), "left")
      .crossJoin(broadcast(oovT))
      .join(broadcast(seenR), Seq("w1", "w2"), "left")
      .join(broadcast(backR), Seq("w1"), "left")
      .crossJoin(broadcast(oovR))
      .withColumn("lpq_t",
        coalesce(col("lpq_seen_t"), col("lpq_backoff_t"), col("lpq_oov_t")))
      .withColumn("lpq_r",
        coalesce(col("lpq_seen_r"), col("lpq_backoff_r"), col("lpq_oov_r")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lpq_t")).as("sum_lpq_t"),
        sum(col("lpq_r")).as("sum_lpq_r"))
      .withColumn("sum_lp_target",
        col("sum_lpq_t").cast("double") / lit(NgramLm.Shift))
      .withColumn("sum_lp_raw",
        col("sum_lpq_r").cast("double") / lit(NgramLm.Shift))
      .withColumn("lw",
        col("sum_lp_target") / col("n_bigrams")
          - col("sum_lp_raw") / col("n_bigrams"))
      .withColumn("accept_p", strictExp(least(col("lw"), lit(0.0))))
      .select("doc_id", "n_bigrams", "sum_lp_target", "sum_lp_raw",
        "lw", "accept_p")
  }

  /** The deterministic importance-resampling draw: keep doc_id iff
    * md5-uniform(doc_id, salt) < accept_p. Seed-free and replayable.
    */
  def sample(weights: DataFrame,
      keyCol: String = "doc_id", salt: String = "dsir"): DataFrame =
    weights.where(Sampling.keyHash(keyCol, salt).cast("double")
      < col("accept_p") * lit(4294967296.0))
}
