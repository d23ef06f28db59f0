package graft.operators

import graft.model.Sentence
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A4/A5: relation-extraction micro P/R/F scoring + threshold sweep.
  *
  * Reference semantics:
  *  - score_relations (cprex/rel/rel_pipe.py:209-230): iterate PRED
  *    pairs; prob >= threshold → tp if the pair is gold-positive else
  *    fp; prob < threshold and gold-positive → fn. (Gold pairs with no
  *    pred entry are not counted — the extractor materializes every
  *    candidate, so pred keys ⊇ gold keys by construction; same here.)
  *  - threshold sweep (cprex/rel/evaluate.py:71-85): the 13 thresholds
  *    below, verbatim.
  *
  * Spark shape (SURVEY.md A5): one explode of the threshold literal
  * array over the joined pred⟕gold edge table, then a single
  * groupBy(threshold) partial+final aggregation — the sweep costs one
  * shuffle of 13×|edges| compact rows, not 13 jobs.
  */
object Evaluate {

  /** evaluate.py:71-85, verbatim. */
  val Thresholds: Array[Double] =
    Array(0.0, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99, 0.999)

  /** Edge table (url, sent_id, head_tok, tail_tok, label, score) from
    * annotated sentences.
    */
  def relEdges(sents: Dataset[Sentence]): DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.flatMap(s => s.rels.map(r => (s.url, s.sentId, r.headTok, r.tailTok,
        r.label, r.score)))
      .toDF("url", "sent_id", "head_tok", "tail_tok", "label", "score")
  }

  /** Deterministic stand-in for the reference's `random.uniform(0, 1)`
    * baseline scores (evaluate.py:52-69): a uniform hash of the pair
    * key into [0, 1). Uses md5 (identical in Spark and DuckDB) so the
    * baseline sweep is exactly reproducible by the driver's SQL oracle.
    */
  def pseudoRandomScore(url: org.apache.spark.sql.Column,
      sentId: org.apache.spark.sql.Column,
      headTok: org.apache.spark.sql.Column,
      tailTok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws(":", url, sentId.cast("string"),
      headTok.cast("string"), tailTok.cast("string"), lit("rnd"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** A5 with the reference's random baseline (evaluate.py:71-99): the
    * model sweep plus the same 13 thresholds scored against
    * pseudo-random pair scores — the sanity floor a real scorer must
    * clear. Output adds a `scorer` column (model | random).
    */
  def thresholdSweepWithBaseline(
      pred: Dataset[Sentence],
      gold: Dataset[Sentence],
      goldPositiveThreshold: Double = Relations.ExtractionThreshold
  ): DataFrame = {
    val predEdges = relEdges(pred)
    val randEdges = predEdges.withColumn("score",
      pseudoRandomScore(col("url"), col("sent_id"), col("head_tok"), col("tail_tok")))
    val goldEdges = relEdges(gold)
      .filter(col("score") >= goldPositiveThreshold)
      .withColumn("gold_pos", lit(true))
      .drop("score")
    sweepEdges(predEdges, goldEdges).withColumn("scorer", lit("model"))
      .unionByName(
        sweepEdges(randEdges, goldEdges).withColumn("scorer", lit("random")))
  }

  /** Micro P/R/F per threshold: pred edges left-join gold-positive edges
    * on the pair key, explode thresholds, aggregate once.
    *
    * @param goldPositiveThreshold gold edges with score >= this are the
    *   positive class (binary 1.0 hand-authored annotations in the
    *   fixture gold; the threshold generalizes to score-valued gold).
    */
  def thresholdSweep(
      pred: Dataset[Sentence],
      gold: Dataset[Sentence],
      goldPositiveThreshold: Double = Relations.ExtractionThreshold
  ): DataFrame = {
    val predEdges = relEdges(pred)
    val goldEdges = relEdges(gold)
      .filter(col("score") >= goldPositiveThreshold)
      .withColumn("gold_pos", lit(true))
      .drop("score")
    sweepEdges(predEdges, goldEdges)
  }

  private def sweepEdges(predEdges: DataFrame, goldEdges: DataFrame): DataFrame = {
    val key = Seq("url", "sent_id", "head_tok", "tail_tok", "label")
    val joined = predEdges.join(goldEdges, key, "left_outer")
      .withColumn("gold_pos", coalesce(col("gold_pos"), lit(false)))
    val swept = joined.withColumn("threshold",
      explode(lit(Thresholds)))
    swept.groupBy("threshold").agg(
        sum(when(col("score") >= col("threshold") && col("gold_pos"), 1)
          .otherwise(0)).as("tp"),
        sum(when(col("score") >= col("threshold") && !col("gold_pos"), 1)
          .otherwise(0)).as("fp"),
        sum(when(col("score") < col("threshold") && col("gold_pos"), 1)
          .otherwise(0)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))).otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
      .orderBy("threshold")
  }
}
