package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last stage of a training-corpus build:
  * turning variable-length documents into fixed-context-length
  * training sequences. Two standard policies:
  *
  *   - [[concatChunkSlices]] (concat-and-chunk): documents are
  *     concatenated into a token stream and cut every `ctxLen` tokens;
  *     a document may straddle a cut. Zero waste, GPT-style.
  *   - [[greedyPack]] (no-split greedy fill): a document never crosses
  *     a sequence boundary; a new sequence opens when the current one
  *     cannot fit the next document whole. Wasted tail tokens per
  *     sequence, but every training example sees only whole documents.
  *
  * Both are deterministic and partition-invariant: documents are
  * assigned to independent `nShards` streams by the same md5-prefix
  * uniform hash the split/sampling operators use ([[Corpus.hash32]],
  * salt "pack"), and packed in key order within the shard. No global
  * sort anywhere — the concat variant is ONE shuffle (the window's
  * hash partitioning on shard) and the greedy variant one
  * repartition+local sort; each shard packs independently, so the job
  * parallelizes to min(nShards, cores) and scales by raising nShards
  * (at 10^12 docs, nShards ~ number of output files). All arithmetic
  * is integer, so a SQL oracle replays the assignment bit-exactly
  * (window cumsum for chunks; recursive CTE for the greedy fill).
  */
object Packing {

  /** shard in [0, nShards) — pure function of the document key. */
  def shardCol(keyCol: String, nShards: Int) =
    pmod(Sampling.keyHash(keyCol, "pack"), lit(nShards.toLong)).cast("int")

  /** Concat-and-chunk packing manifest: one row per (document ×
    * overlapped sequence) slice. `tok_start` is the document's offset
    * in its shard's token stream; `seq_in_shard` the sequence index
    * cut every `ctxLen` tokens; `doc_off`/`seq_off`/`len` describe the
    * slice (a straddling document emits one row per sequence it
    * touches). Documents with zero tokens are dropped (they occupy no
    * stream positions).
    */
  def concatChunkSlices(
      docs: DataFrame,
      ctxLen: Long,
      nShards: Int,
      tokensCol: String = "n_tokens",
      keyCol: String = "doc_id"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val w = Window.partitionBy("shard").orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .where(col(tokensCol) > 0)
      .withColumn("shard", shardCol(keyCol, nShards))
      .withColumn("tok_start",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)).cast("long"))
      .withColumn("seq_in_shard", explode(sequence(
        expr(s"tok_start div $ctxLen"),
        expr(s"(tok_start + $tokensCol - 1) div $ctxLen"))))
      .withColumn("slice_begin",
        greatest(col("tok_start"), col("seq_in_shard") * ctxLen))
      .withColumn("slice_end",
        least(col("tok_start") + col(tokensCol),
          (col("seq_in_shard") + 1) * ctxLen))
      .withColumn("doc_off", col("slice_begin") - col("tok_start"))
      .withColumn("seq_off", col("slice_begin") - col("seq_in_shard") * ctxLen)
      .withColumn("len", col("slice_end") - col("slice_begin"))
      .drop("slice_begin", "slice_end")
  }

  /** No-split greedy packing: in key order within the shard, a
    * document joins the current sequence iff it fits whole
    * (`fill + n <= ctxLen`); otherwise it opens the next one. A
    * document longer than `ctxLen` gets a sequence of its own,
    * flagged `oversize` (truncate-or-drop is the caller's policy —
    * this operator loses nothing). One repartition on shard + local
    * sort; the fold is per-shard sequential but shards run in
    * parallel, so scale = nShards.
    */
  def greedyPack(
      docs: DataFrame,
      ctxLen: Long,
      nShards: Int,
      tokensCol: String = "n_tokens",
      keyCol: String = "doc_id"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(col(tokensCol) > 0)
      .select(col(keyCol).cast("long").as("doc_id"),
        shardCol(keyCol, nShards).as("shard"),
        col(tokensCol).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Int, Long)]
      .mapPartitions { rows =>
        var shard = -1
        var fill = 0L
        var seq = -1L
        rows.map { case (d, sh, n) =>
          if (sh != shard) { shard = sh; fill = 0L; seq = -1L }
          if (seq < 0 || fill + n > ctxLen) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          (d, sh, n, seq, off, n > ctxLen)
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "seq_in_shard", "off_in_seq",
        "oversize")
  }

  /** Per-sequence utilization of a packing manifest (either variant):
    * documents/slices per sequence, filled tokens, and the wasted
    * tail. One hash aggregation.
    */
  def packStats(manifest: DataFrame, ctxLen: Long): DataFrame = {
    val lenCol =
      if (manifest.columns.contains("len")) col("len") else col("n_tokens")
    manifest.groupBy("shard", "seq_in_shard")
      .agg(count(lit(1)).as("n_docs"), sum(lenCol).as("fill"))
      .withColumn("waste", lit(ctxLen) - col("fill"))
  }
}
