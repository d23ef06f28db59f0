package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  *  - `bruteForceTopK`: exact cosine top-k per query. The baseline: a
  *    broadcast of the (small) query set against the corpus — one pass,
  *    no corpus shuffle, rank via window over (query, score).
  *  - `lshTopK`: random-hyperplane LSH — corpus bucketed by a `bits`-bit
  *    sign signature; queries probe their own bucket (plus optional
  *    1-bit-flip neighbor buckets) and rank exactly within. The scale
  *    path: per-query work drops from O(corpus) to O(bucket).
  *
  * Cosine is a pure Column expression (zip_with + aggregate —
  * whole-stage-codegen'd, no UDF in the scoring hot path); only the
  * signature uses a UDF, evaluated once per row.
  */
object Similarity {

  /** Deterministic random hyperplanes: component j of plane p =
    * murmur-derived value in [-1, 1) — seed-free, reproducible anywhere.
    */
  private def plane(p: Int, j: Int): Float = {
    val h = MurmurHash3.stringHash(s"plane:$p:$j", 31337)
    (h.toDouble / Int.MaxValue).toFloat
  }

  /** Sign-bit signature of a vector under `bits` hyperplanes. */
  def signature(v: Seq[Float], bits: Int): Int = {
    var sig = 0
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var j = 0
      while (j < v.length) { dot += v(j) * plane(p, j); j += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  def signatureUdf(bits: Int) = udf((v: Seq[Float]) => signature(v, bits))

  /** Multi-probe bucket set: a signature plus every 1-bit-flip neighbor
    * (shared by `lshTopK` queries and `Dedup.embeddingPairs` blocking).
    */
  def probes(s: Int, bits: Int): Array[Int] =
    (Seq(s) ++ (0 until bits).map(b => s ^ (1 << b))).toArray

  def probesUdf(bits: Int) = udf((s: Int) => probes(s, bits))

  /** Exact cosine top-k: every query row against every corpus row.
    * `queries` is expected to be small (it is broadcast); rank with a
    * window per query.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", Dedup.cosineCol(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN top-k: candidates share the query's signature
    * bucket or any 1-bit-flip neighbor bucket (multi-probe); exact
    * cosine rank within candidates. Trades recall for a corpus-scan-free
    * probe — recall@k vs brute force is asserted in SimilaritySpec.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val sig = signatureUdf(bits)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bucket", sig(col("cv")))
    // each query probes its bucket + all 1-bit-flip buckets
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", explode(probesUdf(bits)(sig(col("qv")))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", Dedup.cosineCol(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
