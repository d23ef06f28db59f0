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

  // ---------- IVF (inverted-file) ANN ----------

  /** Deterministic coarse-quantizer centroids: the vectors of the
    * `nlist` corpus rows with the smallest murmur(vec_id) — a seeded
    * stand-in for a trained k-means coarse quantizer (training is an
    * offline concern; the INDEX structure — cell assignment, inverted
    * lists, multi-cell probing — is what the operator exercises).
    * nlist is small; the centroid table rides as a broadcast value.
    */
  def ivfCentroids(
      corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): Array[(Int, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (MurmurHash3.stringHash(s"ivf:$id", 4242), id, v) }
      .toDF("h", "id", "v")
      .orderBy("h", "id").limit(nlist)
      .select("v").as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }
  }

  private def nearestCells(v: Seq[Float], cents: Array[(Int, Array[Float])], n: Int): Array[Int] = {
    cents.map { case (cell, c) =>
      var dot = 0.0; var na = 0.0; var nc = 0.0
      var j = 0
      while (j < v.length) {
        dot += v(j) * c(j); na += v(j) * v(j); nc += c(j) * c(j); j += 1
      }
      (cell, dot / (math.sqrt(na) * math.sqrt(nc)))
    }.sortBy { case (cell, cos) => (-cos, cell) }.take(n).map(_._1)
  }

  /** (id, cell) inverted-file assignment — each corpus vector goes to
    * its nearest centroid cell. Exposed for the driver dump so the
    * probe/candidate logic is SQL-oracle-checkable (ints only).
    */
  def ivfAssign(
      corpus: DataFrame, cents: Array[(Int, Array[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val cellUdf = udf((v: Seq[Float]) => nearestCells(v, bc.value, 1)(0))
    corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("cell", cellUdf(col("v")))
      .select("id", "cell")
  }

  /** (query_id, cell) probe list — each query probes its nProbe nearest
    * cells (dump-exposed for the oracle, like ivfAssign).
    */
  def ivfProbes(
      queries: DataFrame, cents: Array[(Int, Array[Float])], nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val probesUdf = udf((v: Seq[Float]) => nearestCells(v, bc.value, nProbe))
    queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(probesUdf(col("qv"))))
      .select("query_id", "cell")
  }

  /** IVF ANN top-k: corpus partitioned into nlist inverted lists by
    * nearest centroid; each query scans only its nProbe nearest cells
    * and ranks exactly within — per-query work drops from O(corpus) to
    * O(nProbe × corpus/nlist). The second scale path next to `lshTopK`
    * (recall vs brute force asserted in SimilaritySpec).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"
  ): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"), col(vecCol).as("cv"))
    val assigned = ivfAssign(corpus, cents, idCol, vecCol)
      .select(col("id").as("corpus_id"), col("cell"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val probes = ivfProbes(queries, cents, nProbe, idCol, vecCol)
    val scored = c.join(assigned, Seq("corpus_id"))
      .join(broadcast(probes.join(q, Seq("query_id"))), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
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
