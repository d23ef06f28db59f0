package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — CCNet's signature pre-dedup move:
  * a line (normalized) that appears in more than `maxDocFreq` distinct
  * documents is boilerplate (cookie banners, nav menus, footers) and
  * is struck from every document, preserving the order of the
  * surviving lines. Document-level dedup can't see this (every page
  * differs); line-level frequency can.
  *
  * Scale shape: lines ride the corpus-frequency aggregation as 64-bit
  * fingerprints only (the codegen'd [[GraftFunctions.fingerprint64]],
  * which lowercases and collapses whitespace first, exactly CCNet's
  * normalization) — the exchange carries (hash, doc) pairs, never
  * line text. The blocklist is collected and broadcast: it is
  * BOUNDED BY CONSTRUCTION at total-line-occurrences / maxDocFreq
  * entries (each blocked hash accounts for > maxDocFreq occurrences),
  * the same bounded-collect discipline as the ANN centroids. The
  * rewrite itself is then a ZERO-EXCHANGE per-document projection: an
  * in-row filter of the split lines against the broadcast hash set
  * (set membership is O(1) per line — a Column `array_contains` scan
  * would be O(|blocklist|) per line, unacceptable at the ~1e6-entry
  * blocklists a web corpus produces).
  *
  * Hash-collision caveat (disclosed, standard for hash-keyed dedup):
  * two distinct normalized lines colliding in 64 bits are counted —
  * and potentially removed — together. The SQL oracle groups by the
  * SAME hash expression, so it replays engine semantics exactly,
  * collisions included.
  */
object Lines {

  /** (doc, pos, line, h): the exploded line table with the normalized
    * 64-bit fingerprint.
    */
  def lineTable(
      docs: DataFrame,
      textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame =
    docs
      .select(col(keyCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", GraftFunctions.fingerprint64(col("line")))

  /** Distinct-document frequency per normalized-line hash. Two hash
    * aggregations over (h, doc) int pairs.
    */
  def lineDocFreq(
      docs: DataFrame,
      textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame =
    lineTable(docs, textCol, keyCol)
      .select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("doc_freq"))

  /** The boilerplate blocklist: hashes of lines in more than
    * `maxDocFreq` distinct documents (strict >). Bounded collect (see
    * class doc).
    */
  def boilerplateHashes(
      docs: DataFrame, maxDocFreq: Long,
      textCol: String = "text",
      keyCol: String = "doc_id"): Set[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    lineDocFreq(docs, textCol, keyCol)
      .where(col("doc_freq") > maxDocFreq)
      .select("h").as[Long].collect().toSet
  }

  /** Strike boilerplate lines from every document: `clean_text` keeps
    * the surviving lines in original order (empty string if every
    * line was boilerplate). Zero-exchange projection given the
    * broadcast blocklist.
    */
  def removeBoilerplate(
      docs: DataFrame, maxDocFreq: Long,
      textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(
      boilerplateHashes(docs, maxDocFreq, textCol, keyCol))
    val cleanUdf = udf((lines: Seq[String]) =>
      if (lines == null) "" // NULL text -> empty, like the all-struck doc
      else lines.filter(l => !bc.value.contains(TextStats.fingerprint64(l)))
        .mkString("\n"))
    docs.withColumn("clean_text", cleanUdf(split(col(textCol), "\n")))
  }
}
