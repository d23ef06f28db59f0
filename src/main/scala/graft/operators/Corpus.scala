package graft.operators

import graft.model.{Ent, Sentence}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Corpus/fixture tooling (SURVEY.md §2: S8 train/dev/test splits, F7
  * doi↔filename escaping, F8 entity masking, P4 annotated-example
  * filter). These back model-training corpus preparation in the
  * reference; here they are deterministic Dataset transforms.
  */
object Corpus {

  /** F7: doi → filesystem-safe name (cprex/corpus/corpus.py:201,209)
    * and its inverse (corpus.py:131).
    *
    * Documented deviation: the reference maps '/'→'_' and back, which is
    * NOT injective for DOIs containing '_' ("10.1/ab_cd" and
    * "10.1_ab/cd" collide — real DOIs contain underscores). Since this
    * API is advertised as a round-trip, we use an injective escape:
    * '_'→"__", '/'→"_-". Decoding scans left-to-right; every '_' in an
    * encoded name starts an escape pair, so the next char ('_' vs '-')
    * disambiguates. Underscore-free DOIs still produce readable names.
    */
  def doiToFilename(doi: String): String =
    doi.replace("_", "__").replace("/", "_-")

  def filenameToDoi(name: String): String = {
    val sb = new StringBuilder(name.length)
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == '_' && i + 1 < name.length) {
        name.charAt(i + 1) match {
          case '_' => sb.append('_'); i += 2
          case '-' => sb.append('/'); i += 2
          case _   => sb.append(c); i += 1 // not produced by the encoder
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** F8: masking transform (cprex/rel/parse_data.py:76-87): replace
    * each entity's text by its LABEL, shifting all downstream offsets.
    * Returns (maskedText, maskedEnts) with ents spanning their label
    * occurrences. Entities must be sorted by startChar (parse_data.py:74).
    */
  def mask(text: String, ents: Array[Ent]): (String, Array[Ent]) = {
    var t = text
    var offset = 0
    val out = new Array[Ent](ents.length)
    var i = 0
    while (i < ents.length) {
      val e = ents(i)
      t = t.substring(0, e.startChar + offset) + e.label +
        t.substring(e.endChar + offset)
      val diff = e.label.length - (e.endChar - e.startChar)
      out(i) = e.copy(startChar = e.startChar + offset,
        endChar = e.endChar + offset + diff, text = e.label)
      offset += diff
      i += 1
    }
    (t, out)
  }

  /** Portable deterministic uniform hash in [0, 2^32): unsigned int
    * from the first 8 hex chars of md5(url:sentId). md5 is available
    * identically in Spark and DuckDB, so every hash-derived assignment
    * below is exactly reproducible by the driver's SQL oracle
    * (DuckDB: ('0x' || substr(md5(k),1,8))::BIGINT).
    */
  def hash32(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")

  /** Standard (url, sentId) key, optionally salted for independent
    * secondary assignments.
    */
  def sentKey(salt: String = ""): org.apache.spark.sql.Column =
    if (salt.isEmpty) concat_ws(":", col("url"), col("sentId").cast("string"))
    else concat_ws(":", col("url"), col("sentId").cast("string"), lit(salt))

  /** S8 + P4: deterministic train/dev/test split at the reference's
    * 0.8/0.1/0.1 ratios (parse_data.py:227-231), after dropping
    * un-annotated examples (total_annotations == 0, parse_data.py:207-209
    * — here: sentences with no entities). The reference uses a random
    * sklearn split; this engine is seed-free end-to-end, so the split is
    * a hash of (url, sentId) — stable across runs and partitionings,
    * which is exactly what resumable corpus builds need at scale.
    */
  def split(sents: Dataset[Sentence]): DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.filter(_.ents.nonEmpty)
      .withColumn("fold_hash", hash32(sentKey()) % 10)
      .withColumn("fold",
        when(col("fold_hash") < 8, "train")
          .when(col("fold_hash") === 8, "dev")
          .otherwise("test"))
      .drop("fold_hash")
  }

  /** S8 cv option: stratified k-fold (parse_data.py:236-250). The
    * reference runs sklearn StratifiedKFold with y = "doc has a
    * has_value relation" and then halves each held-out fold into
    * dev/test. Deterministic distributed analog: the fold is a uniform
    * hash of (url, sentId); because the hash is independent of the
    * stratum label, each fold preserves the positive/negative class
    * ratio in expectation (exact-balance shuffling like sklearn's would
    * need a global sort — a deliberate scale trade, and the per-fold
    * class ratios are asserted in CorpusSpec). Output columns:
    * stratum (1 = has relation), fold_id in [0,k), heldout_role
    * (dev|test) — when evaluating fold f, rows with fold_id = f are
    * held out in that role and the rest are train.
    */
  def kfoldStratified(sents: Dataset[Sentence], k: Int = 5): DataFrame = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.filter(_.ents.nonEmpty)
      .withColumn("stratum", (size(col("rels")) > 0).cast("int"))
      .withColumn("fold_id", (hash32(sentKey()) % k).cast("int"))
      .withColumn("heldout_role",
        when(hash32(sentKey("role")) % 2 === 0, "dev").otherwise("test"))
  }

  /** S8 sink: write the split corpus partitioned by fold (DocBin-file
    * analog, parse_data.py:253-295).
    */
  def writeSplits(sents: Dataset[Sentence], outDir: String): Unit =
    split(sents)
      .write.mode("overwrite").partitionBy("fold").parquet(outDir)
}
