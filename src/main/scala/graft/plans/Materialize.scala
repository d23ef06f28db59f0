package graft.plans

import graft.model.{Page, Sentence, Triple}
import graft.operators.{Canonicalize, Linking}
import graft.sources.ChemDict
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S2/S7-analog: stage materialization with Iceberg-style layout,
  * per-partition lineage rows, and checkpoint-resumable stage
  * boundaries (north rule).
  *
  * No Iceberg runtime jar exists in this sandbox (documented deviation,
  * BASELINE.md): the layout is Iceberg-like partitioned Parquet plus
  * self-written manifest/lineage tables:
  *
  *   out/
  *     triples/data/bucket=[b]/part-....parquet  (hash-partitioned by url)
  *     triples/manifest/part-....parquet         (stage,bucket,rows,t0,t1)
  *     linked/data/, entities/data/              (graph tables)
  *
  * Resume semantics = the reference's `processed` flag + file-exists
  * skip (cprex/corpus/corpus.py:199-214, chemrxiv.py:126-127) lifted to
  * partition granularity: a completed bucket is recorded in the
  * manifest; on restart, pages whose bucket is already manifested are
  * skipped (an anti-join against the manifest — cheap: manifest has one
  * row per bucket, broadcast).
  *
  * Scale note: bucket count B is the resume granularity; at 10^12 docs
  * you'd set B ~ 10^5 so one bucket ≈ 10^7 docs. Writes stream through
  * — no collect; lineage rows come from the same pass's per-bucket
  * counts (one extra narrow aggregation per stage).
  */
object Materialize {

  val StageTriples = "triples"

  def withBucket(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("bucket", pmod(hash(col("url")), lit(buckets)))

  def manifestPath(outDir: String): String = s"$outDir/$StageTriples/manifest"
  def dataPath(outDir: String): String = s"$outDir/$StageTriples/data"
  def metaPath(outDir: String): String = s"$outDir/$StageTriples/table_meta.json"

  /** Record the table's bucket count B next to the manifest (Iceberg
    * table-metadata analog). The bucket-pruning predicate in
    * `readTriplesForUrl` MUST use the same B the table was written
    * with — a caller-supplied mismatch would compute pmod(hash(url), B')
    * pointing at the wrong partition and silently return zero rows.
    */
  private def writeMeta(spark: SparkSession, outDir: String, buckets: Int): Unit = {
    val path = new org.apache.hadoop.fs.Path(metaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      val out = fs.create(path, true)
      out.write(s"""{"buckets":$buckets}""".getBytes("UTF-8"))
      out.close()
    }
  }

  /** Bucket count the table was written with (from table_meta.json). */
  def tableBuckets(spark: SparkSession, outDir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(metaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"no table metadata at ${metaPath(outDir)}")
    val in = fs.open(path)
    val s = scala.io.Source.fromInputStream(in).mkString
    in.close()
    """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s) match {
      case Some(m) => m.group(1).toInt
      case None => sys.error(s"malformed table metadata: $s")
    }
  }

  /** Buckets already completed in a previous run (empty on first run). */
  def completedBuckets(spark: SparkSession, outDir: String): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(manifestPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Set.empty
    else spark.read.parquet(manifestPath(outDir))
      .select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
  }

  /** Run the triple-extraction pipeline over `pages`, materializing
    * results partitioned by bucket, skipping buckets already in the
    * manifest. Returns the number of buckets processed this run.
    */
  def runResumable(
      spark: SparkSession,
      pages: Dataset[Page],
      outDir: String,
      buckets: Int = 16,
      onlyBuckets: Option[Set[Int]] = None // test hook: simulate partial run
  ): Int = {
    val done = completedBuckets(spark, outDir)
    writeMeta(spark, outDir, buckets)

    // resume filter: drop pages of completed buckets BEFORE any work
    val remaining = pages
      .withColumn("bucket", pmod(hash(col("url")), lit(buckets)))
      .filter(!col("bucket").isin(done.toSeq: _*))
      .filter(onlyBuckets match {
        case Some(bs) => col("bucket").isin(bs.toSeq: _*)
        case None => lit(true)
      })
      .drop("bucket").as[Page](pages.encoder)

    writeTriplesResumable(spark, Pipeline.run(remaining).toDF(), outDir, buckets, done)
  }

  /** Append triples bucketed by url-hash, then record lineage rows for
    * the freshly written buckets. The lineage pass selects ONLY the
    * `bucket` partition column — the scan reads zero data columns
    * (values come from directory names, row counts from parquet
    * footers), so it is metadata-cost, not a second pass over the data.
    */
  private def writeTriplesResumable(
      spark: SparkSession,
      triples: DataFrame,
      outDir: String,
      buckets: Int,
      done: Set[Int]
  ): Int = {
    val t0 = System.currentTimeMillis()
    withBucket(triples, buckets).write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(dataPath(outDir))

    val t1 = System.currentTimeMillis()
    val doneNow = spark.read.parquet(dataPath(outDir))
      .select(col("bucket").cast("int").as("bucket"))
      .filter(!col("bucket").isin(done.toSeq: _*))
      .groupBy("bucket").agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(StageTriples))
      .withColumn("startedAtMs", lit(t0))
      .withColumn("finishedAtMs", lit(t1))
      .select("stage", "bucket", "rows", "startedAtMs", "finishedAtMs")
    doneNow.write.mode(SaveMode.Append).parquet(manifestPath(outDir))
    doneNow.count().toInt
  }

  /** Read the materialized triple table (all completed buckets). */
  def readTriples(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(dataPath(outDir))

  /** J6-analog (doi→docs lookup, cprex/corpus/corpus.py:114-134): fetch
    * one url's triples via partition pruning — the bucket predicate is
    * computable from the url, so the scan touches exactly one bucket
    * directory (PartitionFilters in the plan; asserted in ResumeSpec).
    * At 10^12 rows with B=10^5 buckets this reads 1/B of the table.
    * B comes from the table's own metadata (never caller-supplied: a
    * mismatched B would prune to the wrong partition and silently
    * return zero rows).
    */
  def readTriplesForUrl(spark: SparkSession, outDir: String, url: String): DataFrame = {
    val buckets = tableBuckets(spark, outDir)
    readTriples(spark, outDir)
      .filter(col("bucket") === pmod(hash(lit(url)), lit(buckets)) &&
        col("url") === url)
  }

  /** Materialize the full graph: triples (resumable) + linked triple
    * table + canonical entity table + lineage.
    */
  def materializeGraph(
      spark: SparkSession,
      pages: Dataset[Page],
      outDir: String,
      buckets: Int = 16
  ): Unit = {
    import spark.implicits._
    // ONE NER pass: the annotated sentence table feeds both the triple
    // write and the linking join (previously annotate ran twice)
    val sents = Pipeline.annotate(Pipeline.sentences(pages),
      ChemDict.entries.flatMap(_.synonyms)).persist()
    try {
      val done = completedBuckets(spark, outDir)
      writeMeta(spark, outDir, buckets)
      val remaining = sents
        .withColumn("bucket", pmod(hash(col("url")), lit(buckets)))
        .filter(!col("bucket").isin(done.toSeq: _*))
        .drop("bucket").as[Sentence]
      writeTriplesResumable(spark, Pipeline.triples(remaining).toDF(),
        outDir, buckets, done)
      val triples = readTriples(spark, outDir).drop("bucket").as[Triple]
      val linked = Linking.linkTriples(triples, sents, ChemDict.entries)
      withBucket(linked, buckets).write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$outDir/linked/data")
      Canonicalize.entityTable(spark, ChemDict.entries)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/entities/data")
    } finally sents.unpersist()
  }
}
