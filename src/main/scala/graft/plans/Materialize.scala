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

  /** Record the table's bucket count B and the dictionary content hash
    * next to the manifest (Iceberg table-metadata analog). The
    * bucket-pruning predicate in `readTriplesForUrl` MUST use the same
    * B the table was written with — a caller-supplied mismatch would
    * compute pmod(hash(url), B') pointing at the wrong partition and
    * silently return zero rows. The dict hash guards resume
    * consistency: triples (gazetteer) and linked (cid join) both
    * depend on the dictionary, so resuming manifested buckets under a
    * DIFFERENT dictionary would silently mix annotation vintages.
    */
  private def writeMeta(spark: SparkSession, outDir: String, buckets: Int,
      dictHash: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(metaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      val out = fs.create(path, true)
      out.write(s"""{"buckets":$buckets,"dict_hash":"$dictHash"}""".getBytes("UTF-8"))
      out.close()
    }
  }

  /** The bucket count every write/resume/read path must agree on: once
    * table metadata exists, the STORED B wins and the caller-supplied
    * value is ignored — resuming an existing table with a different
    * `buckets` argument would otherwise silently mix two bucket
    * numberings in one table (wrong resume skips + wrong pruning).
    * A dictionary CHANGE between runs fails loudly instead: completed
    * buckets were annotated/linked under the old dict and cannot be
    * mixed with new-dict output — write to a fresh outDir.
    * First call records the requested B + current dict hash.
    */
  private def resolveBuckets(spark: SparkSession, outDir: String, requested: Int): Int = {
    val path = new org.apache.hadoop.fs.Path(metaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dh = dictHash(ChemDict.entries)
    if (fs.exists(path)) {
      val in = fs.open(path)
      val meta = scala.io.Source.fromInputStream(in).mkString
      in.close()
      """"dict_hash"\s*:\s*"([0-9a-f]+)"""".r.findFirstMatchIn(meta).foreach { m =>
        require(m.group(1) == dh,
          s"dictionary changed since this table was written ($outDir): " +
            "completed buckets hold old-dict annotations — materialize to a fresh outDir")
      }
      tableBuckets(spark, outDir)
    } else { writeMeta(spark, outDir, requested, dh); requested }
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
  def completedBuckets(spark: SparkSession, outDir: String): Set[Int] =
    completedBucketsAt(spark, manifestPath(outDir))

  private def completedBucketsAt(spark: SparkSession, manifest: String): Set[Int] = {
    val path = new org.apache.hadoop.fs.Path(manifest)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Set.empty
    else spark.read.parquet(manifest)
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
    val b = resolveBuckets(spark, outDir, buckets)
    val done = completedBuckets(spark, outDir)

    val attempted = onlyBuckets.getOrElse((0 until b).toSet) -- done
    if (attempted.isEmpty) return 0 // true no-op: no job submitted

    // resume filter: drop pages of completed buckets BEFORE any work
    val remaining = pages
      .withColumn("bucket", pmod(hash(col("url")), lit(b)))
      .filter(col("bucket").isin(attempted.toSeq: _*))
      .drop("bucket").as[Page](pages.encoder)

    appendBucketedWithManifest(spark, Pipeline.run(remaining).toDF(), b,
      s"$outDir/$StageTriples", StageTriples, attempted)
  }

  /** Append stage rows bucketed by url-hash, then record lineage rows
    * for every ATTEMPTED bucket — including row-count-0 buckets, which
    * have no data directory but must still be manifested as complete or
    * a resume would retry them forever. The lineage pass selects ONLY
    * the `bucket` partition column — the scan reads zero data columns
    * (values come from directory names, row counts from parquet
    * footers), so it is metadata-cost, not a second pass over the data.
    */
  private def appendBucketedWithManifest(
      spark: SparkSession,
      rows: DataFrame,
      buckets: Int,
      stageDir: String,
      stage: String,
      attempted: Set[Int]
  ): Int = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    withBucket(rows, buckets).write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(s"$stageDir/data")

    val t1 = System.currentTimeMillis()
    // an all-empty append leaves no readable parquet under data/ — the
    // manifest must still record the attempted buckets (rows=0)
    val counts =
      try spark.read.parquet(s"$stageDir/data")
        .select(col("bucket").cast("int").as("bucket"))
        .filter(col("bucket").isin(attempted.toSeq: _*))
        .groupBy("bucket").agg(count(lit(1)).as("rows"))
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          Seq.empty[(Int, Long)].toDF("bucket", "rows")
      }
    val doneNow = attempted.toSeq.sorted.toDF("bucket")
      .join(counts, Seq("bucket"), "left_outer")
      .withColumn("rows", coalesce(col("rows"), lit(0L)))
      .withColumn("stage", lit(stage))
      .withColumn("startedAtMs", lit(t0))
      .withColumn("finishedAtMs", lit(t1))
      .select("stage", "bucket", "rows", "startedAtMs", "finishedAtMs")
    doneNow.write.mode(SaveMode.Append).parquet(s"$stageDir/manifest")
    attempted.size
  }

  /** Read the materialized triple table (all completed buckets). */
  def readTriples(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(dataPath(outDir))

  // ------------------------------------------------------------------
  // incremental update (latest-crawl-wins upsert)
  // ------------------------------------------------------------------

  def versionsPath(outDir: String): String = s"$outDir/$StageTriples/versions"
  private def stagingPath(outDir: String): String = s"$outDir/$StageTriples/.staging"

  final case class IncrementalStats(appliedUrls: Long, staleUrls: Long,
      affectedBuckets: Set[Int])

  /** Per-url crawl versions currently recorded for the given buckets —
    * (url, warc_ts_ms, bucket), partition-pruned to exactly those
    * bucket directories. Empty when the table predates incremental
    * updates (runResumable-bootstrapped tables have no versions sidecar
    * — every incoming url then counts as newer, which is the correct
    * default for a table whose rows all came from one crawl batch).
    */
  def readVersions(spark: SparkSession, outDir: String,
      buckets: Set[Int]): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(versionsPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty[(String, Long, Int)].toDF("url", "warc_ts_ms", "bucket")
    else spark.read.parquet(versionsPath(outDir))
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .select(col("url"), col("warc_ts_ms"), col("bucket").cast("int").as("bucket"))
  }

  /** Incremental graph maintenance — the only operation mode that
    * exists at 10^12 documents, where "recompute the table" is not a
    * job you run twice. Applies a new crawl batch to an existing triple
    * table with LATEST-CRAWL-WINS semantics per url:
    *
    *  - within the batch, only each url's newest warc_ts row counts;
    *  - a batch row older-or-equal to the url's stored version (the
    *    `versions` sidecar — Iceberg sequence-number analog) is STALE
    *    and dropped, so out-of-order batch re-delivery is harmless;
    *  - applied urls REPLACE their old triples; new urls append.
    *
    * Cost scales with the delta, not the table: touched state is the
    * affected buckets only — the survivors read and the versions read
    * are partition-pruned to pmod(hash(url), B) of applied urls
    * (PartitionFilters, asserted in IncrementalSpec), the extraction
    * pipeline runs over applied pages only, and untouched bucket
    * directories are never opened. At B ~ 10^5 a 0.1% re-crawl batch
    * rewrites ~0.1% of the table.
    *
    * Commit discipline (no Iceberg runtime in this sandbox — manifest
    * append is the commit record, same deviation as the rest of this
    * file): the union of survivors + new triples is staged under
    * .staging first (you cannot overwrite a path you are reading), then
    * dynamically overwrites exactly the affected data partitions, then
    * versions, then the lineage append. Every pre-versions crash window
    * is idempotent: versions still hold the OLD warc_ts, so re-running
    * the same batch re-applies and rewrites the same partitions to the
    * same bytes; once versions are written the data partitions are
    * already fully updated.
    */
  def incrementalUpdate(
      spark: SparkSession,
      newPages: Dataset[Page],
      outDir: String,
      buckets: Int = 16
  ): IncrementalStats = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val b = resolveBuckets(spark, outDir, buckets)

    // newest row per url within the batch (a batch may carry several
    // crawls of one url)
    val latest = newPages.toDF()
      .withColumn("rn", row_number().over(
        Window.partitionBy("url").orderBy(col("warc_ts").desc)))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("warc_ts_ms",
        (col("warc_ts").cast("double") * 1000).cast("long"))
      .withColumn("bucket", pmod(hash(col("url")), lit(b)).cast("int"))

    val stored = readVersions(spark, outDir,
      // prune versions to the batch's own buckets (bounded-size collect:
      // at most B values)
      latest.select("bucket").distinct().collect().map(_.getInt(0)).toSet)

    // applied = strictly newer than the stored version (or unseen url)
    val applied = latest
      .join(stored.select(col("url"), col("warc_ts_ms").as("stored_ms")),
        Seq("url"), "left_outer")
      .filter(col("stored_ms").isNull || col("warc_ts_ms") > col("stored_ms"))
      .drop("stored_ms")

    // compact key set (url, warc_ts_ms, bucket) feeds several plans —
    // persist it, never the html payloads
    val appliedKeys = applied.select("url", "warc_ts_ms", "bucket").persist()
    try {
      val affected = appliedKeys.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val nApplied = appliedKeys.count()
      val nStale = latest.count() - nApplied
      if (affected.isEmpty) return IncrementalStats(0L, nStale, Set.empty)

      val t0 = System.currentTimeMillis()
      val fsData = new org.apache.hadoop.fs.Path(dataPath(outDir))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // survivors: affected buckets' current rows minus re-crawled urls
      // (bucket predicate prunes to exactly those partition dirs);
      // bootstrapping an empty table has no survivors
      val survivors =
        if (!fsData.exists(new org.apache.hadoop.fs.Path(dataPath(outDir))))
          withBucket(spark.emptyDataset[Triple].toDF(), b)
        else readTriples(spark, outDir)
          .filter(col("bucket").isin(affected.toSeq: _*))
          .join(broadcast(appliedKeys.select("url")), Seq("url"), "left_anti")
      val fresh = withBucket(
        Pipeline.run(applied.drop("warc_ts_ms", "bucket").as[Page]).toDF(), b)
      val union = survivors.unionByName(fresh.select(survivors.columns.map(col): _*))

      // stage → commit (cannot overwrite the path being read)
      val staging = stagingPath(outDir)
      union.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$staging/data")
      val newVersions = appliedKeys
        .unionByName(stored.join(broadcast(appliedKeys.select("url")),
          Seq("url"), "left_anti"))
      newVersions.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$staging/versions")

      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        // an all-empty union (every affected row re-crawled into zero
        // triples) leaves no readable parquet under staging — every
        // affected partition is then a pure delete
        val staged =
          try Some(spark.read.parquet(s"$staging/data").persist())
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        staged.foreach {
          _.write.mode(SaveMode.Overwrite).partitionBy("bucket")
            .parquet(dataPath(outDir))
        }
        // dynamic overwrite only replaces partitions PRESENT in the
        // written data — an affected bucket whose rows all belonged to
        // re-crawled urls that now extract zero triples would keep its
        // stale directory; drop exactly those
        val written = staged.map(_.select("bucket").distinct().collect()
          .map(_.get(0).toString.toInt).toSet).getOrElse(Set.empty[Int])
        staged.foreach(_.unpersist())
        (affected -- written).foreach { bk =>
          fsData.delete(new org.apache.hadoop.fs.Path(
            s"${dataPath(outDir)}/bucket=$bk"), true)
        }
        // versions commit: every affected bucket has >= 1 applied url,
        // so no empty-partition hole here
        spark.read.parquet(s"$staging/versions")
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(versionsPath(outDir))
        fsData.delete(new org.apache.hadoop.fs.Path(staging), true)
      } finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)

      // lineage: one row per affected bucket with its post-update count
      val t1 = System.currentTimeMillis()
      val counts = spark.read.parquet(dataPath(outDir))
        .select(col("bucket").cast("int").as("bucket"))
        .filter(col("bucket").isin(affected.toSeq: _*))
        .groupBy("bucket").agg(count(lit(1)).as("rows"))
      affected.toSeq.sorted.toDF("bucket")
        .join(counts, Seq("bucket"), "left_outer")
        .withColumn("rows", coalesce(col("rows"), lit(0L)))
        .withColumn("stage", lit(StageTriples))
        .withColumn("startedAtMs", lit(t0))
        .withColumn("finishedAtMs", lit(t1))
        .select("stage", "bucket", "rows", "startedAtMs", "finishedAtMs")
        .write.mode(SaveMode.Append).parquet(manifestPath(outDir))

      IncrementalStats(nApplied, nStale, affected)
    } finally appliedKeys.unpersist()
  }

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

  val StageLinked = "linked"
  val StageEntities = "entities"

  /** Content hash of the dictionary the entity table was built from —
    * recorded in entities/table_meta.json so an unchanged dict skips
    * the full CC rebuild on resume.
    */
  private def dictHash(dict: Array[graft.model.ChemDictEntry]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    dict.sortBy(_.cid).foreach { e =>
      md.update((e.cid.toString + "|" + e.canonicalName + "|" +
        e.synonyms.mkString(",") + "|" + e.molecularFormula + "|" +
        e.molecularWeight + "|" + e.canonicalSmiles + "|" + e.iupacName + "\n")
        .getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def entitiesMetaPath(outDir: String) = s"$outDir/$StageEntities/table_meta.json"

  private def entitiesUpToDate(spark: SparkSession, outDir: String, hash: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(entitiesMetaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) false
    else {
      val in = fs.open(path)
      val s = scala.io.Source.fromInputStream(in).mkString
      in.close()
      s.contains(s""""dict_hash":"$hash"""")
    }
  }

  private def writeEntitiesMeta(spark: SparkSession, outDir: String, hash: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(entitiesMetaPath(outDir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write(s"""{"dict_hash":"$hash"}""".getBytes("UTF-8"))
    out.close()
  }

  /** Materialize the full graph: triples + linked triple table +
    * canonical entity table + lineage. ALL three stages are resumable:
    * triples and linked at manifest/bucket granularity (append-only,
    * completed buckets are never re-scanned or re-joined), the entity
    * table by dictionary content hash (an unchanged dict skips the CC
    * loop). A rerun over a fully materialized graph submits NO Spark
    * jobs at all (asserted in ResumeSpec via a job listener).
    */
  def materializeGraph(
      spark: SparkSession,
      pages: Dataset[Page],
      outDir: String,
      buckets: Int = 16,
      onlyBuckets: Option[Set[Int]] = None // test hook: simulate partial run
  ): Unit = {
    import spark.implicits._
    val b = resolveBuckets(spark, outDir, buckets)
    val doneT = completedBuckets(spark, outDir)
    val doneL = completedBucketsAt(spark, s"$outDir/$StageLinked/manifest")
    val dHash = dictHash(ChemDict.entries)
    val entitiesDone = entitiesUpToDate(spark, outDir, dHash)
    val only: Set[Int] = onlyBuckets.getOrElse((0 until b).toSet)
    val remainingT = (only -- doneT)
    val remainingL = (only -- doneL)
    if (remainingT.isEmpty && remainingL.isEmpty && entitiesDone) return

    // ONE NER pass: the annotated sentence table feeds both the triple
    // write and the linking join — and only when some stage needs it
    lazy val sents = Pipeline.annotate(Pipeline.sentences(pages),
      ChemDict.entries.flatMap(_.synonyms)).persist()
    val needSents = remainingT.nonEmpty || remainingL.nonEmpty
    try {
      if (remainingT.nonEmpty) {
        val todo = sents
          .withColumn("bucket", pmod(hash(col("url")), lit(b)))
          .filter(col("bucket").isin(remainingT.toSeq: _*))
          .drop("bucket").as[Sentence]
        appendBucketedWithManifest(spark, Pipeline.triples(todo).toDF(), b,
          s"$outDir/$StageTriples", StageTriples, remainingT)
      }
      if (remainingL.nonEmpty) {
        // link ONLY the still-unlinked buckets' triples; the A1 gate +
        // dict join (surface links) is corpus-global, computed from the
        // full annotated table as always
        val todo = readTriples(spark, outDir)
          .filter(col("bucket").isin(remainingL.toSeq: _*))
          .drop("bucket").as[Triple]
        val linked = Linking.linkTriples(todo, sents, ChemDict.entries)
        appendBucketedWithManifest(spark, linked, b,
          s"$outDir/$StageLinked", StageLinked, remainingL)
      }
      if (!entitiesDone) {
        Canonicalize.entityTable(spark, ChemDict.entries)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$StageEntities/data")
        writeEntitiesMeta(spark, outDir, dHash)
      }
    } finally if (needSents) sents.unpersist()
  }
}
