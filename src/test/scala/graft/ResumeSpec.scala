package graft

import graft.plans.{Materialize, Pipeline}
import graft.sources.PageGen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** North-rule resumability: restart mid-pipeline yields identical final
  * output (SURVEY.md §5.5).
  */
class ResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val N = 80L
  private val B = 8

  private def tripleKeys(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.selectExpr("concat_ws('|', url, sentId, headLabel, headText, propType, valueText, unit)")
      .collect().map(_.getString(0)).toSet

  test("partial run + resume == single-shot run; lineage complete") {
    val dirA = Files.createTempDirectory("graft-resume-a").toString
    val dirB = Files.createTempDirectory("graft-resume-b").toString
    val pages = PageGen.pages(spark, N)

    // single-shot
    val n1 = Materialize.runResumable(spark, pages, dirA, B)
    assert(n1 == B)

    // simulated failure after half the buckets, then restart
    val firstHalf = (0 until B / 2).toSet
    val nPartial = Materialize.runResumable(spark, pages, dirB, B, Some(firstHalf))
    assert(nPartial == B / 2)
    assert(Materialize.completedBuckets(spark, dirB) == firstHalf)
    val nResume = Materialize.runResumable(spark, pages, dirB, B)
    assert(nResume == B - B / 2)

    val a = tripleKeys(Materialize.readTriples(spark, dirA))
    val b = tripleKeys(Materialize.readTriples(spark, dirB))
    assert(a == b)
    assert(a == tripleKeys(Pipeline.run(pages).toDF()))

    // third run is a no-op (all buckets manifested)
    assert(Materialize.runResumable(spark, pages, dirB, B) == 0)

    // the stored bucket count wins over a mismatched caller argument:
    // resuming with buckets=999 must not renumber/reprocess anything
    assert(Materialize.runResumable(spark, pages, dirB, 999) == 0)
    assert(Materialize.tableBuckets(spark, dirB) == B)

    // lineage: one row per bucket, row counts match the data
    val manifest = spark.read.parquet(Materialize.manifestPath(dirB))
    assert(manifest.select("bucket").distinct().count() == B)
    val lineageTotal = manifest.groupBy().sum("rows").collect()(0).getLong(0)
    assert(lineageTotal == Materialize.readTriples(spark, dirB).count())

    // J6: url lookup is partition-pruned — the scan reads exactly one
    // of the B bucket directories (PartitionFilters on the bucket column)
    val someUrl = Materialize.readTriples(spark, dirA)
      .select("url").limit(1).collect()(0).getString(0)
    // bucket count comes from the table's own metadata, never the caller
    assert(Materialize.tableBuckets(spark, dirA) == B)
    val lookup = Materialize.readTriplesForUrl(spark, dirA, someUrl)
    assert(lookup.count() > 0)
    assert(lookup.select("url").distinct().count() == 1)
    val scan = lookup.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PartitionFilters") && meta.contains("bucket"),
      s"expected bucket partition pruning in scan:\n$meta")
    val pruned = lookup.queryExecution.executedPlan.toString
    assert(!pruned.contains("PartitionFilters: []"),
      "partition filters must not be empty")
  }

  test("materializeGraph: single annotate pass feeds triple write, linking and entity table") {
    val dir = Files.createTempDirectory("graft-mat-graph").toString
    val pages = PageGen.pages(spark, 60)
    Materialize.materializeGraph(spark, pages, dir, buckets = 4)
    val triples = Materialize.readTriples(spark, dir)
    val linked = spark.read.parquet(s"$dir/linked/data")
    val entities = spark.read.parquet(s"$dir/entities/data")
    assert(triples.count() > 0)
    // linked rows = triple rows (left-outer link preserves cardinality)
    assert(linked.count() == triples.count())
    assert(entities.count() == graft.sources.ChemDict.entries.length)
    // rerun is a no-op for the triple stage (all buckets manifested) and
    // produces identical linked output
    val before = tripleKeys(triples)
    Materialize.materializeGraph(spark, pages, dir, buckets = 4)
    assert(tripleKeys(Materialize.readTriples(spark, dir)) == before)
  }

  test("resume fails loudly when the dictionary changed since the table was written") {
    val dir = Files.createTempDirectory("graft-dict-guard").toString
    val pages = PageGen.pages(spark, 20)
    Materialize.runResumable(spark, pages, dir, 4)
    // simulate a dictionary change by tampering the stored content hash
    val metaFile = java.nio.file.Paths.get(Materialize.metaPath(dir))
    val meta = java.nio.file.Files.readString(metaFile)
    java.nio.file.Files.writeString(metaFile,
      meta.replaceAll(""""dict_hash":"[0-9a-f]+"""", """"dict_hash":"deadbeef00000000deadbeef00000000""""))
    // drop the Hadoop local-FS checksum sidecar invalidated by the edit
    java.nio.file.Files.deleteIfExists(
      metaFile.getParent.resolve("." + metaFile.getFileName.toString + ".crc"))
    val e = intercept[IllegalArgumentException] {
      Materialize.runResumable(spark, pages, dir, 4)
    }
    assert(e.getMessage.contains("dictionary changed"))
  }

  test("materializeGraph resumes the linked stage per bucket; complete rerun does no stage work") {
    val dirA = Files.createTempDirectory("graft-mat-res-a").toString
    val dirB = Files.createTempDirectory("graft-mat-res-b").toString
    val pages = PageGen.pages(spark, 60)

    def linkedKeys(dir: String): Set[String] =
      spark.read.parquet(s"$dir/linked/data")
        .selectExpr("concat_ws('|', url, sentId, headText, valueText, cast(cid as string))")
        .collect().map(_.getString(0)).toSet

    // single shot
    Materialize.materializeGraph(spark, pages, dirA, buckets = 4)
    // partial run (buckets 0-1 only), then resume completes 2-3
    Materialize.materializeGraph(spark, pages, dirB, buckets = 4, Some(Set(0, 1)))
    val partial = spark.read.parquet(s"$dirB/linked/manifest")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(partial == Set(0, 1))
    Materialize.materializeGraph(spark, pages, dirB, buckets = 4)
    assert(linkedKeys(dirB) == linkedKeys(dirA))
    assert(linkedKeys(dirB).nonEmpty)

    // a rerun over the fully materialized graph must do no stage work:
    // no triple re-scan, no linking join, no CC rebuild. Direct
    // evidence: every data file untouched (mtime), and the only Spark
    // jobs are the two one-row-per-bucket manifest reads.
    def mtimes(sub: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dirB/$sub")).map(f => f.getPath -> f.lastModified()).toMap
    }
    val beforeFiles = mtimes("triples/data") ++ mtimes("linked/data") ++ mtimes("entities/data")
    assert(beforeFiles.nonEmpty)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Materialize.materializeGraph(spark, pages, dirB, buckets = 4)
      Thread.sleep(1000) // listener bus is async; drain before asserting
    } finally spark.sparkContext.removeSparkListener(listener)
    val afterFiles = mtimes("triples/data") ++ mtimes("linked/data") ++ mtimes("entities/data")
    assert(afterFiles == beforeFiles, "rerun touched materialized data files")
    // each tiny manifest read costs ~3 jobs (file listing + schema +
    // the distinct-collect); stage work would be dozens
    assert(jobs.get() <= 8, s"complete rerun submitted ${jobs.get()} jobs (manifest reads only expected)")
  }
}
