package graft

import graft.model.Page
import graft.plans.{Materialize, Pipeline}
import graft.sources.PageGen
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Incremental latest-crawl-wins maintenance of the materialized triple
  * table: equivalence to full recompute, stale/out-of-order rejection,
  * idempotent re-delivery, and delta-only partition touch.
  */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val B = 8

  private def ds(ps: Seq[Page]): Dataset[Page] = {
    import spark.implicits._
    spark.createDataset(ps)
  }

  private def tripleKeys(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.selectExpr("concat_ws('|', url, sentId, headLabel, headText, propType, valueText, unit)")
      .collect().map(_.getString(0)).toSet

  /** Deterministic "re-crawl with changed content" of page i: the body
    * of page i+offset under page i's url, warc_ts shifted forward.
    */
  private def recrawl(i: Long, contentFrom: Long, tsPlusDays: Int): Page = {
    val orig = PageGen.genPage(i).page
    val other = PageGen.genPage(contentFrom).page
    other.copy(url = orig.url,
      warc_ts = new Timestamp(orig.warc_ts.getTime + tsPlusDays * 86400000L))
  }

  test("bootstrap + recrawl/new batch == full recompute over the latest world") {
    val dir = Files.createTempDirectory("graft-incr").toString
    val base = (0L until 40L).map(PageGen.genPage(_).page)
    Materialize.runResumable(spark, ds(base), dir, B)

    // batch: 5 re-crawled-with-new-content urls + 5 brand-new urls
    val recrawled = (10L until 15L).map(i => recrawl(i, i + 500, tsPlusDays = 30))
    val brandNew = (40L until 45L).map(PageGen.genPage(_).page)
    val stats = Materialize.incrementalUpdate(spark, ds(recrawled ++ brandNew), dir, B)
    assert(stats.appliedUrls == 10 && stats.staleUrls == 0)

    val world = base.filterNot(p => recrawled.exists(_.url == p.url)) ++
      recrawled ++ brandNew
    assert(tripleKeys(Materialize.readTriples(spark, dir)) ==
      tripleKeys(Pipeline.run(ds(world)).toDF()))
  }

  test("stale and equal-ts redelivery is rejected; table bytes untouched") {
    val dir = Files.createTempDirectory("graft-incr-stale").toString
    val base = (0L until 20L).map(PageGen.genPage(_).page)
    Materialize.runResumable(spark, ds(base), dir, B)
    val batch = Seq(recrawl(3, 503, tsPlusDays = 30))
    assert(Materialize.incrementalUpdate(spark, ds(batch), dir, B).appliedUrls == 1)
    val keysAfter = tripleKeys(Materialize.readTriples(spark, dir))

    // exact redelivery (equal ts) → stale
    val s1 = Materialize.incrementalUpdate(spark, ds(batch), dir, B)
    assert(s1.appliedUrls == 0 && s1.staleUrls == 1 && s1.affectedBuckets.isEmpty)
    // an OLDER crawl of the same url (the original content) → stale
    val s2 = Materialize.incrementalUpdate(spark,
      ds(Seq(PageGen.genPage(3).page)), dir, B)
    assert(s2.appliedUrls == 0 && s2.staleUrls == 1)
    assert(tripleKeys(Materialize.readTriples(spark, dir)) == keysAfter)
  }

  test("out-of-order batch application converges to the same table") {
    val dirF = Files.createTempDirectory("graft-incr-fwd").toString
    val dirR = Files.createTempDirectory("graft-incr-rev").toString
    val base = (0L until 20L).map(PageGen.genPage(_).page)
    val v2 = Seq(recrawl(5, 505, tsPlusDays = 10), recrawl(6, 506, tsPlusDays = 10))
    val v3 = Seq(recrawl(5, 605, tsPlusDays = 20)) // url 5 crawled again later
    for (d <- Seq(dirF, dirR)) Materialize.runResumable(spark, ds(base), d, B)
    Materialize.incrementalUpdate(spark, ds(v2), dirF, B)
    Materialize.incrementalUpdate(spark, ds(v3), dirF, B)
    // reversed delivery: v3 first, then v2 — url 5's v2 must be rejected
    Materialize.incrementalUpdate(spark, ds(v3), dirR, B)
    val s = Materialize.incrementalUpdate(spark, ds(v2), dirR, B)
    assert(s.appliedUrls == 1 && s.staleUrls == 1) // url 6 applies, url 5 stale
    assert(tripleKeys(Materialize.readTriples(spark, dirF)) ==
      tripleKeys(Materialize.readTriples(spark, dirR)))
  }

  test("delta-only touch: unaffected bucket directories keep their files byte-identical") {
    val dir = Files.createTempDirectory("graft-incr-delta").toString
    val base = (0L until 40L).map(PageGen.genPage(_).page)
    Materialize.runResumable(spark, ds(base), dir, B)

    def fileStamps(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(Materialize.dataPath(dir)))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = fileStamps()
    val stats = Materialize.incrementalUpdate(spark,
      ds(Seq(recrawl(7, 507, tsPlusDays = 30))), dir, B)
    assert(stats.affectedBuckets.size == 1)
    val bk = stats.affectedBuckets.head
    val after = fileStamps()
    val untouchedBefore = before.filterNot(_._1.contains(s"bucket=$bk"))
    val untouchedAfter = after.filterNot(_._1.contains(s"bucket=$bk"))
    assert(untouchedBefore == untouchedAfter,
      "an incremental update must not rewrite unaffected bucket partitions")
    // the affected bucket WAS rewritten
    assert(before.keySet.filter(_.contains(s"bucket=$bk")) !=
      after.keySet.filter(_.contains(s"bucket=$bk")))

    // versions read is partition-pruned (PartitionFilters on bucket)
    val v = Materialize.readVersions(spark, dir, Set(bk))
    v.count()
    val scan = v.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"expected bucket partition pruning in versions scan:\n$scan")
  }

  test("a re-crawl that extracts zero triples erases the url's rows (incl. a whole-bucket delete)") {
    val dir = Files.createTempDirectory("graft-incr-zero").toString
    // find a url alone in its bucket so the zero-triple re-crawl
    // exercises the stale-directory delete path
    val base = (0L until 6L).map(PageGen.genPage(_).page)
      .filter(_.lang == "en")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bucketOf = spark.createDataset(base).toDF()
      .select(col("url"), pmod(hash(col("url")), lit(B)).cast("int").as("bucket"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val loner = bucketOf.groupBy(_._2).collectFirst {
      case (_, m) if m.size == 1 => m.head._1
    }
    assume(loner.isDefined, "no singleton bucket in fixture — widen the base set")
    val lonerPage = base.find(_.url == loner.get).get

    Materialize.runResumable(spark, ds(base), dir, B)
    assert(Materialize.readTriples(spark, dir)
      .filter(col("url") === loner.get).count() > 0)
    // re-crawl as non-English → the pipeline extracts nothing for it
    val gone = lonerPage.copy(lang = "de",
      warc_ts = new Timestamp(lonerPage.warc_ts.getTime + 86400000L))
    Materialize.incrementalUpdate(spark, ds(Seq(gone)), dir, B)
    assert(Materialize.readTriples(spark, dir)
      .filter(col("url") === loner.get).count() == 0)
    val bkDir = new java.io.File(
      s"${Materialize.dataPath(dir)}/bucket=${bucketOf(loner.get)}")
    assert(!bkDir.exists() || bkDir.listFiles().forall(!_.getName.endsWith(".parquet")),
      "a fully-emptied bucket partition must not keep stale parquet files")
  }
}
