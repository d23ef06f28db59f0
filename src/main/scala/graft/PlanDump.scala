package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dump `explain("formatted")` for the query paths the r6 optimization
  * round touched (dev tool): writes one `<name>.txt` per query into the
  * target directory. Run from the round-5 tree for the `_before`
  * captures and from the current tree for `_after` (the driver cannot
  * run Spark; these files are the committed plan evidence).
  *
  * Usage: runMain graft.PlanDump <outDir> [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val suffix = if (args.length > 1) args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name (${txt.length} chars)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // nb_classify scoring plan (crossJoin+2 joins -> array-LUT resolve)
    locally {
      val tr = docs.filter(col("doc_id") % 7 === 3)
      val nb = Classify.nbTable(Classify.counts(tr), Classify.vocabSize(tr))
      dump("nb_score", Classify.score(docs, nb, Classify.priors(tr)))
    }
    // search_bm25 scoring plan (idf broadcast bound)
    locally {
      val (topk, rel) = Search.bm25TopKWithHandle(docs,
        Seq(1 -> Seq("dup", "hash", "join"), 2 -> Seq("merge", "sort", "window")),
        k = 10)
      dump("search_bm25", topk)
      rel()
    }
    // composed release ledger (leaf cuts: the fates plan reads flat
    // cached leaves instead of re-embedding the pair chain)
    locally {
      val fixture = SparkEntry.releaseFixture(docs)
      val (fates, rel) = Release.ledgerWithHandle(fixture)
      dump("release_fates", fates)
      rel()
    }
    // incremental release ledger
    locally {
      val fixture = SparkEntry.releaseFixture(docs)
      val idx = Release.buildIndex(fixture.filter(col("doc_id") % 10 =!= 9))
      val (fates, rel) = Release.incrementalLedgerWithHandle(
        fixture.filter(col("doc_id") % 10 === 9), idx)
      dump("release_incr_fates", fates)
      rel()
    }
    // incremental dedup survivors (cand leaf + CC fusion)
    locally {
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      val b = IncrDedup.bandIndex(corpus).persist()
      val c = IncrDedup.bucketCounts(b).persist()
      b.count(); c.count()
      val (pairs, rel) = IncrDedup.incrementalPairsWithHandle(
        b, c, corpus, delta, threshold = 0.5)
      dump("dedup_incr_survivors", IncrDedup.survivors(delta, pairs))
      rel(); b.unpersist(); c.unpersist()
    }
    // minhash cluster labels (CC endpoint-node driver form)
    dump("dedup_minhash_clusters", Dedup.minhashClusters(docs, threshold = 0.5))
    // semdedup survivors
    locally {
      val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val (surv, rel) = SemDedup.survivorsWithHandle(
        Dedup.plantNearDups(raw), Similarity.ivfCentroids(raw, 16), 0.95)
      dump("semdedup_survivors", surv)
      rel()
    }
    // pagerank result frame (driver-branch local relation vs iterated plan)
    locally {
      val edges = Seq((1L, -1L, 3L), (-1L, 1L, 3L), (2L, -1L, 1L), (-1L, 2L, 1L))
        .toDF("src", "dst", "support")
      dump("kg_pagerank", Graph.pageRank(edges))
    }
    spark.stop()
  }
}
