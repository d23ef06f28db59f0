package graft

import graft.plans.Materialize
import graft.sources.PageGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Supplementary benchmarks (NOT part of the frozen driver contract —
  * `graft.Bench` is hashed; extra evidence lives here, cited from
  * OPTIMIZATION_r06.md):
  *
  *  1. `compact_scattered` vs `compact_clustered`: the bucket-pruned
  *     compaction claim (r5 review task #5). At bench scale a random 1%
  *     delta touches all 32 buckets, so the fold is effectively
  *     whole-table; a delta CONFINED to 4 of 32 buckets must fold only
  *     those — fold time ∝ affected buckets, measured side by side on
  *     two fresh tables of the same size.
  *
  *  2. Calibrated-probe certification (r5 review task #4 — the frozen
  *     harness cannot learn new fields, so the band check lives here):
  *     sample the absolute host probe and stamp `capped` when it falls
  *     below ~85% of the calibrated full-speed level recorded in
  *     BENCH.md (2.68-2.91e12 ops at 32 threads). A run whose artifact
  *     says `capped: true` is a hypervisor-throttled epoch and its
  *     absolute seconds are not comparable across artifacts.
  *
  * Prints ONE JSON line, same discipline as the main bench.
  */
object BenchExtra {

  /** Calibrated full-speed probe level for this sandbox at 32 threads
    * (best-known from BENCH.md's cross-round captures; r4: 2.39-2.47e12,
    * r5 valid artifact: 2.68-2.91e12 — the band's floor is the r4
    * level, its certification threshold 85% of the r5 midpoint).
    */
  val CalibratedProbeOps: Long = 2790000000000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    ScalingBench.spinOps(cpus.toInt, 500) // JIT the probe loop
    val probe0 = ScalingBench.spinOps(cpus.toInt, 2000)

    val nPages = PageGen.numPagesFor(sfDir)
    val B = 32
    val deltaN = math.max(nPages / 100L, 1L)

    // ids whose url hashes into buckets 0..3 — the clustered delta
    val clusteredIds = spark.range(0L, nPages)
      .map(i => (i, PageGen.genPage(i).page.url)).toDF("id", "url")
      .withColumn("bucket", pmod(hash(col("url")), lit(B)).cast("int"))
      .filter(col("bucket") < 4)
      .select("id").as[Long].collect().sorted.take(deltaN.toInt)
    require(clusteredIds.length == deltaN.toInt,
      s"not enough ids in 4 buckets for a $deltaN-page delta")

    def mkBatch(ids: Seq[Long], step: Long) = spark
      .createDataset(ids).map { i =>
        val orig = PageGen.genPage(i).page
        val alt = PageGen.genPage(i + 900000L + 1000L * step).page
        alt.copy(url = orig.url, warc_ts = new java.sql.Timestamp(
          orig.warc_ts.getTime + (step + 1) * 3600000L))
      }

    /** Bootstrap a table, land 3 MoR deltas over `ids`, time compact. */
    def cycle(ids: Seq[Long]): (Double, Int) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-benchx-compact").toString
      Materialize.runResumable(spark, PageGen.pages(spark, nPages), dir, B)
      for (k <- 0 until 3)
        Materialize.incrementalUpdate(spark, mkBatch(ids, k), dir, B,
          mergeOnRead = true)
      val t0 = System.nanoTime()
      val affected = Materialize.compact(spark, dir)
      ((System.nanoTime() - t0) / 1e9, affected.size)
    }

    val scatteredIds = (0L until deltaN).toSeq
    // warm both paths once (JIT + FS caches), then measure best-of-3
    cycle(scatteredIds); cycle(clusteredIds)
    val scattered = (1 to 3).map(_ => cycle(scatteredIds)).minBy(_._1)
    val clustered = (1 to 3).map(_ => cycle(clusteredIds)).minBy(_._1)

    val probe1 = ScalingBench.spinOps(cpus.toInt, 2000)
    val capped = math.max(probe0, probe1) <
      (CalibratedProbeOps * 0.85).toLong
    println(s"""{"metric":"compact_bucket_pruning","unit":"sec",""" +
      s""""sf":"$sfDir","pages":$nPages,"delta_pages":$deltaN,"buckets":$B,""" +
      s""""compact_scattered_sec":${scattered._1},"affected_scattered":${scattered._2},""" +
      s""""compact_clustered_sec":${clustered._1},"affected_clustered":${clustered._2},""" +
      s""""host_probe_ops":[$probe0,$probe1],""" +
      s""""calibrated_probe_ops":$CalibratedProbeOps,"capped":$capped}""")
    spark.stop()
  }
}
