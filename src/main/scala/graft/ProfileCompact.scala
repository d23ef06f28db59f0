package graft

import graft.plans.Materialize
import graft.sources.PageGen
import org.apache.spark.sql.SparkSession

/** Stage-level timing of the MoR maintenance cycle the `kg_compact`
  * bench row measures (dev tool, mirrors ProfileRelease/ProfileIncr):
  * bootstrap once, then per round 3 merge-on-read re-crawl deltas +
  * the compaction fold, each phase timed. Run with GRAFT_PROBE=1 to
  * also get Materialize's internal probe lines (bucketPrune / stats /
  * mor.delta / mor.versions / mor.lineage).
  */
object ProfileCompact {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }
    val nPages = PageGen.numPagesFor(sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-prof-compact").toString
    t("bootstrap")(Materialize.runResumable(spark, PageGen.pages(spark, nPages), dir, 32))
    val deltaN = math.max(nPages / 100L, 1L)
    for (r <- 1 to 3) {
      println(s"--- round $r ---")
      for (k <- 0 until 3) {
        val step = 3L * r + k
        val batch = spark.range(0L, deltaN).map { i =>
          val orig = PageGen.genPage(i).page
          val alt = PageGen.genPage(i + 500000L + 1000L * step).page
          alt.copy(url = orig.url, warc_ts = new java.sql.Timestamp(
            orig.warc_ts.getTime + (step + 1) * 3600000L))
        }
        t(s"mor update $k")(Materialize.incrementalUpdate(spark, batch, dir, 32,
          mergeOnRead = true))
      }
      t("compact")(Materialize.compact(spark, dir))
    }
    spark.stop()
  }
}
