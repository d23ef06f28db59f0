package graft

import graft.plans.Materialize
import graft.sources.PageGen
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (test scope, not shipped): per-phase timing of
  * a MoR incremental batch to find where the wall-clock goes.
  */
object IncrBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nPages = 20000
    val dir = java.nio.file.Files.createTempDirectory("probe-incr").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    t("bootstrap") { Materialize.runResumable(spark, PageGen.pages(spark, nPages), dir, 32) }
    for (r <- 1 to 3) {
      val batch = spark.range(0L, nPages / 100L).map { i =>
        val orig = PageGen.genPage(i).page
        val alt = PageGen.genPage(i + 100000L + 1000L * r).page
        alt.copy(url = orig.url, warc_ts = new java.sql.Timestamp(
          orig.warc_ts.getTime + r * 86400000L))
      }
      t(s"mor round $r") {
        Materialize.incrementalUpdate(spark, batch, dir, 32, mergeOnRead = true)
      }
    }
    t("read resolved") { Materialize.readTriples(spark, dir).count() }
    spark.stop()
  }
}
