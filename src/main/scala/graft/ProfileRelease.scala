package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the composed release build (dev tool,
  * mirrors ProfilePipeline/ProfileIncr). Historical findings recorded
  * in BENCH.md: the interpreted HOF n-gram builders cost ~12 ms/row
  * (now the single-pass native scan, ~50x), and count()-only probes
  * lie about projection cost because column pruning deletes the work —
  * always persist before timing a projection.
  */
object ProfileRelease {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }
    val docs = SparkEntry.releaseFixture(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val compact = Release.labeled(docs).persist()
      t("labeled (persisted)")(compact.count())
      val a0 = compact.filter(col("red").isNotNull).select("doc_id", "red")
      val keep = a0.groupBy(md5(col("red")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id").persist()
      t("exact keep ids")(keep.count())
      val a1 = a0.join(keep, Seq("doc_id"), "left_semi")
      val (pairs, relPairs) = Dedup.minhashPairsWithHandle(a1, "doc_id", "red",
        threshold = 0.5)
      val p = pairs.select(col("id_a").as("cid_a"), col("id_b").as("cid_b")).persist()
      t("minhash pairs")(p.count())
      val touched = p.select(col("cid_a").as("cid"))
        .union(p.select(col("cid_b").as("cid"))).distinct()
      val cc = t("CC (pair-touched nodes)")(
        Canonicalize.connectedComponents(touched, p))
      t("cc.count")(cc.count())
      relPairs(); p.unpersist()
      val bench = docs.filter(col("doc_id") % 20 === 7)
        .select(col("doc_id").as("bench_id"), col("text").as("red"))
      t("decontam flagged")(Decontaminate.flagged(a1, bench, "doc_id",
        "bench_id", "red").count())
      t("full ledger")(Release.ledgerWithHandle(docs) match {
        case (f, rel) => try f.count() finally rel()
      })
      compact.unpersist(); keep.unpersist()
    }
    spark.stop()
  }
}
