package graft

import graft.plans.Pipeline
import graft.sources.PageGen
import org.apache.spark.sql.SparkSession
import scala.sys.process._

/** North-rule scaling evidence: the same job at two parallelism levels
  * (sandbox proxy for N vs 4N executors — BASELINE.md discloses the
  * deviation). Runs the full page→triple pipeline on the SAME
  * materialized Parquet input at local[N] and local[4N]; efficiency =
  * (throughput@4N / throughput@N) / 4.
  *
  * Each level runs in its OWN child JVM: measured empirically, a second
  * SparkSession in a reused JVM degrades 5-10x (heap/codegen residue
  * from the stopped session — see BENCH.md), which is also the honest
  * analog of separate cluster deployments. Each child warms up
  * (JIT/codegen) then reports best-of-3.
  */
object ScalingBench {

  private def measureChild(cores: Int, nPages: Long): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // NER cost per input byte is ~100x a plain scan's: size input
      // splits for CPU balance, not IO (default 128MB maxPartitionBytes
      // would collapse this table to ~2 splits and serialize the run)
      .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val pages = PageGen.materializedPages(spark, nPages)
      Pipeline.run(PageGen.pages(spark, 2000)).count() // JIT/codegen warmup
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        n = Pipeline.run(pages).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(s"""CHILD {"cores":$cores,"sec":$best,"triples":$n}""")
    } finally spark.stop()
  }

  private def runChild(cores: Int, nPages: Long): (Double, Long) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(o => o.startsWith("--add-opens") || o.startsWith("-Xmx") || o.startsWith("-D"))
    // ActiveProcessorCount models a node of that size: GC/JIT thread
    // pools scale with the level like they would on a real N-core node
    val cmd = Seq(javaBin) ++ jvmOpts ++
      Seq(s"-XX:ActiveProcessorCount=$cores",
        "-cp", cp, "graft.ScalingBench", "--child", cores.toString, nPages.toString)
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    require(code == 0, s"child (cores=$cores) failed:\n$out")
    val line = out.toString.linesIterator.find(_.startsWith("CHILD ")).get
    val sec = """"sec":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val n = """"triples":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
    (sec, n)
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--child") {
      measureChild(args(1).toInt, args(2).toLong)
      return
    }
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "400000").toLong
    val nLow = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val nHigh = nLow * 4

    // materialize the shared input once (parent JVM, untimed)
    val prep = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    prep.sparkContext.setLogLevel("WARN")
    PageGen.materializedPages(prep, nPages).count()
    prep.stop()

    // the sandbox host is noisy (shared VM): interleave two child JVMs
    // per level (L,H,H,L) and take the per-level min, so a slow epoch
    // cannot bias one level
    val (tLow1, triples) = runChild(nLow, nPages)
    val (tHigh1, _) = runChild(nHigh, nPages)
    val (tHigh2, _) = runChild(nHigh, nPages)
    val (tLow2, _) = runChild(nLow, nPages)
    val tLow = math.min(tLow1, tLow2)
    val tHigh = math.min(tHigh1, tHigh2)
    val thrLow = triples / tLow
    val thrHigh = triples / tHigh
    val eff = (thrHigh / thrLow) / 4.0
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
      s""""pages":$nPages,"triples":$triples,""" +
      s""""cores_low":$nLow,"sec_low":$tLow,"triples_per_sec_low":$thrLow,""" +
      s""""cores_high":$nHigh,"sec_high":$tHigh,"triples_per_sec_high":$thrHigh}""")
  }
}
