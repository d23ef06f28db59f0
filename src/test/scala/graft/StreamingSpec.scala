package graft

import graft.plans.Pipeline
import graft.sources.PageGen
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("windowed event counts: streaming result == batch equivalent") {
    val dir = Files.createTempDirectory("graft-events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(dir)

    val q = EventStream.windowedEventCounts(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("evt_counts").start()
    try {
      q.processAllAvailable()
      // compare window starts as epoch seconds: the memory sink hands
      // back java.sql.Timestamp while batch rows use LocalDateTime
      // (java8 datetime API default in Spark 4)
      // memory-sink window bounds come back TIMESTAMP_NTZ: go via
      // TIMESTAMP (UTC session) before the epoch cast
      val streaming = spark.sql(
        "SELECT CAST(CAST(window.start AS TIMESTAMP) AS LONG) AS ws, event_type, n FROM evt_counts")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = spark.read.parquet(dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .selectExpr("CAST(CAST(window.start AS TIMESTAMP) AS LONG) AS ws", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streaming == batch)
    } finally q.stop()
  }

  test("page stream -> triples via foreachBatch == batch pipeline") {
    val pagesDir = Files.createTempDirectory("graft-stream-pages").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString + "/triples"
    val ckDir = Files.createTempDirectory("graft-stream-ck").toString
    val pages = PageGen.pages(spark, 40)
    pages.write.mode("overwrite").parquet(pagesDir)

    val q = EventStream.streamTriples(spark, pagesDir, outDir, ckDir)
    try q.processAllAvailable() finally q.stop()

    def keys(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("concat_ws('|', url, sentId, headText, valueText)")
        .collect().map(_.getString(0)).toSet
    assert(keys(spark.read.parquet(outDir)) == keys(Pipeline.run(pages).toDF()))
  }
}
