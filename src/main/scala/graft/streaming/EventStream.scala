package graft.streaming

import graft.model.Page
import graft.plans.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming facade (SURVEY.md §2.8: the reference is
  * strictly batch with resume flags; the engine's stages are stateless
  * per-row maps, so a streaming wrapper is a thin layer — provided here
  * for stream-shaped deployments).
  *
  *  - `windowedEventCounts`: watermarked tumbling-window aggregation
  *    over an events directory (file source).
  *  - `streamTriples`: page stream → foreachBatch(full KG pipeline) →
  *    append sink. Each micro-batch reuses the exact batch dataflow, so
  *    stream output ≡ batch output on the same rows (asserted in
  *    StreamingSpec).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("warc_ts", TimestampType),
    StructField("html", BinaryType), StructField("text", StringType),
    StructField("lang", StringType)))

  /** Tumbling-window counts per event type with a watermark — the
    * canonical streaming aggregation (late rows beyond the watermark
    * drop).
    */
  def windowedEventCounts(
      spark: SparkSession, dir: String,
      windowLen: String = "1 hour", watermark: String = "2 hours"
  ): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

  /** Stream pages → triples using the batch pipeline per micro-batch.
    * Checkpointed — restart-safe like the batch manifest path.
    */
  def streamTriples(
      spark: SparkSession, pagesDir: String, outDir: String, checkpointDir: String
  ): StreamingQuery = {
    import spark.implicits._
    spark.readStream.schema(pageSchema).parquet(pagesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.run(batch.as[Page]).write.mode("append").parquet(outDir)
      }
      .start()
  }
}
