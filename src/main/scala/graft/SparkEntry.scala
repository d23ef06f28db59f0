package graft

import graft.plans.Pipeline
import graft.sources.PageGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Two families of entries:
  *  - `kg_*`: the KG-construction pipeline over the synthesized page
  *    table (FIXTURES.md; scale keyed off the sf dir). Not
  *    SQL-expressible → no oracleSql (driver records rows-only checks);
  *    correctness is enforced by the ScalaTest fixture gates
  *    (PipelineSpec: P/R vs gold).
  *  - `q*`: relational operators over the driver's parquet tables with
  *    exact DuckDB oracles (column names aligned on both sides).
  */
object SparkEntry {

  /** Flagship: full KG pipeline on sf0.001-scale pages; rows = triples. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(PageGen.pages(spark, 200)).toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- KG pipeline over synthesized pages (rows-only driver check) ---
    "kg_triples" -> ((s, dir) =>
      Pipeline.run(PageGen.pages(s, PageGen.numPagesFor(dir))).toDF()
        .orderBy("url", "sentId", "headText", "valueText")),
    // --- SQL-expressible relational ops (DuckDB oracle) ---
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows
        | FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
