package graft

import graft.functions.{GraftFunctions, Normalize}
import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expressions: semantic equality with the Scala
  * functions, SQL registration, and codegen participation (the point of
  * writing an Expression instead of a UDF).
  */
class GraftFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("chem_norm expression == Normalize.chemNorm, interpreted and codegen'd") {
    import spark.implicits._
    val names = Seq("2,4,6-Trinitro_toluene", "  Heavy   Water ", "ΔH—fus", "NaCl")
    val df = names.toDF("name")
      .withColumn("norm", GraftFunctions.chem_norm(col("name")))
    val got = df.select("name", "norm").as[(String, String)].collect().toMap
    names.foreach(n => assert(got(n) == Normalize.chemNorm(n)))
    // null passthrough (NullIntolerant)
    val withNull = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "name")
      .select(GraftFunctions.chem_norm(col("name"))).collect()
    assert(withNull(0).isNullAt(0))
  }

  test("fingerprint64 expression == TextStats.fingerprint64") {
    import spark.implicits._
    val texts = Seq("The quick   brown\tfox", "the quick brown fox", "other")
    val got = texts.toDF("t")
      .select(col("t"), GraftFunctions.fingerprint64(col("t")).as("fp"))
      .as[(String, Long)].collect().toMap
    texts.foreach(t => assert(got(t) == TextStats.fingerprint64(t)))
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT chem_norm('Foo-Bar  BAZ') AS n, fingerprint64('x') AS f")
      .collect()(0)
    assert(r.getString(0) == Normalize.chemNorm("Foo-Bar  BAZ"))
    assert(r.getLong(1) == TextStats.fingerprint64("x"))
  }

  test("expression stays inside whole-stage codegen (vs UDF boundary)") {
    // a parquet-backed source: a local Seq would be constant-folded to
    // LocalTableScan and never reach codegen at all
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.chem_norm(col("text")).as("n"))
      .filter(length(col("n")) > 0)
    df.collect() // finalize the (adaptive) plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    assert(plan.contains("chem_norm"), s"expression missing:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"fell back to UDF:\n$plan")
  }
}
