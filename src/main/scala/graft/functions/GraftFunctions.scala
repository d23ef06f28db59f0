package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §4.3: the canonicalization /
  * fingerprint functions as registered deterministic expressions). Both
  * generate inline Java via `defineCodeGen`, so projections using them
  * stay inside whole-stage codegen — unlike a Scala UDF, which forces a
  * plan-breaking lambda call with per-row encoder overhead.
  */

/** F6: chem_norm(name) — deterministic chemical-name canonicalization
  * (NFKC fold + lowercase + dash/space folding; Normalize.chemNorm).
  */
case class ChemNormExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "chem_norm"

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalize.chemNorm(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Normalize.chemNorm($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): ChemNormExpr =
    copy(child = newChild)
}

/** Rolling 64-bit content fingerprint (TextStats.fingerprint64) as a
  * codegen'd expression.
  */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    graft.operators.TextStats.fingerprint64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.TextStats.fingerprint64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
    copy(child = newChild)
}

object GraftFunctions {

  /** Column-level entry points. */
  def chem_norm(c: Column): Column =
    GraftExprBridge.column(ChemNormExpr(GraftExprBridge.expression(c)))
  def fingerprint64(c: Column): Column =
    GraftExprBridge.column(Fingerprint64Expr(GraftExprBridge.expression(c)))

  /** Register both for SQL use: SELECT chem_norm(name) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chem_norm", exprs => ChemNormExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64Expr(exprs.head), "scala_udf")
  }
}
