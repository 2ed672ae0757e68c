package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hottest nomenclature primitive:
  * the positional-prefix extraction `extract_p_start`
  * (reference: civicutils/match.py:127-144; X3 in SURVEY.md §2.8).
  *
  * Correctness never requires a custom expression here (SURVEY.md §4.2
  * — a UDF suffices); this exists for the codegen path: `doGenCode`
  * emits a direct static call with a shared compiled Pattern, keeping
  * the operator inside whole-stage codegen instead of crossing the
  * ScalaUDF serialization boundary per row.
  */
object PStartHelper {
  private val pattern = java.util.regex.Pattern.compile("(P\\.[A-Z]+[0-9]+).*")

  /** Java-callable from generated code. Null on non-p. strings. */
  def eval(s: UTF8String): UTF8String = {
    if (s == null) return null
    val m = pattern.matcher(s.toString.toUpperCase)
    if (m.matches()) UTF8String.fromString(m.group(1)) else null
  }
}

case class PStartExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"p_start requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "p_start"

  override def nullSafeEval(v: Any): Any =
    PStartHelper.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.plans.PStartHelper$$.MODULE$$.eval($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session extensions: registers the native functions for SQL use
  * (`SELECT p_start(col)`). Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or call
  * `GraftFunctions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("p_start"),
      new ExpressionInfo(classOf[PStartExpression].getName, "p_start"),
      (exprs: Seq[Expression]) => PStartExpression(exprs.head)))
  }
}

object GraftFunctions {
  /** Register SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "p_start", exprs => PStartExpression(exprs.head), "internal")

  /** Column API (requires `register(spark)` or GraftExtensions). */
  def pStart(c: Column): Column =
    org.apache.spark.sql.functions.call_function("p_start", c)
}
