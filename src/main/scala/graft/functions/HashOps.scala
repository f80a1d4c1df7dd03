package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType}

/** Wrapping 64-bit universal hash step: h*a + b with Java wrap-around
  * semantics. Spark 4's ANSI mode (default on) raises on long overflow
  * for the `*`/`+` operators, but hash mixing *wants* modular wrap —
  * so this is its own codegen'd expression.
  */
case class WrappingMulAdd(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires three BIGINT arguments")

  override def dataType: DataType = LongType
  override def prettyName: String = "wrapping_mul_add"

  override def nullSafeEval(h: Any, a: Any, b: Any): Any =
    h.asInstanceOf[Long] * a.asInstanceOf[Long] + b.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, a, b) => s"${ev.value} = $h * $a + $b;")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WrappingMulAdd =
    copy(first = f, second = s, third = t)
}

object HashOps {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wrapping_mul_add",
      exprs => WrappingMulAdd(exprs(0), exprs(1), exprs(2)), "scala_udf")

  /** h*a + b on int64 with wrap-around (requires register(spark)). */
  def mulAdd(h: Column, a: Long, b: Long): Column =
    call_function("wrapping_mul_add", h, lit(a), lit(b))
}
