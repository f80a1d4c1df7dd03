package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product over two array<double> columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), ...)` —
  * allocates a zipped array per row and evaluates the lambda
  * interpreted; on an O(pairs) similarity join that was the entire
  * bottleneck (~60× slower than this primitive loop). This is the
  * "custom Expression beats UDF beats driver loop" preference order
  * from the build rules.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** `array<double> / scalar` (elementwise division) as a native codegen
  * expression. Division, not multiply-by-reciprocal: the DuckDB value
  * oracles compute `x / sqrt(dot(v,v))` and the two differ in the last
  * ulp.
  *
  * Exists so `normalize` needs no `transform` lambda: a LambdaFunction
  * instantiates fresh variable ids per call site, so identical
  * normalize copies never compare equal and subexpression elimination
  * cannot dedupe them — after projection collapse, a signature
  * computation referencing the normalized vector 48 times evaluated
  * the interpreted transform 48 times per row (measured 86 s for one
  * pass over 500k vectors; ~2 s with this expression). Deterministic
  * codegen subtrees are CSE-able and the loop stays in whole-stage
  * codegen.
  */
case class ArrayDivide(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }
  /** Null elements propagate (as the transform() lambda this replaces
    * did) — the output is nullable exactly when the input is. */
  private def childContainsNull: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = childContainsNull)
  override def prettyName: String = "array_div"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = b.asInstanceOf[Double]
    val n = x.numElements()
    if (childContainsNull && (0 until n).exists(x.isNullAt)) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (x.isNullAt(i)) null else x.getDouble(i) / f
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = x.getDouble(i) / f; i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, f) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val nulls = ctx.freshName("nulls")
      val boxed = ctx.freshName("boxed")
      if (childContainsNull)
        // ADAPTIVE: parquet-sourced arrays are declared nullable even
        // when no element ever is, so the common case must stay the
        // primitive loop — only an actually-present null (which
        // getDouble would silently read as 0.0) pays the boxed copy
        s"""
           |int $n = $x.numElements();
           |double[] $out = new double[$n];
           |int $nulls = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { $nulls++; }
           |  else { $out[$i] = $x.getDouble($i) / $f; }
           |}
           |if ($nulls == 0) {
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
           |} else {
           |  Object[] $boxed = new Object[$n];
           |  for (int $j = 0; $j < $n; $j++) {
           |    if (!$x.isNullAt($j)) { $boxed[$j] = (Object) $out[$j]; }
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
           |}
         """.stripMargin
      else
        s"""
           |int $n = $x.numElements();
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $x.getDouble($i) / $f;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDivide =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Register `array_dot` / `array_div` in the session's function
    * registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_div", exprs => ArrayDivide(exprs(0), exprs(1)), "scala_udf")
  }

  /** Dot product column (requires register(spark) on the session). */
  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** L2-normalize an array<double> column (one dot + one codegen'd
    * elementwise division).
    * A zero vector stays zero (instead of NaN from 0/0): cosine against
    * anything is then 0, so it drops out of similarity thresholds
    * rather than sorting first under NaN-is-largest semantics or
    * blowing up ANSI casts downstream. */
  def normalize(v: Column): Column = {
    val n = sqrt(dot(v, v))
    when(n === 0.0, v)
      .otherwise(call_function("array_div", v, n))
  }

  /** Cosine via pre-normalization: cosine(a, b) = dot(norm(a), norm(b)).
    * When the same vectors appear in many pairs (similarity joins),
    * normalize once per vector and use `dot` on the pairs instead. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
