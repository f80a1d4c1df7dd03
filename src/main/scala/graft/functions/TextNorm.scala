package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE/text normalization: lowercase ASCII letters, keep
  * [a-z0-9], collapse every whitespace run (space, \t, \n, \v, \f, \r)
  * to a single `#` word marker, drop leading/trailing runs, and strip
  * everything else (punctuation, control bytes, all non-ASCII).
  *
  * Value-equal to the regex chain
  * `regexp_replace(trim(regexp_replace(lower(s), '[^a-z0-9\\s]+', '')),
  * '\\s+', '#')` — which remains the DuckDB oracle spelling — on any
  * input whose non-ASCII characters stay non-ASCII under Unicode
  * lowercasing (all fixture corpora; the documented exception class is
  * oddities like U+212A KELVIN SIGN whose lowercase IS ASCII 'k': the
  * regex chain keeps it, this strips it).
  *
  * Why it exists: the strip regex `[^a-z0-9\s]+` FAILS at every
  * position of mostly-clean text — Java regex pays a full match
  * attempt per character — and it sits on the hottest path in the
  * tokenizer family (tx25 apply, tx26 train run it over every doc).
  * Measured at the 500k-doc headroom corpus: 33.7 s for the strip
  * regex alone vs ~1.4 s for a single byte pass (SCALING.md round 14).
  * This expression does lower + strip + trim + collapse in one pass
  * over the UTF8String bytes (multi-byte chars have every byte >=
  * 0x80, so skipping high bytes strips exactly the non-ASCII chars).
  */
case class BpeNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one implementation for both paths: the generated code calls the
    // same static normalize the interpreted path uses (TextNorm is a
    // plain object, so the JVM static forwarder exists for Janino)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TextNorm.normalize($in);")

  override protected def withNewChildInternal(newChild: Expression): BpeNormalize =
    copy(child = newChild)
}

object TextNorm {
  /** The single normalization pass (see [[BpeNormalize]]). Output
    * alphabet is [a-z0-9#]; never longer than the input. */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var o = 0
    var pending = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && o > 0) { out(o) = '#'; o += 1 }
        pending = false
        out(o) = b; o += 1
      } else if (b >= 'A' && b <= 'Z') {
        if (pending && o > 0) { out(o) = '#'; o += 1 }
        pending = false
        out(o) = (b + 32).toByte; o += 1
      } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r') {
        pending = true
      }
      // anything else — punctuation, control bytes, every byte of a
      // multi-byte char — is stripped and does NOT clear a pending
      // marker ("a !b" -> "a#b", matching strip-then-collapse order)
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Register `bpe_normalize` in the session registry (idempotent —
    * the HashOps/VectorOps mechanism). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_normalize", exprs => BpeNormalize(exprs(0)), "scala_udf")

  /** Column form (requires [[register]] on the session). */
  def bpeNormalize(c: Column): Column = call_function("bpe_normalize", c)
}
