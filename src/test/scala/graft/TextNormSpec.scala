package graft

import org.apache.spark.sql.functions._
import graft.functions.TextNorm
import graft.ext.TextOps

/** BpeNormalize parity gates (the HashOpsSpec pattern): the one-pass
  * expression must equal the regex-chain spelling — which is also the
  * DuckDB oracle form — under CODEGEN_ONLY, so a codegen compile error
  * throws instead of silently falling back to interpreted. */
class TextNormSpec extends SparkSpec {

  private def withFactoryMode[A](mode: String)(f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val samples = Seq(
    "Hello World", // case + single space
    "  lead and trail  ", // trimmed runs
    "a !b", // stripped punct inside a whitespace run -> one marker
    "a!b c", // stripped punct glues the word, space still marks
    "tabs\tand\nnewlines\r\n", // every Java \s char collapses
    "foo\u000Bbar", // vertical tab IS Java \s (RE2's \s excludes it —
    // the oracle spells the class out; this sample pins the Spark side)
    "digits 123 mix4ed", // digits kept
    "!!!", "", "   ", // all-stripped, empty, all-whitespace
    "café naïve", // multi-byte chars stripped, ASCII kept
    "日本語", // fully non-ASCII -> empty
    "emoji 😀 gap", // surrogate pair stripped, run collapses
    "x" * 300 + " " + "y" * 7) // long input

  test("bpe_normalize equals the regex-chain spelling on every sample (CODEGEN_ONLY)") {
    import spark.implicits._
    TextNorm.register(spark)
    val df = (samples.map(Option(_)) :+ Option.empty[String]).toDF("s")
    val rows = withFactoryMode("CODEGEN_ONLY") {
      df.select(col("s"), TextOps.bpeBody(col("s")).as("fast"),
        TextOps.bpeBodyRegex(col("s")).as("spec")).collect().toSeq
    }
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"mismatch for ${Option(r.getString(0))}: " +
          s"fast=${Option(r.getString(1))} spec=${Option(r.getString(2))}")
    }
    // null in -> null out
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2))
  }

  test("bpe_normalize equals the JVM regex chain on 2000 random mixed strings (property)") {
    // pure-JVM property check (no Spark plan): TextNorm.normalize vs
    // the reference chain lower -> strip [^a-z0-9\s]+ -> collapse \s+
    // to '#' -> trim '#', over random strings mixing case, digits,
    // every Java \s character, punctuation (including the '#' and '|'
    // the encoding itself uses), multi-byte chars, and a surrogate
    // pair. The documented exception class (non-ASCII whose Unicode
    // lowercase is ASCII, e.g. Kelvin sign) is excluded by
    // construction of the alphabet.
    val tokens = Seq("a", "z", "Q", "M", "0", "9", " ", "\t", "\n",
      "\u000B", "\f", "\r", "!", "?", ".", ",", "|", "#", "-", "_",
      "é", "日", new String(Character.toChars(0x1F600)))
    def reference(s: String): String =
      s.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9\\s]+", "")
        .replaceAll("\\s+", "#")
        .replaceAll("^#+|#+$", "")
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.oneOf(tokens))
      .map(_.mkString)
    val seed = org.scalacheck.rng.Seed(42L)
    val params = org.scalacheck.Gen.Parameters.default
    var s = seed
    (1 to 2000).foreach { _ =>
      val str = gen.pureApply(params, s)
      s = s.next
      val got = graft.functions.TextNorm.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(str)).toString
      assert(got == reference(str),
        s"mismatch on ${str.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"got '$got' want '${reference(str)}'")
    }
  }

  test("bpe_normalize codegen and interpreted paths agree") {
    import spark.implicits._
    TextNorm.register(spark)
    val df = samples.toDF("s").select(TextOps.bpeBody(col("s")).as("n"))
    val a = withFactoryMode("CODEGEN_ONLY") { df.collect().map(_.getString(0)).toSeq }
    val b = withFactoryMode("NO_CODEGEN") { df.collect().map(_.getString(0)).toSeq }
    assert(a == b)
  }
}
