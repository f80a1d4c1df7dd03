package graft.ml

import scala.collection.mutable

/** YAML-driven ML benchmark configuration with cartesian parameter
  * expansion — the semantics of the reference's `P/mllib/yaml.scala`
  * (`:28-66` readString, `:89-109` cartesian): a `common` block of
  * defaults, a `benchmarks` list of named algorithms with per-benchmark
  * `params` overrides, and any list-valued key expanding into the
  * cartesian product of experiment cells.
  *
  * The parser is a deliberate line-based subset of YAML (scalars,
  * inline `[a, b]` lists, one level of nesting, `- name:` items) —
  * snakeyaml isn't on the classpath, and the reference configs use
  * nothing more.
  */
object MLYaml {

  case class Config(
      output: String,
      timeoutSeconds: Int,
      iterations: Int,
      /** One (algorithmName, params) experiment cell per cartesian
        * combination. */
      experiments: Seq[(String, MLParams)])

  def parseFile(path: String): Config =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(text: String): Config = {
    var output = "/tmp/graft-ml-results"
    var timeoutSeconds = 1200
    var iterations = 1
    val common = mutable.LinkedHashMap[String, Any]()
    val benches = mutable.ArrayBuffer[(String, mutable.LinkedHashMap[String, Any])]()

    sealed trait St
    case object Top extends St
    case object InCommon extends St
    case object InBench extends St
    case object InParams extends St
    var st: St = Top

    for (raw <- text.linesIterator if raw.replaceAll("#.*$", "").trim.nonEmpty) {
      val noComment = raw.replaceAll("#.*$", "")
      val indent = noComment.takeWhile(_ == ' ').length
      val line = noComment.trim
      if (indent == 0) {
        line match {
          case "common:" => st = InCommon
          case "benchmarks:" => st = InBench
          case kv =>
            st = Top
            val (k, v) = splitKv(kv)
            k match {
              case "output" => output = v.toString
              case "timeoutSeconds" => timeoutSeconds = v.toString.toInt
              case "iterations" => iterations = v.toString.toInt
              case other => fail(s"unknown top-level key: $other")
            }
        }
      } else st match {
        case InCommon =>
          common += splitKv(line)
        case InBench | InParams if line.startsWith("- ") =>
          val (k, v) = splitKv(line.drop(2))
          if (k != "name") fail(s"benchmark item must start with 'name:', got $k")
          benches += ((v.toString, mutable.LinkedHashMap[String, Any]()))
          st = InBench
        case InBench if line == "params:" =>
          st = InParams
        case InParams =>
          if (benches.isEmpty) fail("params: before any benchmark item")
          benches.last._2 += splitKv(line)
        case _ => fail(s"unexpected line: $line")
      }
    }
    require(benches.nonEmpty, "config declares no benchmarks")

    val experiments = benches.toSeq.flatMap { case (name, params) =>
      cartesian((common ++ params).toSeq).map(cell => name -> toMLParams(cell))
    }
    Config(output, timeoutSeconds, iterations, experiments)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ML config: $msg")

  /** `key: value` where value is a scalar or an inline `[a, b]` list. */
  private def splitKv(line: String): (String, Any) = {
    val i = line.indexOf(':')
    if (i < 0) fail(s"expected 'key: value', got: $line")
    val k = line.substring(0, i).trim
    val raw = line.substring(i + 1).trim
    if (raw.isEmpty) fail(s"missing value for key $k")
    val v: Any =
      if (raw.startsWith("[") && raw.endsWith("]"))
        raw.substring(1, raw.length - 1).split(",").toSeq.map(s => scalar(s.trim))
      else scalar(raw)
    k -> v
  }

  private def scalar(s: String): Any = {
    val t = s.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
    t.toLongOption.getOrElse(t.toDoubleOption.getOrElse(t): Any)
  }

  /** {a: [1,2], b: 3} → [{a:1,b:3}, {a:2,b:3}] — list values expand
    * into all combinations; order is deterministic (keys in declaration
    * order, list elements in listed order). */
  private[ml] def cartesian(entries: Seq[(String, Any)]): Seq[Map[String, Any]] =
    entries.foldLeft(Seq(Map.empty[String, Any])) {
      case (acc, (k, vs: Seq[_])) =>
        for (m <- acc; v <- vs) yield m + (k -> v)
      case (acc, (k, v)) =>
        acc.map(_ + (k -> v))
    }

  /** Strict map → MLParams: unknown keys are an error (the reference's
    * `ccFromMap.fromMap(strict = true)`). */
  private[ml] def toMLParams(m: Map[String, Any]): MLParams =
    m.foldLeft(MLParams()) { case (p, (k, v)) =>
      def long = v.toString.toLong
      def int = v.toString.toInt
      k match {
        case "numExamples" => p.copy(numExamples = long)
        case "numFeatures" => p.copy(numFeatures = int)
        case "k" => p.copy(k = int)
        case "vocabSize" => p.copy(vocabSize = int)
        case "numUsers" => p.copy(numUsers = int)
        case "numItems" => p.copy(numItems = int)
        case "seed" => p.copy(seed = long)
        case other => fail(s"unknown MLParams field: $other")
      }
    }
}
