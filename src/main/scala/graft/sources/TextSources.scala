package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text-format sources from the reference's ingest surface.
  *
  * All parsers are distributed (spark.read.text → expression/typed
  * transforms); no driver-side file iteration, so they scale to
  * arbitrarily many input files.
  */
object TextSources {

  /** Pipe-delimited text with trailing delimiter, "" → null, staged as
    * strings then cast column-by-column to the target schema —
    * the reference's dsdgen-output parse
    * (`P/tpcds/Tables.scala:69-98` semantics).
    */
  def pipeDelimited(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.text(path)
    val parts = split(col("value"), "\\|", -1)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      val v = element_at(parts, i + 1)
      when(v === "", lit(null)).otherwise(v).cast(f.dataType).as(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  /** Whitespace-separated "src tgt" edge lines
    * (`P/SquareQueryPerformance.scala:25-47` semantics). */
  def whitespaceEdges(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        element_at(toks, 1).cast("long").as("source"),
        element_at(toks, 2).cast("long").as("target"))
  }

  case class Edge(source: Long, target: Long)

  /** SNAP ego-network parser (`P/LinearQueryPerformance.scala:26-56`
    * semantics): per `<ego>.edges` file, a 2-token line (a, b) yields
    * edges (ego,a), (ego,b), (a,b); a k-token line yields the sliding
    * chain (t_i, t_i+1) plus the ego closure edges (ego, first) and
    * (last, ego). Ego id comes from the file name. Runs as a typed
    * flatMap over (file, line) rows — per-line imperative logic, but
    * fully distributed and streaming-friendly.
    */
  def snapEgoNet(spark: SparkSession, dir: String): Dataset[Edge] = {
    import spark.implicits._
    spark.read.text(s"$dir/*.edges")
      .withColumn("_file", input_file_name())
      .as[(String, String)]
      .flatMap { case (line, file) =>
        val name = file.substring(file.lastIndexOf('/') + 1)
        val ego = name.stripSuffix(".edges").toLong
        val toks = line.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 2) Iterator.empty
        else {
          val ids = toks.map(_.toLong)
          if (ids.length == 2) {
            Iterator(Edge(ego, ids(0)), Edge(ego, ids(1)), Edge(ids(0), ids(1)))
          } else {
            val chain = ids.sliding(2).map(p => Edge(p(0), p(1)))
            chain ++ Iterator(Edge(ego, ids.head), Edge(ids.last, ego))
          }
        }
      }
  }
}
