package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: stage-level wall times for dd20's span-removal chain on
  * the PipelineHeadroom corpus — where does the surgery pay?
  *
  *   runMain graft.tools.SpanRemovalProbe [nDocs]
  */
object SpanRemovalProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dir = s"/tmp/graft-headroom-$n"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ext.TextOps

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val k = 8
    val d = graft.sources.Tables.table(spark, dir, "documents")
    val grams = TextOps.wordShinglePosRows(d, "doc_id", "text", k)
      .select(col("doc_id"), col("_pos").cast("long").as("pos"),
        md5(col("_el")).as("gh"))
    timed("grams bare count")(println("  grams: " + grams.count()))
    timed("A: dd15-style distinct->count") {
      println("  dupGh: " + grams.select(col("gh"), col("doc_id")).distinct()
        .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).count())
    }
    timed("B: min/max agg count") {
      val pk = col("doc_id") * lit(1048576L) + col("pos")
      println("  dupGh: " + grams.groupBy(col("gh"))
        .agg(min(pk).as("fkey"), max(col("doc_id")).as("hi"))
        .filter(expr("fkey div 1048576") =!= col("hi")).count())
    }
    val packed = col("doc_id") * lit(1048576L) + col("pos")
    val perGh = timed("perGh agg") {
      grams.groupBy(col("gh"))
        .agg(min(packed).as("fkey"), max(col("doc_id")).as("hi"))
        .filter(expr("fkey div 1048576") =!= col("hi"))
        .select(col("gh"),
          expr("fkey div 1048576").as("fd"),
          pmod(col("fkey"), lit(1048576L)).as("fp"))
        .localCheckpoint()
    }
    val cut = timed("cut checkpoint") {
      grams.join(perGh, "gh")
        .filter(!(col("doc_id") === col("fd") && col("pos") === col("fp")))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
        .distinct()
        .withColumn("rm", lit(1L))
        .localCheckpoint()
    }
    val cutDocs = timed("cutDocs checkpoint") {
      cut.select(col("doc_id")).distinct().localCheckpoint()
    }
    val toksCol = TextOps.tokens(col("text"))
    timed("clean branch count") {
      println("  clean rows: " +
        d.join(cutDocs, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), md5(concat_ws(" ", toksCol)).as("h"))
          .count())
    }
    timed("clean branch collect-hash") {
      d.join(cutDocs, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), md5(concat_ws(" ", toksCol)).as("h"))
        .agg(count(lit(1)), max(col("h"))).collect()
    }
    timed("dirty branch") {
      val dirtyToks = d.join(cutDocs, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), posexplode(toksCol).as(Seq("p", "tok")))
        .select(col("doc_id"), col("p").cast("long").as("pos"), col("tok"))
      val dirty = dirtyToks.join(cut, Seq("doc_id", "pos"), "left")
        .na.fill(0L, Seq("rm"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("rm")).as("n_removed"),
          sort_array(collect_list(
            struct(col("pos"), col("rm"), col("tok")))).as("arr"))
      println("  dirty rows: " + dirty.count())
    }
    timed("dd15 under count (join-eliminated)") {
      println("  rows: " + graft.SparkEntry
        .queries("dd15_substring_dedup")(spark, dir).count())
    }
    timed("dd15 with real consumer (sum dup_tok)") {
      println("  sum: " + graft.SparkEntry
        .queries("dd15_substring_dedup")(spark, dir)
        .agg(sum(col("dup_tok"))).collect()(0).getLong(0))
    }
    timed("full catalog query") {
      graft.SparkEntry.queries("dd20_span_removal")(spark, dir).count()
    }
    spark.stop()
  }
}
