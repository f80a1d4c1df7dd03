package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage-level cost decomposition of dd15's chain at the
  * headroom corpus — where do the seconds go after the round-15
  * sliding-window generator change, and which join strategy does the
  * digest join-back pick. */
object Dd15StageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("500000")
    val dir = s"/tmp/graft-headroom-$n"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 8
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def grams: DataFrame = graft.ext.TextOps
      .wordShinglePosRows(d, "doc_id", "text", k)
      .select(col("doc_id"), col("_pos").cast("long").as("pos"),
        md5(col("_el")).as("gh"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DD15STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def gramsFlat: DataFrame = graft.ext.TextOps
      .wordShinglePosRows(d, "doc_id", "text", k)
      .select(col("doc_id"), col("_pos").cast("long").as("pos"),
        // the production lanes (windowKey2 hashes the constant FIRST —
        // xxhash64(el, lit(1)) seed-chains and carries no extra entropy;
        // identical cost, so the r15 measurements stand)
        graft.ext.TextOps.windowKey1(col("_el")).as("h1"),
        graft.ext.TextOps.windowKey2(col("_el")).as("h2"))
    time("grams_forced") {
      grams.agg(count(lit(1)), bit_xor(xxhash64(struct(col("doc_id"),
        col("pos"), col("gh"))))).collect()
    }
    val dup = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi")).select(col("gh"))
    time("dup_agg_forced") {
      dup.agg(count(lit(1)), bit_xor(xxhash64(col("gh")))).collect()
    }
    println("DD15STAGE dup_agg struct plan: " + dup.queryExecution
      .executedPlan.toString.linesIterator.filter(l =>
        l.contains("Aggregate")).map(_.trim.take(70)).mkString(" | "))
    val dupFlat = gramsFlat.groupBy(col("h1"), col("h2"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi")).select(col("h1"), col("h2"))
    time("dup_agg_flat_forced") {
      dupFlat.agg(count(lit(1)), bit_xor(xxhash64(col("h1"), col("h2"))))
        .collect()
    }
    println("DD15STAGE dup_agg flat plan: " + dupFlat.queryExecution
      .executedPlan.toString.linesIterator.filter(l =>
        l.contains("Aggregate")).map(_.trim.take(70)).mkString(" | "))
    val dwFlat = gramsFlat.join(dupFlat, Seq("h1", "h2"))
      .select(col("doc_id"), col("pos"))
    time("dupwin_flat_join_forced") {
      dwFlat.agg(count(lit(1)), bit_xor(xxhash64(struct(col("doc_id"),
        col("pos"))))).collect()
    }
    val dwShj = gramsFlat.join(dupFlat.hint("shuffle_hash"),
        Seq("h1", "h2"))
      .select(col("doc_id"), col("pos"))
    time("dupwin_shj_join_forced") {
      dwShj.agg(count(lit(1)), bit_xor(xxhash64(struct(col("doc_id"),
        col("pos"))))).collect()
    }
    val dw = grams.join(dup, "gh").select(col("doc_id"), col("pos"))
    time("dupwin_join_forced") {
      dw.agg(count(lit(1)), bit_xor(xxhash64(struct(col("doc_id"),
        col("pos"))))).collect()
    }
    val joined = dw.queryExecution.executedPlan.toString
    println("DD15STAGE join nodes: " + joined.linesIterator.filter(l =>
      l.contains("Join") || l.contains("BroadcastExchange"))
      .map(_.trim.take(90)).mkString(" | "))
    val dwc = time("dupwin_checkpoint") { dw.localCheckpoint() }
    time("ndup_covered_rest") {
      val nDup = dwc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_win"))
      val covered = dwc
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("tp"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_tok"))
      val out = d.select(col("doc_id")).join(nDup, Seq("doc_id"), "left")
        .join(covered, Seq("doc_id"), "left")
      out.agg(count(lit(1)), bit_xor(xxhash64(struct(out.columns
        .map(col): _*)))).collect()
    }
    spark.stop()
  }
}
