package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, attach the latest
  * right row with `rightTime <= leftTime` within the same key.
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes built-ins (preference order (a) from the
  * build rules): tag both sides, union them, and run one
  * `last(_, ignoreNulls)` window pass per attached column over
  * (key, time, side) ordering. Cost = one shuffle of |L|+|R| rows keyed
  * by the join key — same asymptotics as a sort-merge join, streams
  * through codegen'd window frames, inherits AQE skew splitting. The
  * sort places right rows before left rows at equal timestamps, giving
  * inclusive (<=) semantics.
  *
  * Right side must be unique per (key, rightTime) — pre-aggregate if
  * not — otherwise "the" matching row is ill-defined.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    require(!rightCols.contains(key), "key must not be in rightCols")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val lAligned = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
    val rAligned = leftCols.foldLeft(
      rightCols.foldLeft(r)((df, c) => df.withColumnRenamed(c, s"_r_$c")))(
      (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select(
      (Seq(col(key), col("_t"), col("_side")) ++
        leftCols.filter(_ != key).map(col) ++ rightCols.map(c => col(s"_r_$c"))): _*)
      .unionByName(rAligned.select(
        (Seq(col(key), col("_t"), col("_side")) ++
          leftCols.filter(_ != key).map(col) ++ rightCols.map(c => col(s"_r_$c"))): _*))

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w)))

    filled.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"_r_$c").as(c))): _*)
  }
}
