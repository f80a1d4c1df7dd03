package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is
  * the explicit fallback when one key dominates so heavily that even a
  * split partition is one task's worth of a single key, or when AQE is
  * unavailable (streaming joins, custom operators).
  *
  * Salted join: the skewed (large) side gets a deterministic salt in
  * [0, saltFactor) derived from a non-key column hash; the small side
  * is replicated saltFactor times, one copy per salt value. The join
  * key becomes (key, salt), spreading a hot key over saltFactor
  * reducers at the cost of |small| × saltFactor.
  */
object SkewOps {

  /** Equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * Result equals the unsalted inner join (row-for-row). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val replicated = small
      .withColumn("_salt", explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with a salt stage for a
    * skewed group key: groupBy(key, salt).agg(partial) then
    * groupBy(key).agg(final). Expressed here for algebraic aggregates
    * count/sum — extendable to any commutative monoid. */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(sumCol)), lit(saltFactor.toLong)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(sumCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$sumCol"))
  }

  /** Top-k frequent keys — the diagnostic used to decide whether a join
    * needs salting (a key with share ≫ 1/shufflePartitions is hot). */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).count().orderBy(col("count").desc).limit(k)
}
