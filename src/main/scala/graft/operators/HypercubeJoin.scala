package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperCube / Shares one-round multi-way equi-join (Afrati & Ullman
  * 2010; the reference fork's distinctive executor —
  * `spark.sql.hypercube.*` confs + the GLPK `shares.lp` load LP on a
  * modified Spark 2.1, reference `P/Benchmark.scala:85-92`,
  * `shares.lp:1-19` — re-expressed Spark-first).
  *
  * Model: a natural equi-join of relations R_j over attribute set A,
  * with a SHARE p_a per attribute, Π p_a = P. Reducers are the cells
  * of the p_1 × … × p_m hypercube. A tuple of R_j fixes the
  * coordinates of the attributes it contains (hash of the value) and
  * is REPLICATED across the dimensions it lacks; every join result
  * lives in exactly ONE cell — the coordinates are functions of the
  * attribute values — so no dedup is ever needed.
  *
  * Spark realization: instead of a custom ShuffleExchange, the cell
  * coordinates become ordinary columns and every pairwise join key is
  * EXTENDED with all m coordinate columns. Catalyst keeps planning
  * (AQE, SMJ/SHJ choice, codegen); the coordinates do the hypercube's
  * real work — SKEW BOUNDING: a heavy value of attr `a` no longer
  * meets its counterparts in one reducer, because the other
  * attributes' coordinates split that key's work across
  * Π_{b≠a} p_b cells. That is what the binary-join plan cannot do
  * without explicit salting, and why the reference runs cyclic
  * (triangle/square) queries through this executor.
  *
  * Costs are the textbook ones: R_j is replicated Π_{a∉S_j} p_a
  * times. [[shares]] picks the integer share vector minimizing total
  * replicated input (the same objective the fractional LP's load bound
  * optimizes at fixed P) by EXACT enumeration of the factorizations of
  * P — P is the reducer count (dozens-to-thousands), so enumeration is
  * trivial and deterministic, where the reference shells out to GLPK.
  *
  * Semantics: natural inner join on shared attribute names — null
  * attr values never match, exactly as in the binary-join plan.
  * Non-attr payload columns are carried and must be uniquely named
  * across relations.
  */
object HypercubeJoin {

  /** One relation: `df` with its JOIN attributes (other columns are
    * carried as payload). */
  case class Rel(df: DataFrame, attrs: Seq[String])

  private def coordCol(a: String): String = s"_hc_$a"

  /** Integer shares minimizing total replicated input
    * Σ_j size_j · Π_{a∉S_j} p_a subject to Π_a p_a = P exactly
    * (all parallelism used — the relaxed problem degenerates to
    * p≡1 otherwise). Exact enumeration over factorizations of P;
    * deterministic tie-break (lexicographic). `relSizes` pairs each
    * relation's attrs with its (estimated) row count. */
  def shares(relSizes: Seq[(Seq[String], Double)], totalP: Int): Map[String, Int] = {
    require(totalP >= 1, s"totalP must be >= 1, got $totalP")
    require(relSizes.nonEmpty, "no relations")
    val attrs = relSizes.flatMap(_._1).distinct.sorted
    def cost(p: Map[String, Int]): Double = relSizes.map { case (s, w) =>
      w * attrs.filterNot(s.contains).map(p(_).toLong).product
    }.sum
    // enumerate all share vectors with product exactly totalP
    def enum(rest: List[String], remaining: Int): Seq[Map[String, Int]] = rest match {
      case Nil => if (remaining == 1) Seq(Map.empty) else Seq.empty
      case a :: tail =>
        (1 to remaining).filter(remaining % _ == 0).flatMap { pa =>
          enum(tail, remaining / pa).map(_ + (a -> pa))
        }
    }
    val candidates = enum(attrs.toList, totalP)
    require(candidates.nonEmpty, s"no factorization of $totalP over $attrs")
    candidates.minBy(p => (cost(p), attrs.map(p(_)).mkString(",")))
  }

  /** The cube-coordinate assignment for one relation: attributes the
    * relation HAS hash to a fixed coordinate; attributes it LACKS
    * explode over their full share range (the replication).
    * Coordinates are internal plumbing (xxhash64 — they never reach an
    * output surface). Exposed for the skew-spread spec. */
  private[graft] def cubed(r: Rel, attrs: Seq[String],
      shares: Map[String, Int]): DataFrame =
    attrs.foldLeft(r.df) { (d, a) =>
      if (r.attrs.contains(a))
        d.withColumn(coordCol(a),
          pmod(xxhash64(col(a)), lit(shares(a).toLong)).cast("int"))
      else
        d.withColumn(coordCol(a),
          explode(sequence(lit(0), lit(shares(a) - 1))))
    }

  /** The one-round multi-way join. Join keys of every pairwise fold =
    * shared natural attributes + ALL coordinate columns; the final
    * projection drops the coordinates. */
  def join(rels: Seq[Rel], shares: Map[String, Int]): DataFrame = {
    require(rels.nonEmpty, "no relations")
    val attrs = rels.flatMap(_.attrs).distinct
    require(attrs.forall(shares.contains),
      s"missing shares for ${attrs.filterNot(shares.contains)}")
    shares.foreach { case (a, p) =>
      require(p >= 1, s"share for $a must be >= 1, got $p") }
    val coords = attrs.map(coordCol)
    val (joined, _) = rels.map(r => (cubed(r, attrs, shares), r.attrs.toSet))
      .reduceLeft[(DataFrame, Set[String])] { case ((ld, las), (rd, ras)) =>
        ((ld.join(rd, (las & ras).toSeq ++ coords), las | ras))
      }
    joined.drop(coords: _*)
  }

  /** Convenience: shares from the relations' actual counts. At scale,
    * pass estimates instead (`shares` + `join` are separable precisely
    * so the solver never forces a count job). */
  def joinAuto(rels: Seq[Rel], totalP: Int): DataFrame =
    join(rels, shares(rels.map(r => (r.attrs, r.df.count().toDouble)), totalP))
}
