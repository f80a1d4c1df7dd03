package graft

/** Catalog-wide contracts: unique names, non-empty results at smoke
  * scale, oracle coverage bookkeeping. */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every query returns rows at sf0.001") {
    SparkEntry.catalog.foreach { q =>
      val n = q.build(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of query names") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
