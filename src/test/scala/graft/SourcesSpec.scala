package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.TextSources
import graft.datagen.Generators

/** Text-source parsers and deterministic generators. */
class SourcesSpec extends SparkSpec {

  test("pipe-delimited parse: trailing delimiter, empty -> null, typed cast") {
    val dir = Files.createTempDirectory("graft-pipe").toFile
    val f = new java.io.File(dir, "data.dat")
    Files.writeString(f.toPath, "1|alpha|3.5|\n2||7.25|\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val got = TextSources.pipeDelimited(spark, f.getAbsolutePath, schema)
      .orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getInt(0) == 1 && got(0).getString(1) == "alpha" && got(0).getDouble(2) == 3.5)
    assert(got(1).isNullAt(1)) // "" -> null
  }

  test("whitespace edge parse") {
    val dir = Files.createTempDirectory("graft-ws").toFile
    Files.writeString(new java.io.File(dir, "e.txt").toPath, "1 2\n3\t4\n\n5  6\n")
    val got = TextSources.whitespaceEdges(spark, dir.getAbsolutePath + "/e.txt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L), (5L, 6L)))
  }

  test("SNAP ego-net parse: 2-token triangle closure and k-token chain") {
    val dir = Files.createTempDirectory("graft-snap").toFile
    Files.writeString(new java.io.File(dir, "9.edges").toPath, "1 2\n3 4 5\n")
    val got = TextSources.snapEgoNet(spark, dir.getAbsolutePath)
      .collect().map(e => (e.source, e.target)).toSet
    // 2-token line: (9,1),(9,2),(1,2); 3-token: (3,4),(4,5),(9,3),(5,9)
    assert(got == Set((9L, 1L), (9L, 2L), (1L, 2L), (3L, 4L), (4L, 5L), (9L, 3L), (5L, 9L)))
  }

  test("generators are deterministic and partitioning-independent") {
    val a = Generators.ints(spark, 10, 100, seed = 7).collect().map(_.toString).sorted
    val b = Generators.ints(spark, 10, 100, seed = 7).repartition(7)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val c = Generators.ints(spark, 10, 100, seed = 8).collect().map(_.toString).sorted
    assert(!a.sameElements(c))
  }

  test("generated group counts are exact") {
    val df = Generators.ints(spark, 100, 50)
    assert(df.count() == 5000)
    assert(df.select("a").distinct().count() == 100)
  }

  test("skewed edges concentrate mass on low keys") {
    val df = Generators.skewedEdges(spark, 1000, 10000).cache()
    val low = df.filter(org.apache.spark.sql.functions.col("source") < 100).count()
    assert(low > 2000, s"expected skew toward low keys, got $low/10000 below 100")
  }
}
