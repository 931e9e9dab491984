package graft

import graft.functions.VectorFunctions.{dot, intersectCount, lshBucket}
import org.apache.spark.sql.functions._
import scala.util.Random

class VectorExpressionsSpec extends SparkTestBase {

  private val rnd = new Random(7)

  test("DotProduct matches a reference fold (codegen path)") {
    import spark.implicits._
    val cases = Seq.fill(50)((
      Seq.fill(8)(rnd.nextFloat() * 20 - 10),
      Seq.fill(8)(rnd.nextFloat() * 20 - 10)))
    val got = cases.toDF("a", "b").select(dot(col("a"), col("b"))).collect()
    cases.zip(got).foreach { case ((a, b), row) =>
      val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(math.abs(row.getDouble(0) - expected) < 1e-12)
    }
  }

  test("DotProduct truncates to the common prefix and propagates null") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(10f, 20f))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).collect()(0).getDouble(0) == 50.0)
    val withNull = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(withNull.select(dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("IntersectCountSorted equals set-intersection size on sorted input") {
    import spark.implicits._
    val cases = Seq.fill(100)((
      Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct.sorted,
      Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 50).distinct.sorted)) ++
      Seq((Seq.empty[Long], Seq.empty[Long]), (Seq(1L, 2L), Seq.empty[Long]),
        (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
    val got = cases.toDF("a", "b").select(intersectCount(col("a"), col("b"))).collect()
    cases.zip(got).foreach { case ((a, b), row) =>
      assert(row.getInt(0) == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("expressions survive both codegen and interpreted evaluation") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f), Seq(1L, 5L, 9L), Seq(5L, 9L, 11L)))
      .toDF("a", "b", "x", "y")
    // wholestage off forces the interpreted/eval path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(df.select(dot(col("a"), col("b"))).collect()(0).getDouble(0) == 11.0)
      assert(df.select(intersectCount(col("x"), col("y"))).collect()(0).getInt(0) == 2)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("LshBucket64 equals the HOF formula on real embeddings (both eval paths)") {
    // the i19 oracle recomputes buckets with this exact double arithmetic —
    // the codegen expression must match it bit-for-bit on every vector
    val e = Tables.t(spark, sfDir, "embeddings")
    val hof = org.apache.spark.sql.functions.expr(
      """aggregate(sequence(0, 7), 0L, (acc, j) ->
        |  acc + CASE WHEN aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
        |    (sacc, k) -> sacc + embedding[k] *
        |      (CAST((j * 64 + k) * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5)
        |  ) > 0 THEN CAST(shiftleft(1L, CAST(j AS INT)) AS BIGINT) ELSE 0L END)""".stripMargin)
    def mismatches() = e
      .select(lshBucket(col("embedding")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches() == 0, "codegen path disagrees with HOF formula")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(mismatches() == 0, "interpreted path disagrees with HOF formula")
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
