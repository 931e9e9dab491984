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

  test("LshBucket64 returns NULL for short or null-bearing vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.fill(64)(0.5f))), // well-formed
      (2L, Some(Seq.fill(32)(0.5f))), // short: formula undefined
      (3L, None) // null vector
    ).toDF("id", "embedding")
    val out = df.select(col("id"), lshBucket(col("embedding")).as("b"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1), "short vector must yield NULL, not a partial bucket")
    assert(out(2).isNullAt(1))
  }

  test("signature expressions return NULL for null-bearing/empty inputs (LshBucket64 standard)") {
    import spark.implicits._
    import graft.functions.HashFunctions.{minhashSignature, simhash64}
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(11L), Some(22L), Some(33L)))), // well-formed
      (2L, Some(Seq[Option[Long]](Some(11L), None, Some(33L)))), // null element
      (3L, Some(Seq.empty[Option[Long]])), // empty set
      (4L, None) // null array
    ).toDF("id", "hs")
    val out = df.select(col("id"),
        minhashSignature(col("hs")).as("mh"), simhash64(col("hs")).as("sh"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2))
    // pre-fix a null element folded to hash 0 (voting -1 on all simhash
    // bits; entering the minhash min) instead of NULL-poisoning
    assert(out(1).isNullAt(1), "minhash of a null-bearing set must be NULL")
    assert(out(1).isNullAt(2), "simhash of a null-bearing set must be NULL")
    // pre-fix the empty-set minhash was 64 x Long.MaxValue — making every
    // empty doc band-identical in LSH; simhash keeps its defined 0
    assert(out(2).isNullAt(1), "minhash of an empty set must be NULL")
    assert(!out(2).isNullAt(2) && out(2).getLong(2) == 0L)
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("HashedBagOfTokens rejects a non-positive bucket count at construction") {
    intercept[IllegalArgumentException](
      graft.functions.HashedBagOfTokens(
        org.apache.spark.sql.catalyst.expressions.Literal(null), 0))
  }

  test("ShingleHashSet matches the composed string-shingle pipeline's set sizes") {
    // collision-free on the corpus: |distinct pair hashes| must equal
    // |distinct string shingles| for every document, and the two-pointer
    // intersect counts must agree pairwise (spot-checked via i5's jaccard
    // parity at sf0.1 — here we gate the per-doc set construction)
    val docs = Tables.t(spark, sfDir, "documents")
    val composed = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shs", when(size(col("toks")) < 2, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 2),
          i => concat(element_at(col("toks"), i + 1), lit(" "),
            element_at(col("toks"), i + 2))))))
      .select(col("doc_id"), size(col("shs")).as("n_str"))
    val onepass = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(graft.functions.HashFunctions.shingleHashSet(col("toks"))).as("n_hash"))
    val diff = composed.join(onepass, "doc_id")
      .filter(col("n_str") =!= col("n_hash")).count()
    assert(diff == 0, "pair-hash distinct set diverges from string shingle set")
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

  test("SqDistLong edge semantics: common prefix, null elements, null input") {
    import spark.implicits._
    // common-prefix truncation mirrors DotProduct's contract
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 6L))).toDF("a", "b")
    assert(df.select(graft.functions.VectorFunctions.sqDistLong(col("a"), col("b")))
      .collect()(0).getLong(0) == 9L + 16L)
    // a null ELEMENT contributes 0; a null ARRAY nulls the result
    val withNullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT), 3L) AS a, array(1L, 5L, 7L) AS b")
    assert(withNullElem.select(
      graft.functions.VectorFunctions.sqDistLong(col("a"), col("b")))
      .collect()(0).getLong(0) == 16L)
    val withNullArr = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNullArr.select(
      graft.functions.VectorFunctions.sqDistLong(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("DotLong edge semantics and random-array agreement with a reference fold") {
    import spark.implicits._
    val df = Seq((Seq(2L, 3L, 5L), Seq(7L, 11L))).toDF("a", "b")
    assert(df.select(graft.functions.VectorFunctions.dotLong(col("a"), col("b")))
      .collect()(0).getLong(0) == 14L + 33L) // common-prefix truncation
    val withNullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT), 3L) AS a, array(10L, 5L, 7L) AS b")
    assert(withNullElem.select(
      graft.functions.VectorFunctions.dotLong(col("a"), col("b")))
      .collect()(0).getLong(0) == 10L + 21L) // null element contributes 0
    val withNullArr = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNullArr.select(
      graft.functions.VectorFunctions.dotLong(col("a"), col("b")))
      .collect()(0).isNullAt(0))
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val arrGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L)))
    val prop = Prop.forAll(arrGen, arrGen) { (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.VectorFunctions.dotLong(col("a"), col("b")))
        .collect()(0).getLong(0)
      got == a.zip(b).map { case (x, y) => x * y }.sum
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("HashedBagOfTokens matches the SQL HOF formulation it replaced") {
    import spark.implicits._
    val D = 16
    // the last doc carries a supplementary (non-BMP) character: the hash
    // must advance per CODE POINT (like the SQL ascii/len formulation and
    // the DuckDB oracle), not per UTF-16 unit
    val docs = Seq("hello world a", "", "x yz  zz", "sparkly engines hum",
      "café 😀a end")
    val got = docs.toDF("text")
      .select(graft.functions.HashFunctions.hashedBagOfTokens(
        split(col("text"), " "), D).as("fv"))
      .collect().map(_.getSeq[Long](0).toVector)
    val exp = docs.map { t =>
      val counts = new Array[Long](D + 1)
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        val cps = w.codePoints().toArray
        val h = cps.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum % D
        counts(h.toInt) += 1
      }
      counts(D) = 1L
      counts.toVector
    }
    assert(got.toSeq == exp, s"got=${got.toSeq}\nexp=$exp")
  }

  test("SqDistLong matches a reference fold on random arrays") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val arrGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L)))
    val prop = Prop.forAll(arrGen, arrGen) { (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.VectorFunctions.sqDistLong(col("a"), col("b")))
        .collect()(0).getLong(0)
      val want = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("SqDistLong equals the zip_with formula on quantized pairs (both eval paths)") {
    import org.apache.spark.sql.functions._
    val q = Tables.t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qv")
    // adjacent-id pairs give a deterministic sample including self-pairs' zero
    val pairs = q.as("a").join(q.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id") || col("a.vec_id") === col("b.vec_id"))
    val hof = expr(
      "aggregate(zip_with(a.qv, b.qv, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
    def mismatches() = pairs
      .select(graft.functions.VectorFunctions.sqDistLong(col("a.qv"), col("b.qv")).as("fast"),
        hof.as("ref"), col("a.vec_id") === col("b.vec_id") as "self")
      .filter(col("fast") =!= col("ref") || (col("self") && col("fast") =!= 0L)).count()
    assert(mismatches() == 0, "codegen path disagrees with zip_with formula")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(mismatches() == 0, "interpreted path disagrees with zip_with formula")
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
