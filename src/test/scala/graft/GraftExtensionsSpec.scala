package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions register as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |               array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       intersect_count(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS c""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)
  }

  test("signature expressions register as SQL functions and match the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT shingle_hash_set(array('a','b','a','b')) AS sh,
        |       minhash_signature(array(1L, 2L, 3L)) AS mh,
        |       simhash64(array(1L, 2L, 3L)) AS sim,
        |       token_repetition_stats(array('a','b','a','b')) AS st""".stripMargin)
      .collect()(0)
    // 'a b','b a','a b' -> 2 distinct shingle hashes
    assert(r.getSeq[Long](0).length == 2)
    assert(r.getSeq[Long](1).length == graft.functions.MinHashSignature.NumHashes)
    // SQL path computes the same values as the Column-API path
    import graft.functions.HashFunctions.{shingleHashSet, simhash64, tokenRepetitionStats}
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1)
      .select(shingleHashSet(array(lit("a"), lit("b"), lit("a"), lit("b"))).as("sh"),
        simhash64(array(lit(1L), lit(2L), lit(3L))).as("sim"),
        tokenRepetitionStats(array(lit("a"), lit("b"), lit("a"), lit("b"))).as("st"))
      .collect()(0)
    assert(r.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(r.getLong(2) == viaCol.getLong(1))
    // [distinct tokens, max bigram frequency]: 2 distinct, 'a b' twice
    assert(r.getSeq[Long](3) == Seq(2L, 2L) && viaCol.getSeq[Long](2) == Seq(2L, 2L))
  }

  test("sphere_haversine registers as a SQL function and matches the Scala mirror") {
    GraftExtensions.register(spark)
    val cases = Seq((0L, 0L, 0L, 2000L), (359900L, 0L, 100L, 0L),
      (123456L, 89500L, 300000L, 89700L), (5L, -90000L, 180000L, 90000L))
    val sql = cases.map { case (ra, da, rb, db) =>
      s"sphere_haversine(${ra}L, ${da}L, ${rb}L, ${db}L)"
    }.mkString("SELECT ", ", ", "")
    val row = spark.sql(sql).collect()(0)
    cases.zipWithIndex.foreach { case ((ra, da, rb, db), i) =>
      val expect = graft.functions.SphereMath.haversine(ra, da, rb, db)
      assert(java.lang.Double.doubleToRawLongBits(row.getDouble(i)) ==
        java.lang.Double.doubleToRawLongBits(expect),
        s"case $i: SQL ${row.getDouble(i)} != mirror $expect (bit-exact)")
    }
    // null propagates (typed null — an untyped NULL literal is void and
    // is correctly refused at analysis); wrong arity must surface the
    // expected signature (the r7 advisor nit: the bare builder indexed
    // c(3) and died with IndexOutOfBoundsException instead)
    assert(spark.sql(
      "SELECT sphere_haversine(CAST(NULL AS BIGINT), 0L, 0L, 0L)")
      .collect()(0).isNullAt(0))
    val e = intercept[Exception](
      spark.sql("SELECT sphere_haversine(1L, 2L)").collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(
      "sphere_haversine(ra_a, dec_a, ra_b, dec_b)")),
      s"arity error must name the signature, got: ${messages(e).mkString(" | ")}")
  }

  test("hamming_ascii matches the SQL HOF refine it replaced, bit for bit") {
    GraftExtensions.register(spark)
    // random equal-length hex keys + the HOF form hammingBlockedPairs
    // used before r8 — the compiled expression must agree on every pair
    val rnd = new scala.util.Random(8L)
    def key(n: Int) = Seq.fill(n)("0123456789abcdef"(rnd.nextInt(16))).mkString
    Seq(9, 16, 32).foreach { n =>
      (1 to 20).foreach { _ =>
        val (a, b) = (key(n), key(n))
        val row = spark.sql(
          s"""SELECT hamming_ascii('$a', '$b') AS fast,
             |  CAST(size(filter(sequence(1, $n), i ->
             |    substring('$a', i, 1) <> substring('$b', i, 1))) AS BIGINT)
             |    AS hof""".stripMargin).collect()(0)
        assert(row.getLong(0) == row.getLong(1),
          s"hamming_ascii('$a','$b') = ${row.getLong(0)} != HOF ${row.getLong(1)}")
      }
    }
    assert(spark.sql("SELECT hamming_ascii('abc', 'abd')")
      .collect()(0).getLong(0) == 1L)
    // unequal lengths throw (the declared contract), never guess
    val el = intercept[Exception](
      spark.sql("SELECT hamming_ascii('abc', 'ab')").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(el).exists(_.contains("equal-length")), msgs(el).mkString(" | "))
  }

  test("token_term_freq: counts per distinct token, sorted, skips empty/null") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT inline(token_term_freq(array('b', 'a', 'b', '', cast(NULL AS STRING), 'b')))")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 3L)))
  }
}
