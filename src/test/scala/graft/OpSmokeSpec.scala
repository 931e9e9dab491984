package graft

/** Smoke: every declared query executes at sf0.001 and returns a sane shape
  * (the DuckDB hash-match itself is the driver-run t2 gate; this catches
  * runtime regressions in `sbt test`).
  */
class OpSmokeSpec extends SparkTestBase {

  private val expectNonEmpty = SparkEntry.queries.keySet --
    Set("i5_dedup_near_jaccard", "i10_dedup_minhash_lsh", "i11_dedup_simhash",
      "i12_dedup_embcos") // near-dup pair sets may be empty at sf0.001

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      if (expectNonEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("d5 cross join cardinality is |region| × |nation|") {
    assert(SparkEntry.queries("d5_join_cross")(spark, sfDir).count() == 125)
  }
}
