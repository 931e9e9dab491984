package graft

import graft.ops.RelOps

class RelOpsSpec extends SparkTestBase {

  test("d10 plan carries a dynamic partition pruning expression") {
    val df = RelOps.d10_join_dpp.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in:\n${plan.take(1200)}")
    // expected: years whose order count is even (the dim predicate)
    import org.apache.spark.sql.functions._
    val expected = Tables.t(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y")).count()
      .filter(col("count") % 2 === 0)
      .collect().map(_.getInt(0)).toSet
    val years = df.select("o_year").distinct().collect().map(_.getInt(0)).toSet
    assert(years == expected, s"got $years expected $expected")
  }

  test("d11 bucketized range lookup plans an equi-join, not a nested loop") {
    import org.apache.spark.sql.functions._
    val df = RelOps.d11_join_range_lookup.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range lookup fell back to a non-equi plan:\n${plan.take(1000)}")
    // every reported interval count matches a direct BETWEEN recount
    val out = df.collect()
    assert(out.nonEmpty)
    out.take(5).foreach { r =>
      val n = Tables.t(spark, sfDir, "orders")
        .filter(col("o_totalprice") >= r.getLong(1) && col("o_totalprice") <= r.getLong(2))
        .count()
      assert(n == r.getLong(3), s"interval [${r.getLong(1)},${r.getLong(2)}] recount mismatch")
    }
  }

  test("d12 interval-overlap join: equi-bucket plan, exact pair set") {
    val df = RelOps.d12_join_interval_overlap.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain-Scala all-pairs reference over the same fabricated intervals
    val keys = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    def iv(k: Long, mult: Long, m: Int) = {
      val s = (k * mult) % 100000L; (s, s + 1 + k % m)
    }
    val as = keys.filter(_ % 37 == 0).map(k => k -> iv(k, 2654435761L, 50))
    val bs = keys.filter(_ % 11 == 0).map(k => k -> iv(k, 1099087573L, 40))
    val expect = (for {
      (ai, (sa, ea)) <- as; (bi, (sb, eb)) <- bs
      if sa <= eb && sb <= ea
    } yield (ai, bi)).toSet
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    assert(out.nonEmpty, "fixture produced no overlaps (vacuous)")
    // the distinct() is load-bearing ONLY if some matching pair's shared
    // overlap REGION crosses a bucket boundary (then the pair meets in
    // two buckets and would duplicate without the dedup) — the r4 review
    // found the earlier interval-straddles-a-boundary form vacuous
    val multi = for {
      (ai, (sa, ea)) <- as; (bi, (sb, eb)) <- bs
      if sa <= eb && sb <= ea &&
        math.min(ea, eb) / 32 > math.max(sa, sb) / 32
    } yield (ai, bi)
    assert(multi.nonEmpty,
      "no overlapping pair shares >1 bucket — the pair-distinct is untested")
  }
}
