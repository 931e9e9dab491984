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
}
