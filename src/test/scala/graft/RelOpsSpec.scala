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
}
