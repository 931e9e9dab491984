package graft

import graft.ops.ScanOps
import org.apache.spark.sql.functions._

class ScanOpsSpec extends SparkTestBase {

  test("a8 partition pruning reaches the scan (PartitionFilters)") {
    val df = ScanOps.a8_sink_partitioned.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1996"),
      s"partition filter not pushed:\n${plan.take(800)}")
    // only the 1996 partition's rows come back
    val years = df.select("o_year").distinct().collect().map(_.getInt(0)).toSeq
    assert(years == Seq(1996))
  }

  test("a2 multifile union doubles row count") {
    assert(ScanOps.a2_scan_multifile_union.fn(spark, sfDir).count() ==
      2 * Tables.t(spark, sfDir, "region").count())
  }

  test("g4 intersectAll/exceptAll multiset variants behave") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    assert(a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }
}
