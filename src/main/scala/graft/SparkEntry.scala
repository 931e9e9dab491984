package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY §2 operator key appears in `queries`; oracle-gated keys
  * also appear in `oracleSql` (same column names/ordering, per the driver's
  * sorted-column hash compare).
  */
object SparkEntry {

  private val groups: Seq[Map[String, OpQuery]] =
    Seq(ScanOps.all, EtlOps.all, RelOps.all, AggOps.all, WindowOps.all,
      ScalarOps.all, LlmOps.all, StreamOps.all, MultimodalOps.all,
      TrainOps.all, CorpusOps.all)

  private val ops: Map[String, OpQuery] = {
    val merged = groups.reduce(_ ++ _)
    // Map ++ silently keeps the right-hand entry on key collision — a
    // shadowed operator would just vanish from the gate. Fail loudly.
    require(merged.size == groups.map(_.size).sum,
      "duplicate operator key across groups")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggOps.e2_agg_groupby.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.collect { case (k, OpQuery(_, Some(sql))) => k -> sql }
}
