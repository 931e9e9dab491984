package graft.ops

import graft.{OpQuery, Par, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 group F — window functions.
  *
  * Determinism: every orderBy inside a window carries a unique tiebreaker
  * (o_orderkey / event_id), per SURVEY §7.4.1. Running/sliding SUMs go
  * through exact DECIMAL (Par) — window frames are evaluated in different
  * internal orders by Spark (streaming frame) vs DuckDB (segment tree), so
  * raw double frame-sums would not hash-match.
  *
  * Scale note: a window = one shuffle on partitionBy key + per-key sort.
  * All windows here partition by a high-cardinality key (custkey/user_id);
  * none uses an empty partitionBy over big data except j4's surrogate
  * (documented there).
  */
object WindowOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private val dec = DecimalType(18, 2)

  val f1_win_rank = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(LongType).as("rn"),
          rank().over(w).cast(LongType).as("rk"),
          dense_rank().over(w).cast(LongType).as("drk"),
          ntile(4).over(w).cast(LongType).as("nt"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER w AS rn, rank() OVER w AS rk,
      |  dense_rank() OVER w AS drk, ntile(4) OVER w AS nt
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** Top-3-per-group: the rank-filter idiom (no self-join). */
  val f2_win_topk_per_group = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)

  /** Inter-event gap per user via lag; gap kept as exact integer µs. */
  val f3_win_lag_lead = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          lag(col("ts"), 1).over(w).as("prev_ts"),
          lead(col("ts"), 1).over(w).as("next_ts"))
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id, ts,
      |  lag(ts) OVER w AS prev_ts, lead(ts) OVER w AS next_ts,
      |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin)

  /** Running (cumulative) revenue per customer. */
  val f4_win_running_frame = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast(dec)).over(w).cast(DoubleType).as("running_rev"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** Centered moving average over a ±2-row frame (sum/count split keeps the
    * arithmetic exact-then-one-division, engine-identical).
    */
  val f5_win_sliding_frame = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 2)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(col("o_totalprice").cast(dec)).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / count(*) OVER w AS mov_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** 30-day trailing revenue per customer — RANGE frame over time. Spark's
    * rangeBetween needs a numeric sort key: epoch seconds (orderdate is
    * midnight-aligned, verified, so second-truncation is lossless).
    */
  val f6_win_range_frame = OpQuery(
    (s, d) => {
      // o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false); NTZ
      // can't cast straight to long, so go via TimestampType (session TZ is
      // pinned UTC, and dates are midnight-aligned ⇒ lossless epoch seconds).
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast(TimestampType).cast(LongType))
        .rangeBetween(-30L * 86400, 0)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast(dec)).over(w).cast(DoubleType).as("rev_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)

  val f7_win_first_last = OpQuery(
    (s, d) => {
      val wFull = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(wFull).as("first_price"),
          last(col("o_totalprice")).over(wFull).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  last_value(o_totalprice) OVER w AS last_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** f8: distribution window functions — percent_rank, cume_dist, the
    * derived decile bucket, and the partition row count. pr/cd are ratios
    * of exact integers ((rank−1)/(n−1), rows≤current/n): both engines
    * divide the same integer operands, so the doubles are bit-identical —
    * no rounding needed (unlike frame-sums of doubles, which ARE
    * order-sensitive and go through Par.dsum elsewhere).
    */
  val f8_win_distribution = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val wp = Window.partitionBy("o_custkey")
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ceil(cume_dist().over(w) * 10).cast(LongType).as("decile"),
          count(lit(1)).over(wp).as("n_part"))
        .orderBy("o_custkey", "o_orderkey")
    },
    """SELECT o_custkey, o_orderkey,
      |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
      |  CAST(ceil(cume_dist() OVER w * 10) AS BIGINT) AS decile,
      |  CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_part
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)

  /** f9: IGNORE NULLS window navigation — forward-fill (last non-null so
    * far) and previous-non-null, the gap-filling idiom of sensor/event
    * series (and of sparse feature columns in training data). NULLs are
    * planted deterministically (o_orderkey % 3 — the i30 convention);
    * both engines evaluate the SAME rows-frame semantics: Spark
    * `last(col, ignoreNulls)` / `lag(col, 1, null, ignoreNulls)` vs
    * DuckDB `last_value(x IGNORE NULLS)` / `lag(x, 1 IGNORE NULLS)`.
    * Values pass through untouched (no frame arithmetic), so raw doubles
    * hash-match. Same one-shuffle-per-partitionBy-key scale shape as the
    * rest of the family.
    */
  val f9_win_ignore_nulls = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("val", when(col("o_orderkey") % 3 === 0,
          lit(null).cast(DoubleType)).otherwise(col("o_totalprice")))
        .select(col("o_orderkey"), col("o_custkey"), col("val"),
          last(col("val"), ignoreNulls = true).over(wf).as("ffill"),
          lag(col("val"), 1, null, ignoreNulls = true).over(w).as("prev_nn"))
        .orderBy("o_orderkey")
    },
    """SELECT o_orderkey, o_custkey, val,
      |  last_value(val IGNORE NULLS) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
      |  lag(val, 1 IGNORE NULLS) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderkey) AS prev_nn
      |FROM (SELECT o_orderkey, o_custkey,
      |        CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |             ELSE o_totalprice END AS val FROM orders)
      |ORDER BY o_orderkey""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "f9_win_ignore_nulls" -> f9_win_ignore_nulls,
    "f1_win_rank" -> f1_win_rank,
    "f8_win_distribution" -> f8_win_distribution,
    "f2_win_topk_per_group" -> f2_win_topk_per_group,
    "f3_win_lag_lead" -> f3_win_lag_lead,
    "f4_win_running_frame" -> f4_win_running_frame,
    "f5_win_sliding_frame" -> f5_win_sliding_frame,
    "f6_win_range_frame" -> f6_win_range_frame,
    "f7_win_first_last" -> f7_win_first_last)
}
