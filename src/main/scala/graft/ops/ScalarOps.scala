package graft.ops

import graft.{OpQuery, Par, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 group H — scalar function surface (string/date/math/array/map/
  * json, plus the custom-UDF and generator shapes).
  *
  * All expressions here are codegen'd built-ins except h10's UDF — which is
  * the declared "custom scalar UDF" surface and intentionally so (SURVEY
  * §2 h10 notes it is opaque to Catalyst; the oracle re-expresses the same
  * arithmetic relationally).
  */
object ScalarOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val h1_string_core = OpQuery(
    (s, d) => t(s, d, "part")
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("up5"),
        lower(col("p_brand")).as("lbrand"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("ttype"),
        lpad(col("p_brand"), 12, "*").as("padbrand"),
        length(col("p_name")).cast(LongType).as("namelen"),
        regexp_replace(col("p_name"), " ", "_").as("uname"))
      .orderBy("p_partkey"),
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 5)) AS up5,
      |  lower(p_brand) AS lbrand,
      |  trim('  ' || p_type || '  ') AS ttype,
      |  lpad(p_brand, 12, '*') AS padbrand,
      |  CAST(length(p_name) AS BIGINT) AS namelen,
      |  replace(p_name, ' ', '_') AS uname
      |FROM part ORDER BY p_partkey""".stripMargin)

  val h2_string_split_regex = OpQuery(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        element_at(split(col("text"), " "), 1).as("first_tok"),
        regexp_extract(col("source"), "([0-9]+)", 1).as("src_num"),
        regexp_replace(col("lang"), "[aeiou]", "_").as("lang_novowel"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  string_split(text, ' ')[1] AS first_tok,
      |  regexp_extract(source, '([0-9]+)', 1) AS src_num,
      |  regexp_replace(lang, '[aeiou]', '_', 'g') AS lang_novowel,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |FROM documents ORDER BY doc_id""".stripMargin)

  val h3_date_core = OpQuery(
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast(LongType).as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("eom"))
      .orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |  EXTRACT(YEAR FROM o_orderdate) AS yr,
      |  EXTRACT(MONTH FROM o_orderdate) AS mo,
      |  EXTRACT(DAY FROM o_orderdate) AS dom,
      |  date_trunc('month', o_orderdate) AS month_start,  -- DuckDB returns DATE here
      |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(o_orderdate) AS eom
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  val h4_math_core = OpQuery(
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("r2"),
        floor(col("o_totalprice")).cast(LongType).as("flr"),
        ceil(col("o_totalprice")).cast(LongType).as("cl"),
        abs(col("o_totalprice") - lit(100000.0)).as("dist100k"),
        Par.r6(sqrt(col("o_totalprice"))).as("sq"),
        Par.r6(log(col("o_totalprice"))).as("lnp"),
        Par.r6(pow(col("o_totalprice"), lit(0.3))).as("pw"),
        (col("o_orderkey") % 7).as("mod7"),
        signum(col("o_totalprice") - lit(150000.0)).as("sgn"))
      .orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |  round(o_totalprice, 2) AS r2,
      |  CAST(floor(o_totalprice) AS BIGINT) AS flr,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS cl,
      |  abs(o_totalprice - 100000.0) AS dist100k,
      |  round(sqrt(o_totalprice), 6) AS sq,
      |  round(ln(o_totalprice), 6) AS lnp,
      |  round(pow(o_totalprice, 0.3), 6) AS pw,
      |  o_orderkey % 7 AS mod7,
      |  CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  val h5_cond_expr = OpQuery(
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
          .when(col("o_orderpriority") === "3-MEDIUM", "warm")
          .otherwise("cold").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
        least(col("o_totalprice"), lit(100000.0)).as("lo"))
      .orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
      |       WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
      |       ELSE 'cold' END AS tier,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
      |  greatest(o_totalprice, 100000.0) AS hi,
      |  least(o_totalprice, 100000.0) AS lo
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  /** Array ops (size/max/min/slice/sort). The slice results are arrays
    * INTERNALLY but the dumped projection expands them to scalar columns:
    * the driver's pandas comparator cannot sort (or hash) array cells, so a
    * final projection must be scalar-only (r1 gate crash).
    */
  val h6_array_funcs = OpQuery(
    (s, d) => {
      val first3 = slice(col("embedding"), 1, 3)
      val top3 = slice(sort_array(col("embedding"), asc = false), 1, 3)
      def el(a: Column, i: Int) = round(element_at(a, i).cast(DoubleType), 6)
      t(s, d, "embeddings")
        .select(col("vec_id") +:
          size(col("embedding")).cast(LongType).as("dim") +:
          round(array_max(col("embedding")).cast(DoubleType), 6).as("amax") +:
          round(array_min(col("embedding")).cast(DoubleType), 6).as("amin") +:
          ((1 to 3).map(i => el(first3, i).as(s"f3_$i")) ++
            (1 to 3).map(i => el(top3, i).as(s"t3_$i"))): _*)
        .orderBy("vec_id")
    },
    "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
      "round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS amax, " +
      "round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS amin, " +
      (1 to 3).map(i => s"round(CAST(embedding[$i] AS DOUBLE), 6) AS f3_$i").mkString(", ") + ", " +
      (1 to 3).map(i => s"round(CAST(list_sort(embedding, 'DESC')[$i] AS DOUBLE), 6) AS t3_$i").mkString(", ") +
      " FROM embeddings ORDER BY vec_id")

  /** Higher-order functions: transform/filter/aggregate/zip_with. The
    * L2-norm-via-aggregate is the SURVEY's showcase; the fold is sequential
    * in both engines and error ≪ the 1e-6 rounding granularity.
    */
  val h7_array_hof = OpQuery(
    (s, d) => {
      val dbl = transform(col("embedding"), x => x.cast(DoubleType))
      // transform() is the op under test; the dump expands its array result
      // to scalars (driver comparator is scalar-only — see h6).
      val scaled4 = transform(slice(dbl, 1, 4), x => round(x * 2, 6))
      t(s, d, "embeddings")
        .select(col("vec_id") +:
          Par.r6(sqrt(aggregate(transform(dbl, x => x * x), lit(0.0), (acc, x) => acc + x)))
            .as("l2norm") +:
          size(filter(col("embedding"), x => x > 0)).cast(LongType).as("n_pos") +:
          Par.r6(aggregate(zip_with(dbl, reverse(dbl), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)).as("dot_rev") +:
          (1 to 4).map(i => element_at(scaled4, i).as(s"s4_$i")): _*)
        .orderBy("vec_id")
    },
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS l2norm,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |  round(list_sum(list_transform(range(1, 65),
      |    i -> embedding[i]::DOUBLE * embedding[65 - i]::DOUBLE)), 6) AS dot_rev,
      |  round(embedding[1]::DOUBLE * 2, 6) AS s4_1,
      |  round(embedding[2]::DOUBLE * 2, 6) AS s4_2,
      |  round(embedding[3]::DOUBLE * 2, 6) AS s4_3,
      |  round(embedding[4]::DOUBLE * 2, 6) AS s4_4
      |FROM embeddings ORDER BY vec_id""".stripMargin)

  /** Map construction + lookup. DuckDB element_at returns a LIST ⇒ oracle
    * indexes [1] (SURVEY §7.4.9).
    */
  val h8_map_funcs = OpQuery(
    (s, d) => {
      val m = map_from_entries(array(
        struct(lit("nat").as("k"), col("n_nationkey").as("v")),
        struct(lit("reg").as("k"), col("n_regionkey").as("v"))))
      t(s, d, "nation")
        .withColumn("m", m)
        .select(col("n_nationkey"),
          element_at(col("m"), "reg").as("reg_val"),
          // map_keys yields an array; dump it joined (scalar-only rule, h6)
          array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
          size(col("m")).cast(LongType).as("m_size"))
        .orderBy("n_nationkey")
    },
    """SELECT n_nationkey,
      |  m['reg'][1] AS reg_val,
      |  array_to_string(list_sort(map_keys(m)), ',') AS keys,
      |  CAST(cardinality(m) AS BIGINT) AS m_size
      |FROM (SELECT n_nationkey,
      |        map_from_entries([{'k': 'nat', 'v': n_nationkey}, {'k': 'reg', 'v': n_regionkey}]) AS m
      |      FROM nation)
      |ORDER BY n_nationkey""".stripMargin)

  val h9_json_extract = OpQuery(
    (s, d) => t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy("event_id"),
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin)

  /** Custom scalar UDF: FITS-style sexagesimal "HH:MM:SS" → degrees.
    * The string is fabricated deterministically from o_orderkey, parsed back
    * by the UDF; the oracle re-derives the same value relationally.
    */
  val h10_udf_scalar = OpQuery(
    (s, d) => {
      val sexa2deg = udf { (sx: String) =>
        if (sx == null) null.asInstanceOf[java.lang.Double]
        else {
          val p = sx.split(":")
          java.lang.Double.valueOf(
            p(0).toDouble * 15.0 + p(1).toDouble / 4.0 + p(2).toDouble / 240.0)
        }
      }
      t(s, d, "orders")
        .withColumn("ra_str", concat_ws(":",
          lpad((col("o_orderkey") % 24).cast(StringType), 2, "0"),
          lpad((col("o_orderkey") * 7 % 60).cast(StringType), 2, "0"),
          lpad((col("o_orderkey") * 13 % 60).cast(StringType), 2, "0")))
        .select(col("o_orderkey"), col("ra_str"),
          Par.r6(sexa2deg(col("ra_str"))).as("ra_deg"))
        .orderBy("o_orderkey")
    },
    """SELECT o_orderkey, ra_str,
      |  round(CAST(parts[1] AS DOUBLE) * 15.0 + CAST(parts[2] AS DOUBLE) / 4.0
      |        + CAST(parts[3] AS DOUBLE) / 240.0, 6) AS ra_deg
      |FROM (
      |  SELECT o_orderkey,
      |    lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST(o_orderkey * 7 % 60 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST(o_orderkey * 13 % 60 AS VARCHAR), 2, '0') AS ra_str
      |  FROM orders),
      |  LATERAL (SELECT string_split(ra_str, ':') AS parts)
      |ORDER BY o_orderkey""".stripMargin)

  /** Generator (UDTF shape): one doc row → one row per token, with position.
    * Spark's built-in posexplode Generator composes with split — no custom
    * Generator class needed (SURVEY §2 h11).
    */
  val h11_udtf_generator = OpQuery(
    (s, d) => t(s, d, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("token"))
      .orderBy("doc_id", "pos"),
    """SELECT doc_id,
      |  CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
      |  unnest(toks) AS token
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |      FROM documents WHERE doc_id < 50)
      |ORDER BY doc_id, pos""".stripMargin)

  /** h12: bitwise function family — AND/OR/XOR/NOT, shifts, popcount.
    * All on BIGINT where Java and DuckDB semantics coincide (two's
    * complement; keys are positive so shifts can't hit the
    * engine-divergent overflow edge: the shifted operand is bounded to
    * < 1024 before `<< 3`). DuckDB's `^` is POWER — its XOR is the
    * xor() function. Narrow codegen'd map, no shuffle.
    */
  val h12_bit_funcs = OpQuery(
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("b_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("b_or"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("b_xor"),
        expr("~o_orderkey").as("b_not"),
        expr("shiftleft(o_orderkey % 1024, 3)").as("b_shl"),
        expr("shiftright(o_orderkey, 2)").as("b_shr"),
        expr("CAST(bit_count(o_orderkey) AS BIGINT)").as("b_cnt"))
      .orderBy("o_orderkey"),
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS b_and,
      |  o_orderkey | 4096 AS b_or,
      |  xor(o_orderkey, o_custkey) AS b_xor,
      |  ~o_orderkey AS b_not,
      |  (o_orderkey % 1024) << 3 AS b_shl,
      |  o_orderkey >> 2 AS b_shr,
      |  CAST(bit_count(o_orderkey) AS BIGINT) AS b_cnt
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  /** h13: edit-distance functions — the typo-tolerant matching primitive
    * (d14 does blocked record linkage under hamming; this is the scalar
    * surface under real edit distance). A dirty name is planted per
    * customer (the i30 convention: drop the 3rd char when id % 3 = 0,
    * duplicate it when id % 3 = 1, identity otherwise — substitutions,
    * deletions and exact matches all exercised; same construction in the
    * oracle), then levenshtein (native codegen'd in Spark, native in
    * DuckDB) scores the pair and a ≤ 2 band flags the match — the fuzzy
    * dedup verdict shape. Narrow map; levenshtein is O(len²) per pair —
    * at 100 TB you BLOCK first (d14's pigeonhole) and run this only on
    * candidates, exactly how the two ops compose.
    */
  val h13_edit_distance = OpQuery(
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"))
      // four planted classes so BOTH band outcomes occur (the b17
      // non-vacuity rule): deletion (dist 1), duplication (dist 1),
      // heavy mangling — 3 chars replaced with '#', which never occurs
      // in names, so dist = 3 > band — and identity (dist 0)
      .withColumn("dirty",
        when(col("c_custkey") % 6 === 0,
          concat(lit("###"), substring(col("c_name"), 4, 1000)))
          .when(col("c_custkey") % 3 === 0,
            concat(substring(col("c_name"), 1, 2), substring(col("c_name"), 4, 1000)))
          .when(col("c_custkey") % 3 === 1,
            concat(substring(col("c_name"), 1, 3), substring(col("c_name"), 3, 1000)))
          .otherwise(col("c_name")))
      .select(col("c_custkey"), col("c_name"), col("dirty"),
        levenshtein(col("c_name"), col("dirty")).cast(LongType).as("dist"),
        (levenshtein(col("c_name"), col("dirty")) <= 2).as("is_match"))
      .orderBy("c_custkey"),
    """SELECT c_custkey, c_name, dirty,
      |  CAST(levenshtein(c_name, dirty) AS BIGINT) AS dist,
      |  levenshtein(c_name, dirty) <= 2 AS is_match
      |FROM (SELECT c_custkey, c_name,
      |        CASE WHEN c_custkey % 6 = 0
      |             THEN '###' || substring(c_name, 4)
      |             WHEN c_custkey % 3 = 0
      |             THEN substring(c_name, 1, 2) || substring(c_name, 4)
      |             WHEN c_custkey % 3 = 1
      |             THEN substring(c_name, 1, 3) || substring(c_name, 3)
      |             ELSE c_name END AS dirty
      |      FROM customer)
      |ORDER BY c_custkey""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "h13_edit_distance" -> h13_edit_distance,
    "h1_string_core" -> h1_string_core,
    "h12_bit_funcs" -> h12_bit_funcs,
    "h2_string_split_regex" -> h2_string_split_regex,
    "h3_date_core" -> h3_date_core,
    "h4_math_core" -> h4_math_core,
    "h5_cond_expr" -> h5_cond_expr,
    "h6_array_funcs" -> h6_array_funcs,
    "h7_array_hof" -> h7_array_hof,
    "h8_map_funcs" -> h8_map_funcs,
    "h9_json_extract" -> h9_json_extract,
    "h10_udf_scalar" -> h10_udf_scalar,
    "h11_udtf_generator" -> h11_udtf_generator)
}
