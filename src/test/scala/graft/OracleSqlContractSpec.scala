package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.4's determinism rules as an ENFORCED contract over every
  * `SparkEntry.oracleSql` entry — not a per-op convention someone has to
  * remember (VERDICT r4 directive #8). Static text checks, honest about
  * their limits: they parse clause structure (paren-depth scans, literal
  * stripping), not full SQL — they catch the mistakes that actually
  * happened during development (a missing final ORDER BY, a raw double
  * aggregate dumped unrounded, a nondeterministic function sneaking into
  * an oracle), while rule 1's KEY-UNIQUENESS half stays the job of the
  * driver's row-hash gate (a non-unique order key that changes row order
  * hash-mismatches there).
  *
  * Every future operator's oracle is checked automatically the moment it
  * lands in the map — no per-op opt-in — and a planted-violation test
  * proves each rule actually fires (the checks can't rot into vacuity).
  */
class OracleSqlContractSpec extends AnyFunSuite {

  private val sqls: Map[String, String] = SparkEntry.oracleSql
  assert(sqls.nonEmpty)

  /** Blank out single-quoted string literals (fixture text may contain
    * keywords, slashes, parens) — lengths change but structure keeps.
    */
  private def stripLiterals(sql: String): String =
    sql.replaceAll("'[^']*'", "''")

  /** Keep only paren-depth-0 characters (others become spaces), so
    * clause scans can't be fooled by subqueries/CTE bodies/function
    * arguments.
    */
  private def topLevelText(sql: String): String = {
    val sb = new StringBuilder
    var depth = 0
    sql.foreach {
      case '(' => depth += 1; sb += ' '
      case ')' => depth -= 1; sb += ' '
      case c => sb += (if (depth == 0) c else ' ')
    }
    sb.toString
  }

  /** The final top-level SELECT list (text between the last depth-0
    * SELECT and the next depth-0 FROM), split at depth-0 commas —
    * original text, parens intact.
    */
  private def finalSelectItems(sql: String): Seq[String] = {
    val s = stripLiterals(sql)
    var depth = 0
    var lastSelect = -1
    var fromAfter = -1
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, "SELECT", 0, 6))
            { lastSelect = i + 6; fromAfter = -1 }
          if (depth == 0 && fromAfter < 0 && lastSelect >= 0 &&
            i >= lastSelect && s.regionMatches(true, i, "FROM", 0, 4))
            fromAfter = i
      }
      i += 1
    }
    assert(lastSelect >= 0 && fromAfter > lastSelect, s"no final SELECT..FROM in:\n$sql")
    val list = s.substring(lastSelect, fromAfter)
    val items = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var d = 0
    list.foreach {
      case '(' => d += 1; items.last += '('
      case ')' => d -= 1; items.last += ')'
      case ',' if d == 0 => items += new StringBuilder
      case c => items.last += c
    }
    items.map(_.toString.trim).toSeq.filter(_.nonEmpty)
  }

  /** Single-row queries need no ORDER BY: an UNGROUPED, UNWINDOWED final
    * select whose every item is an aggregate (or a literal) returns
    * exactly one row, so row order is trivially deterministic (e1, e3,
    * e4, b11 are this shape).
    */
  private def isSingleRowAggregate(sql: String): Boolean = {
    val top = topLevelText(stripLiterals(sql))
    val noGroup = """(?i)\bGROUP\s+BY\b""".r.findFirstIn(top).isEmpty
    val agg = """(?i)\b(count|sum|min|max|avg|list)\s*\(""".r
    val literal = """(?i)^\s*(true|false|-?[0-9.]+)\s+AS\s+\w+\s*$""".r
    noGroup && finalSelectItems(sql).forall { it =>
      """(?i)\bOVER\b""".r.findFirstIn(it).isEmpty &&
        (agg.findFirstIn(it).isDefined || literal.pattern.matcher(it).matches())
    }
  }

  // ---- the three rules as predicates (reused by the planted test) --------

  private val orderByTail = """(?is).*\bORDER\s+BY\b[^()]*?(\bLIMIT\s+\d+\s*)?$""".r

  private def violatesRule1(sql: String): Boolean =
    !orderByTail.pattern.matcher(topLevelText(stripLiterals(sql)).trim).matches() &&
      !isSingleRowAggregate(sql)

  // anything whose value depends on run time, engine instance, or
  // physical layout — a single hit poisons the whole parity gate
  private val banned = Seq("rand(", "random(", "now(", "current_timestamp",
    "current_date", "today(", "uuid(", "gen_random_uuid",
    "monotonically_increasing_id", "spark_partition_id", "input_file",
    "setseed")

  private def rule3Hits(sql: String): Seq[String] = {
    val low = stripLiterals(sql).toLowerCase
    banned.filter(low.contains)
  }

  // §7.4.2's actual hazard is aggregation order: summing doubles gives
  // different low bits under different partial-aggregation orders, so any
  // aggregate whose ARGUMENT is already floating (an explicit DOUBLE/FLOAT
  // cast, or a known floating fixture column not first made exact via
  // DECIMAL) must round before the dump. Per-row double arithmetic,
  // integer/DECIMAL aggregation (exact, associative), and pure casts are
  // deterministic and exempt — this is the convention the corpus actually
  // follows (e.g. sum(CAST(x AS DECIMAL)) then one final cast/divide).
  private val aggOpen =
    """(?i)\b(sum|avg|stddev_samp|stddev_pop|stddev|corr|covar_samp|covar_pop|var_samp|var_pop|list_sum|product)\s*\(""".r

  // double-typed fixture columns (FIXTURES.md/TESTDATA.md schemas)
  private val floatCols = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "o_totalprice", "s_acctbal", "c_acctbal", "value",
    "quality", "embedding")

  private def aggArgs(item: String): Seq[String] = {
    val low = item.toLowerCase
    aggOpen.findAllMatchIn(low).map { m =>
      var depth = 1
      var i = m.end
      while (i < low.length && depth > 0) {
        if (low(i) == '(') depth += 1
        if (low(i) == ')') depth -= 1
        i += 1
      }
      low.substring(m.end, math.max(m.end, i - 1))
    }.toSeq
  }

  private def rule2Violations(sql: String): Seq[String] =
    finalSelectItems(sql).filter { item =>
      val low = item.toLowerCase
      !low.contains("round(") && aggArgs(item).exists { arg =>
        arg.contains("::double") || arg.contains("as double") ||
          arg.contains("::float") ||
          (floatCols.exists(arg.contains) && !arg.contains("decimal"))
      }
    }

  // ---- the contract over the real corpus ---------------------------------

  test("rule 1: every oracle ends with a top-level final ORDER BY (or is single-row)") {
    val bad = sqls.filter { case (_, sql) => violatesRule1(sql) }
    assert(bad.isEmpty,
      s"oracles without a final top-level ORDER BY: ${bad.keys.toSeq.sorted.mkString(", ")}")
  }

  test("rule 3: no nondeterministic / engine-local functions anywhere") {
    val bad = sqls.flatMap { case (k, sql) => rule3Hits(sql).map(b => s"$k: $b") }
    assert(bad.isEmpty, s"nondeterministic functions in oracles:\n${bad.mkString("\n")}")
  }

  test("rule 2: no raw FLOATING-POINT AGGREGATION reaches a dumped column") {
    val bad = sqls.flatMap { case (k, sql) =>
      rule2Violations(sql).map(it => s"$k: ${it.linesIterator.mkString(" ").take(100)}")
    }
    assert(bad.isEmpty,
      s"unrounded floating aggregation in output columns:\n${bad.mkString("\n")}")
  }

  // ---- and proof the rules FIRE (no vacuous green) -----------------------

  test("the contract detects planted violations of each rule") {
    // rule 1: multi-row select with no final ORDER BY
    assert(violatesRule1("SELECT doc_id, lang FROM documents"))
    // ...but an ORDER BY buried in a subquery must NOT satisfy it
    assert(violatesRule1(
      "SELECT doc_id FROM (SELECT doc_id FROM documents ORDER BY doc_id)"))
    // and the single-row exemption stays narrow: a windowed item is multi-row
    assert(violatesRule1(
      "SELECT sum(n_tok) OVER (PARTITION BY lang) AS s FROM documents"))
    // rule 2: floating aggregation dumped raw, via cast or via column type
    assert(rule2Violations(
      "SELECT sum(value::DOUBLE) AS s FROM events ORDER BY s").nonEmpty)
    assert(rule2Violations(
      "SELECT lang, sum(value) AS s FROM events GROUP BY 1 ORDER BY lang").nonEmpty)
    // ...while the sanctioned forms pass: rounded, or DECIMAL-exact
    assert(rule2Violations(
      "SELECT round(sum(value), 4) AS s FROM events ORDER BY s").isEmpty)
    assert(rule2Violations(
      "SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s " +
        "FROM orders ORDER BY s").isEmpty)
    // rule 3: nondeterministic functions, but not ones hiding in literals
    assert(rule3Hits("SELECT rand() AS r FROM t ORDER BY r").nonEmpty)
    assert(rule3Hits("SELECT 'rand() is banned' AS s FROM t ORDER BY s").isEmpty)
  }
}
