package graft.ops

import graft.{OpQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators (builder-prompt north star, extending the
  * LlmOps family): PII scrubbing and vocabulary/term-weighting — the steps
  * between raw crawl text and a training corpus that LlmOps' dedup/quality
  * chain doesn't cover.
  *
  * Scale posture: i30 is a pure narrow map (regex per row, no shuffle at
  * any scale). i33/i31 shuffle once on the token key — the token explode
  * stays map-side and only (id, token) pairs move, never document bodies;
  * the vocabulary itself is tiny relative to the corpus (Heaps' law), so
  * the df table broadcasts.
  */
object CorpusOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  // -------- i30: PII redaction ---------------------------------------------

  /** Patterns are kept to the regex subset with identical semantics in Java
    * regex (Spark, codegen'd) and RE2 (DuckDB oracle): character classes,
    * bounded repetition, no backrefs/lookaround.
    */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+1-555-[0-9]{4}"
  private val Ipv4Pat =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The synthetic corpus carries no PII (no digits or '@' anywhere), so
    * the fixture plants it deterministically from doc_id — some docs get
    * multiple emails, some none, so counts exercise 0/1/2 per type. The
    * SAME construction runs in the oracle SQL; the redaction under test is
    * the regex chain, not the planting.
    */
  private def plantedPii: Column = {
    val id = col("doc_id")
    val ids = id.cast(StringType)
    concat(
      col("text"),
      when(id % 3 > 0,
        concat(lit(" contact user"), ids, lit("@mail.example.com")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" cc admin"), ids, lit("@corp.example.org")))
        .otherwise(lit("")),
      when(id % 2 === 0,
        concat(lit(" call +1-555-"),
          lpad((id % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      when(id % 4 === 1,
        concat(lit(" from 10.0."), (id % 256).cast(StringType), lit("."),
          ((id * 7) % 256).cast(StringType)))
        .otherwise(lit(""))
    )
  }

  /** i30: PII redaction — count then replace email/phone/IPv4 with typed
    * placeholders. Email runs first so its digit-bearing local part can't
    * be half-eaten by the IPv4 pass; counts are taken on the pre-redaction
    * text so they audit what was removed. Narrow map: no shuffle.
    */
  val i30_pii_redact = OpQuery(
    (s, d) => {
      def nMatches(pat: String): Column =
        size(regexp_extract_all(col("raw"), lit(pat), lit(0))).cast(LongType)
      t(s, d, "documents")
        .withColumn("raw", plantedPii)
        .select(col("doc_id"),
          nMatches(EmailPat).as("n_email"),
          nMatches(PhonePat).as("n_phone"),
          nMatches(Ipv4Pat).as("n_ip"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), EmailPat, "<EMAIL>"),
              PhonePat, "<PHONE>"),
            Ipv4Pat, "<IP>").as("redacted"))
        .orderBy("doc_id")
    },
    Some("""WITH doctored AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 3 > 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@corp.example.org' ELSE '' END
      |    || CASE WHEN doc_id % 2 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 4 = 1 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
      |    AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(raw, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(raw, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
      |  regexp_replace(regexp_replace(regexp_replace(raw,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
      |FROM doctored ORDER BY doc_id""".stripMargin))

  // -------- i33 / i31: vocabulary + term weighting -------------------------

  /** Distinct (doc, tok, tf) rows with tf computed map-side by the
    * compiled TokenTermFreq expression (tokens materialized before the
    * explode — the generator-re-evaluation trap, LlmOps.withToks). One row
    * per DISTINCT token per doc: both term-weighting ops build on this
    * instead of raw (doc, token-occurrence) pairs, so nothing
    * corpus-duplicate-sized ever shuffles.
    */
  private def docTermFreq(s: SparkSession, d: String) =
    t(s, d, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(graft.functions.HashFunctions.tokenTermFreq(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"), col("p.tf").as("tf"))

  /** i33: corpus vocabulary build — collection frequency + document
    * frequency per token, ranked by cf. The tokenizer-construction step of
    * a training pipeline. cf = sum of the row-local tfs and df = row count
    * per token, so the single shuffle carries distinct (doc, tok) rows and
    * needs no count-distinct expand. The final rank window is global but
    * runs over the AGGREGATED vocabulary (≪ corpus, Heaps' law), not the
    * corpus.
    */
  val i33_vocab_df = OpQuery(
    (s, d) => docTermFreq(s, d)
      .groupBy("tok")
      .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("cf").desc, col("tok"))).cast(LongType))
      .orderBy("rnk"),
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |vocab AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS cf,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM toks WHERE tok <> '' GROUP BY tok)
      |SELECT tok, cf, df,
      |  CAST(row_number() OVER (ORDER BY cf DESC, tok) AS BIGINT) AS rnk
      |FROM vocab ORDER BY rnk""".stripMargin))

  /** i31: top-3 characteristic terms per document by a tf·idf-style score.
    * The score is tf · 10⁶ DIV df — reciprocal-df weighting in EXACT
    * integer arithmetic (tf ≤ doc length, so tf·10⁶ < 2⁵²): a float idf
    * (ln-damped) ranks near-ties by sub-ulp differences that no two
    * engines resolve identically, while integer scores make the
    * (score desc, tok asc) order total and portable.
    *
    * Shape: tf is ROW-LOCAL, so TokenTermFreq computes it map-side in one
    * compiled pass — the explode emits one row per DISTINCT (doc, token)
    * and the corpus-sized groupBy(doc_id, tok) shuffle of the naive plan
    * never exists. df is derived from those rows (count per token =
    * distinct docs) — the only corpus-wide aggregate, vocabulary-sized
    * output, broadcast back. The rank window partitions by doc — parallel
    * across documents at any scale.
    */
  val i31_tfidf_topterms = OpQuery(
    (s, d) => {
      val tf = docTermFreq(s, d)
      val dfTbl = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfTbl), "tok")
        .withColumn("score",
          expr("CAST((tf * 1000000) DIV df AS BIGINT)"))
        .withColumn("rk", row_number()
          .over(Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("tok"))).cast(LongType))
        .filter(col("rk") <= 3)
        .select("doc_id", "tok", "tf", "df", "score", "rk")
        .orderBy("doc_id", "rk")
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
      |df AS (
      |  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM toks WHERE tok <> '' GROUP BY tok)
      |SELECT doc_id, tok, tf, df, score, CAST(rk AS BIGINT) AS rk FROM (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY (tf.tf * 1000000) // df.df DESC, tf.tok) AS rk
      |  FROM tf JOIN df ON tf.tok = df.tok)
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin))

  // -------- i32: bigram language-model counts ------------------------------

  /** Shared by i32/i36: the corpus bigram count table (w1, w2, c12). The
    * pair explode is map-side; the (w1, w2) groupBy is the ONLY
    * corpus-sized shuffle either op pays (partial agg); every further
    * aggregate runs over the vocab²-sized bigram table.
    */
  /** Frame-based core (PrepMain composes it over the kept set). */
  private[graft] def bigramCountsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .where(col("text").isNotNull)
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2) // sequence(1,0) would run DESCENDING
    toks.select(explode(expr(
      "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
  }

  private def bigramCounts(s: SparkSession, d: String): DataFrame =
    bigramCountsOf(t(s, d, "documents"))

  /** The matching DuckDB CTE: exposes c(w1, w2, c12). */
  private val bigramSqlCte: String =
    """WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE text IS NOT NULL),
      |bg AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b
      |       FROM d WHERE len(toks) >= 2),
      |c AS (SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2, count(*) AS c12
      |      FROM bg GROUP BY 1, 2)""".stripMargin

  /** i32: bigram LM table — count(w1,w2), the predecessor total count(w1·),
    * and the conditional probability P(w2|w1) in exact integer micro-units
    * (c12·10⁶ DIV c1, the i31 portable-score convention; c12·10⁶
    * overflows only past ~9·10¹² occurrences of ONE bigram — orders of
    * magnitude beyond any real corpus). Top-50 by (c12 desc, w1, w2) is
    * a total order (bigram keys unique) → TakeOrderedAndProject, no
    * global sort.
    */
  val i32_bigram_lm = OpQuery(
    (s, d) => {
      val c = bigramCounts(s, d)
      val u = c.groupBy("w1").agg(sum(col("c12")).as("c1"))
      c.join(broadcast(u), "w1")
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          expr("c12 * 1000000 DIV c1").as("p_micro"))
        .orderBy(col("c12").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some(bigramSqlCte + """,
      |u AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c GROUP BY 1)
      |SELECT c.w1, c.w2, c.c12, u.c1, c.c12 * 1000000 // u.c1 AS p_micro
      |FROM c JOIN u ON c.w1 = u.w1
      |ORDER BY c.c12 DESC, c.w1, c.w2 LIMIT 50""".stripMargin))

  /** i36: collocation mining by pointwise lift — c12·N / (c1·c2), the
    * quantity whose log is PMI (lift > 1 ⇔ the pair co-occurs more than
    * independence predicts; monotone in PMI, so ranking needs no float
    * log). The c12 ≥ 5 support floor is the standard collocation guard
    * against low-frequency noise pairs.
    *
    * Score arithmetic is ROUNDED DOUBLE, not the integer-micro convention:
    * the single-truncation integer form c12·N·10⁶ DIV (c1·c2) overflows
    * Long once N·max(c12) passes ~9·10¹² (a few-TB corpus) — and Spark
    * wraps silently where DuckDB errors, the worst cross-engine shape.
    * Each operand is cast to double FIRST (both engines evaluate the same
    * IEEE tree: (c12·nb) / (c1·c2), then round-6), so results stay
    * bit-identical at any corpus size — the i5-jaccard portability
    * convention. Ties at 6dp break on (w1, w2): still a total order.
    *
    * Shape: everything past the shared bigram count runs on the
    * vocab²-sized table — two small aggregates (broadcast back) and a
    * one-row total (broadcast cross join). Top-30 on a total order →
    * TakeOrderedAndProject.
    */
  val i36_collocation_lift = OpQuery(
    (s, d) => {
      val c = bigramCounts(s, d)
      val u1 = c.groupBy("w1").agg(sum(col("c12")).as("c1"))
      val u2 = c.groupBy("w2").agg(sum(col("c12")).as("c2"))
      val n = c.agg(sum(col("c12")).as("nb"))
      c.where(col("c12") >= 5)
        .join(broadcast(u1), "w1")
        .join(broadcast(u2), "w2")
        .crossJoin(broadcast(n))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
          round((col("c12").cast("double") * col("nb").cast("double")) /
            (col("c1").cast("double") * col("c2").cast("double")), 6).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(30)
    },
    Some(bigramSqlCte + """,
      |u1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c GROUP BY 1),
      |u2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM c)
      |SELECT c.w1, c.w2, c.c12, u1.c1, u2.c2,
      |       round((CAST(c.c12 AS DOUBLE) * CAST(n.nb AS DOUBLE))
      |         / (CAST(u1.c1 AS DOUBLE) * CAST(u2.c2 AS DOUBLE)), 6) AS lift
      |FROM c JOIN u1 ON c.w1 = u1.w1 JOIN u2 ON c.w2 = u2.w2 CROSS JOIN n
      |WHERE c.c12 >= 5
      |ORDER BY lift DESC, c.w1, c.w2 LIMIT 30""".stripMargin))

  // -------- i37: line-level exact dedup (boilerplate removal) --------------

  /** The synthetic corpus has no newlines, so "lines" are synthesized the
    * way i30 plants PII: a deterministic boilerplate header/footer on
    * id-derived subsets plus the natural text chunked 8 tokens per line,
    * with the SAME construction in the oracle. The operator under test is
    * the frequency-based line drop + order-preserving reassembly, not the
    * planting.
    */
  private val BoilerHeader = "subscribe to our newsletter for daily updates"
  private val BoilerFooter = "copyright twenty twenty four example corp all rights reserved"

  /** i37: sub-document (line/paragraph-level) exact dedup — the boilerplate
    * scrubber: split every document into lines, count each distinct line's
    * document frequency corpus-wide, drop lines occurring in > 10 distinct
    * documents (site chrome, headers, footers), and reassemble the
    * remaining text preserving line order. This is the dedup granularity
    * between document-exact (b10) and near-dup (i5/i10): it removes
    * repeated fragments from otherwise-unique pages.
    *
    * Shape at scale: the split/explode is map-side; the line-frequency
    * aggregate is one shuffle of (line, doc_id) pairs — at 100 TB the
    * group key would be xxhash64(line) so only 8-byte hashes shuffle, with
    * the string kept only on the probe side (the string key here keeps the
    * oracle engine-portable). Boilerplate lines are FEW by definition
    * (high document frequency ⇒ small distinct count), so the drop set
    * broadcasts and the drop itself is a map-side left join. The only
    * corpus-sized shuffle carrying text is the per-doc reassembly groupBy —
    * inherent to producing reassembled documents, keyed doc_id, parallel
    * across docs.
    */
  val i37_dedup_lines = OpQuery(
    (s, d) => {
      val emptyArr = array().cast(ArrayType(StringType))
      // NULL-text guard (same contract as i38/bigramCounts): without it a
      // NULL doc diverges between engines — legacy-mode size(NULL) = -1
      // makes sequence(0,-1) run DESCENDING and fabricate chunk entries,
      // while the oracle's range(0,NULL) drops the doc entirely.
      // localCheckpoint: BOTH the boiler aggregate and the probe side read
      // this frame — without it the tokenize→chunk→posexplode pipeline
      // (the expensive map-side work) runs twice (the minhashVerifiedPairs
      // convention).
      val lines = t(s, d, "documents")
        .where(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("chunks", expr(
          "transform(sequence(0, CAST(ceil(size(toks) / 8.0) AS INT) - 1), " +
            "i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"))
        .withColumn("lines", concat(
          when(col("doc_id") % 2 === 0, array(lit(BoilerHeader))).otherwise(emptyArr),
          col("chunks"),
          when(col("doc_id") % 3 === 0, array(lit(BoilerFooter))).otherwise(emptyArr)))
        .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
        .localCheckpoint()
      val boiler = lines.groupBy("line")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") > 10)
        .select(col("line"), lit(true).as("is_boiler"))
      lines.join(broadcast(boiler), Seq("line"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_dropped"),
          // collect_list skips the nulls the unmatched WHEN leaves, and
          // array_sort on (pos, line) structs restores document order
          array_join(transform(array_sort(collect_list(
            when(col("is_boiler").isNull, struct(col("pos"), col("line"))))),
            p => p.getField("line")), "\n").as("text_clean"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |         WHERE text IS NOT NULL),
      |ch AS (SELECT doc_id, list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
      |         i -> array_to_string(toks[i*8+1 : i*8+8], ' ')) AS chunks FROM d),
      |lns AS (SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN ['$BoilerHeader'] ELSE [] END)
      |    || chunks
      |    || (CASE WHEN doc_id % 3 = 0 THEN ['$BoilerFooter'] ELSE [] END) AS lines FROM ch),
      |x AS (SELECT doc_id, unnest(list_transform(range(0, len(lines)),
      |        i -> {'pos': i, 'line': lines[i+1]}), recursive := true) FROM lns),
      |boiler AS (SELECT line FROM x GROUP BY line HAVING count(DISTINCT doc_id) > 10)
      |SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(*) FILTER (WHERE b.line IS NOT NULL) AS BIGINT) AS n_dropped,
      |  coalesce(array_to_string(list(x.line ORDER BY x.pos)
      |    FILTER (WHERE b.line IS NULL), chr(10)), '') AS text_clean
      |FROM x LEFT JOIN boiler b ON x.line = b.line
      |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin))

  // -------- i38: doc-level LM quality score --------------------------------

  /** i38: CCNet-style LM quality score — each document's mean log
    * P(w2|w1) under the corpus's own bigram LM (the i32 table), with the
    * low tail flagged for removal. Documents whose transitions are
    * systematically improbable under the corpus distribution are the
    * gibberish/boilerplate candidates a perplexity filter drops.
    *
    * Exactness: per-bigram log-probs are quantized ONCE to integer
    * micro-nats — floor(ln(c12/c1)·10⁶) — on the vocab²-sized LM table,
    * then per-doc scores are integer sums/divisions (order-independent,
    * exact, same DIV truncation both engines). The only float op is that
    * single ln per DISTINCT bigram: both engines evaluate ln on the
    * bit-identical double c12/c1, agree to ≤2 ulp (≈6e-15 abs), and a
    * floor flip needs ln·10⁶ within ~1e-8 of an integer — ~1e-8 odds per
    * distinct bigram, vocab²-bounded, vanishing. (A per-OCCURRENCE float
    * sum would instead inherit Spark's nondeterministic reduce order —
    * the hash risk this convention exists to avoid.)
    *
    * Shape at scale: the LM join is an equi-join on (w1, w2) against the
    * vocab²-sized (Heaps-bounded) LM table — broadcast here, a plain hash
    * join at 100 TB; the per-doc aggregate is one shuffle keyed doc_id.
    * Every doc bigram exists in the corpus LM by construction, so the
    * inner join is lossless for docs with ≥ 2 tokens.
    */
  /** The doc-score pipeline shared by i38 (score + flag) and i49 (bucket
    * + sample policy): (doc_id, n_bigrams, sum_lp_micro, mean_lp_micro)
    * for every scoreable document (non-null text, ≥ 2 tokens).
    */
  /** The integer micro-nat bigram log-prob table (w1, w2, lp_micro) —
    * the LM side shared by docScoresOf (batch i38/i49) and the j14
    * streaming gate. See i38's Scaladoc for the quantization argument.
    */
  private[graft] def bigramLogProbsOf(docs: DataFrame): DataFrame = {
    val c = bigramCountsOf(docs)
    val u = c.groupBy("w1").agg(sum(col("c12")).as("c1"))
    c.join(broadcast(u), "w1")
      .select(col("w1"), col("w2"),
        floor(log(col("c12").cast(DoubleType) / col("c1").cast(DoubleType))
          * lit(1000000.0d)).as("lp_micro"))
  }

  private[graft] def docScoresOf(docs: DataFrame): DataFrame = {
    val lp = bigramLogProbsOf(docs)
    val occ = docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2) // same guard as bigramCounts
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    occ.join(broadcast(lp), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sum_lp_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_micro"),
        expr("sum_lp_micro DIV n_bigrams").as("mean_lp_micro"))
  }

  private def docScores(s: SparkSession, d: String): DataFrame =
    docScoresOf(t(s, d, "documents"))

  /** The i49 policy over an arbitrary score frame (doc_id,
    * mean_lp_micro) — PrepMain's `--ppl ccnet` stage composes it over
    * the kept set's own scores. Returns (doc_id, mean_lp_micro, prank,
    * bucket, keep); see i49's Scaladoc for the policy and scale shape.
    * Callers should pass a materialized frame (it is read twice: rank
    * pipeline + count).
    */
  private[graft] def perplexityBuckets(scores: DataFrame): DataFrame = {
    val ranked = graft.ingest.Convert.addStablePkey(
      scores.repartitionByRange(col("mean_lp_micro").desc, col("doc_id"))
        .sortWithinPartitions(col("mean_lp_micro").desc, col("doc_id")),
      "prank")
    val n = scores.agg(count(lit(1)).as("n_docs"))
    val headCut = expr("n_docs DIV 3")
    val midCut = expr("2 * (n_docs DIV 3)")
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        when(col("prank") <= headCut, lit("head"))
          .when(col("prank") <= midCut, lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("keep",
        when(col("prank") <= headCut, lit(true))
          .when(col("prank") <= midCut,
            (col("doc_id") * lit(2654435761L)) % 1000 < 500)
          .otherwise(lit(false)))
      .select(col("doc_id"), col("mean_lp_micro"), col("prank"),
        col("bucket"), col("keep"))
  }

  /** The SQL twin of `docScores`: the full WITH-chain ending in a CTE
    * `sc(doc_id, n_bigrams, sum_lp_micro, mean_lp_micro)` — i38 and i49
    * append their own final SELECTs.
    */
  private[graft] val docScoresSqlCte: String = bigramSqlCte.replace(
    "WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE text IS NOT NULL),",
    """WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE text IS NOT NULL),
      |d AS (SELECT toks FROM d0),""".stripMargin) + """,
    |u AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c GROUP BY 1),
    |lp AS (SELECT c.w1, c.w2,
    |         CAST(floor(ln(CAST(c.c12 AS DOUBLE) / CAST(u.c1 AS DOUBLE)) * 1000000) AS BIGINT) AS lp_micro
    |       FROM c JOIN u ON c.w1 = u.w1),
    |occ AS (SELECT doc_id,
    |          unnest(list_transform(range(1, len(toks)),
    |            i -> {'w1': toks[i], 'w2': toks[i+1]}), recursive := true)
    |        FROM d0 WHERE len(toks) >= 2),
    |sc AS (SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
    |  CAST(sum(lp.lp_micro) AS BIGINT) AS sum_lp_micro,
    |  CAST(sum(lp.lp_micro) // count(*) AS BIGINT) AS mean_lp_micro
    |FROM occ JOIN lp ON occ.w1 = lp.w1 AND occ.w2 = lp.w2
    |GROUP BY occ.doc_id)""".stripMargin

  /** i38/j14's shared flag threshold — fixed in the fixture
    * distribution's low-middle (p30–p40 at sf0.01) so both flag classes
    * are populated at every SF.
    */
  private[graft] val PplFlagMicro = -3400000L

  val i38_doc_logprob = OpQuery(
    (s, d) => docScores(s, d)
      .withColumn("flag_low", col("mean_lp_micro") < lit(PplFlagMicro))
      .orderBy("doc_id"),
    Some(docScoresSqlCte + s"""
      |SELECT doc_id, n_bigrams, sum_lp_micro, mean_lp_micro,
      |  mean_lp_micro < $PplFlagMicro AS flag_low
      |FROM sc ORDER BY doc_id""".stripMargin))

  // -------- i49: perplexity buckets + sampling policy ----------------------

  /** i49: CCNet-style perplexity bucketing + the sampling policy that
    * APPLIES it — the step between i38's raw LM score and a training set:
    * rank every scoreable document by mean bigram log-prob (best first),
    * cut the ranking into head / middle / tail thirds, then keep the head,
    * keep a deterministic half of the middle, and drop the tail (the CCNet
    * recipe: high-quality text trains, mid-quality is downsampled, the
    * perplexity tail — gibberish and boilerplate — is removed).
    *
    * Exactness: scores are i38's integer micro-nats; the global rank is
    * total-ordered by (mean_lp_micro DESC, doc_id) so ties cannot flip
    * buckets; cuts are integer thirds (n DIV 3); the middle sample is the
    * i20 Knuth hash-bucket (engine-portable, per-document stable — adding
    * documents never flips an existing keep the way rand()/positional
    * sampling would).
    *
    * Shape at scale: ranking uses b8's two-pass shape — repartitionByRange
    * on the score + per-partition prefix offsets (Convert.addStablePkey) —
    * so no row crosses a single global-window task; the corpus count
    * attaches as a 1-row broadcast (the sanctioned scalar bridge). At
    * 100 TB the thirds would come from a quantile sketch threshold (e14's
    * machinery) instead of an exact rank — same policy, sketch cut; the
    * exact-rank form is what an oracle can replay.
    */
  val i49_perplexity_buckets = OpQuery(
    (s, d) => {
      val sc = docScores(s, d)
        .select(col("doc_id"), col("mean_lp_micro"))
        .localCheckpoint() // read twice: ranking pipeline + corpus count
      perplexityBuckets(sc).orderBy("doc_id")
    },
    Some(docScoresSqlCte + """,
      |r AS (SELECT doc_id, mean_lp_micro,
      |        CAST(row_number() OVER (ORDER BY mean_lp_micro DESC, doc_id) AS BIGINT) AS prank,
      |        count(*) OVER () AS n_docs
      |      FROM sc)
      |SELECT doc_id, mean_lp_micro, prank,
      |  CASE WHEN prank <= n_docs // 3 THEN 'head'
      |       WHEN prank <= 2 * (n_docs // 3) THEN 'middle'
      |       ELSE 'tail' END AS bucket,
      |  CASE WHEN prank <= n_docs // 3 THEN TRUE
      |       WHEN prank <= 2 * (n_docs // 3) THEN (doc_id * 2654435761) % 1000 < 500
      |       ELSE FALSE END AS keep
      |FROM r ORDER BY doc_id""".stripMargin))

  // -------- i55: curriculum training order ---------------------------------

  /** i55: curriculum order — the composition the policy ops exist for:
    * arrange the corpus easy→hard for curriculum training. Difficulty is
    * i49's bucket (head = most fluent under the corpus LM, tail =
    * gibberish); WITHIN a bucket the order is an i51-style deterministic
    * hash shuffle (a fresh multiplier, independent of the i20/i26/i48/i51
    * hashes), so each difficulty stage still presents its documents in
    * decorrelated order — curriculum across stages, shuffle within them,
    * and the whole order a pure function of (corpus, doc_id): resumable,
    * re-runnable, oracle-replayable (rand() curricula are none of these).
    *
    * Shape at scale: one b8 two-pass rank over (bucket_rank, skey,
    * doc_id) — range partition + prefix offsets, no global window
    * (plan-asserted like i49/i51); everything upstream is i38/i49's
    * documented lineage.
    */
  /** The i55 core over an arbitrary (doc_id, text, …) frame — shared by
    * the gated operator and PrepMain's `--shuffle curriculum` stage (the
    * containmentFlags convention). Domain: SCOREABLE docs (the i38/i49
    * guard); returns (doc_id, bucket, skey, cur_pos).
    */
  private[graft] def curriculumOrder(docs: DataFrame): DataFrame = {
    val sc = docScoresOf(docs)
      .select(col("doc_id"), col("mean_lp_micro"))
      .localCheckpoint() // read twice inside perplexityBuckets
    val c = perplexityBuckets(sc)
      .withColumn("brank",
        when(col("bucket") === "head", lit(0L))
          .when(col("bucket") === "middle", lit(1L)).otherwise(lit(2L)))
      .withColumn("skey", (col("doc_id") * lit(968665207L)) % 1000000007L)
    graft.ingest.Convert.addStablePkey(
      c.repartitionByRange(col("brank"), col("skey"), col("doc_id"))
        .sortWithinPartitions(col("brank"), col("skey"), col("doc_id")),
      "cur_pos")
      .select(col("doc_id"), col("bucket"), col("skey"), col("cur_pos"))
  }

  val i55_curriculum_order = OpQuery(
    (s, d) => curriculumOrder(t(s, d, "documents")).orderBy("doc_id"),
    Some(docScoresSqlCte + """,
      |r AS (SELECT doc_id,
      |        row_number() OVER (ORDER BY mean_lp_micro DESC, doc_id) AS prank,
      |        count(*) OVER () AS n_docs
      |      FROM sc),
      |cb AS (SELECT doc_id,
      |        CASE WHEN prank <= n_docs // 3 THEN 'head'
      |             WHEN prank <= 2 * (n_docs // 3) THEN 'middle'
      |             ELSE 'tail' END AS bucket,
      |        CASE WHEN prank <= n_docs // 3 THEN 0
      |             WHEN prank <= 2 * (n_docs // 3) THEN 1
      |             ELSE 2 END AS brank,
      |        (doc_id * 968665207) % 1000000007 AS skey
      |      FROM r)
      |SELECT doc_id, bucket, CAST(skey AS BIGINT) AS skey,
      |  CAST(row_number() OVER (ORDER BY brank, skey, doc_id) AS BIGINT) AS cur_pos
      |FROM cb ORDER BY doc_id""".stripMargin))

  // -------- i42: vocabulary-apply encode -----------------------------------

  /** i42: corpus encode — apply a top-V vocabulary to turn every document
    * into its token-id sequence, the tokenizer-encode step between vocab
    * construction (i33) and sequence packing (i22): id = frequency rank
    * (1-based, ties by token — i33's total order), out-of-vocabulary = 0.
    * V = 16 here so the fixture (31 distinct tokens) exercises both the
    * in-vocab and the OOV regime at every SF; production V (BPE-sized,
    * 32k–256k entries) changes nothing below.
    *
    * Shape at scale: the vocabulary is a Heaps-law-bounded aggregate
    * (one token-keyed shuffle over (tok, count) pairs — map-side partial
    * agg, never document bodies), collapsed to a SINGLE map row and
    * broadcast; the encode itself is then a NARROW map — transform +
    * element_at per token, whole-stage codegen, no shuffle, no explode,
    * no reassembly. The 1-row broadcast nested-loop attach is the
    * sanctioned scalar-bridge shape (j4's global-max pattern), free at
    * any corpus size. The rank window runs over the aggregated
    * vocabulary, not the corpus (the i33 precedent).
    */
  val i42_vocab_encode = OpQuery(
    (s, d) => {
      val toksDf = t(s, d, "documents")
        .where(col("text").isNotNull) // the i37/i38 NULL-text guard
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .localCheckpoint() // read twice: vocab aggregate + encode
      val vocab = toksDf.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cf"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("cf").desc, col("tok"))))
        .filter(col("rnk") <= 16)
      val vmap = vocab.agg(map_from_entries(
        collect_list(struct(col("tok"), col("rnk")))).as("vmap"))
      toksDf.crossJoin(broadcast(vmap))
        .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tok"),
          expr("transform(toks, t -> CAST(coalesce(element_at(vmap, t), 0) AS BIGINT))")
            .as("ids_arr"))
        .select(col("doc_id"), col("n_tok"),
          expr("CAST(size(filter(ids_arr, i -> i = 0)) AS BIGINT)").as("n_oov"),
          array_join(expr("transform(ids_arr, i -> CAST(i AS STRING))"), " ")
            .as("ids"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |         WHERE text IS NOT NULL),
      |v AS (SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
      |      FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok
      |      QUALIFY rnk <= 16),
      |tk AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
      |         i -> {'pos': i, 'tok': toks[i]}), recursive := true) FROM d)
      |SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |  CAST(count(*) FILTER (WHERE v.rnk IS NULL) AS BIGINT) AS n_oov,
      |  array_to_string(list(CAST(coalesce(v.rnk, 0) AS BIGINT) ORDER BY tk.pos), ' ') AS ids
      |FROM tk LEFT JOIN v ON tk.tok = v.tok
      |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin))

  // -------- i46: subword/BPE tokenizer-encode ------------------------------

  /** BPE merge rounds for i46 — small and fixed so the oracle (K unrolled
    * CTE rounds) stays tractable; production K (32k–100k merges) changes
    * only the loop bound, not the shape. Shared with the spec.
    */
  private[graft] val BpeK = 8

  /** Vocabulary cap for BPE merge learning: the top-V words by frequency
    * (ties by word — a total order). Real tokenizer training runs on a
    * bounded word-frequency table too (SentencePiece/HF train single-node
    * on a sample); V bounds the sanctioned driver-side collect.
    */
  private[graft] val BpeV = 2000

  /** Greedy left-to-right non-overlapping application of one merge — the
    * standard BPE merge step. On the marker-wrapped string form
    * ("&lt;h&gt;&lt;e&gt;…"), `replace(s, "<a><b>", "<ab>")` has exactly
    * these semantics (replace scans left to right and never rescans its
    * own output), which is what lets BOTH engines' encode be a chain of
    * plain codegen'd `replace` calls instead of a procedural loop.
    */
  private[graft] def applyBpeMerge(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Plain-Scala BPE merge learning over a (word, freq) vocabulary: K
    * rounds of (count adjacent symbol pairs weighted by word frequency →
    * argmax by (count DESC, pair ASC) → merge everywhere). Deterministic:
    * symbol alphabets here are [a-z] (i46) or hex pairs [0-9A-F] (i60) —
    * pure ASCII, so Scala's UTF-16 order and DuckDB's binary collation
    * agree on every tie-break.
    */
  private[graft] def learnBpeMerges(vocab: Seq[(String, Long)],
      k: Int): Seq[(String, String)] =
    learnBpeMergesSym(
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }, k)

  /** The same learner over PRE-SPLIT symbol sequences (i60's byte symbols
    * are 2-char hex strings, not single chars).
    */
  private[graft] def learnBpeMergesSym(vocab: Seq[(Array[String], Long)],
      k: Int): Seq[(String, String)] = {
    var state: Vector[(Array[String], Long)] = vocab.toVector
    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    while (r < k) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          pc.update(key, pc.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      require(pc.nonEmpty,
        s"BPE: no adjacent pairs left after $r merges — corpus too small for $k rounds")
      val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      state = state.map { case (syms, f) =>
        (applyBpeMerge(syms, best._1, best._2), f)
      }
      r += 1
    }
    merges.result()
  }

  /** The K unrolled oracle learning rounds shared by i46 and i60 — each
    * round counts adjacent-symbol pairs from the wrapped vocabulary
    * strings, takes the (cnt DESC, a, b) argmax in a 1-row CTE, and
    * replaces the merge everywhere. Symbol-agnostic: works for single
    * chars (i46) and hex byte pairs (i60) alike because the wrapped form
    * '&lt;sym&gt;' delimits symbols of any width.
    */
  private def bpeOracleRounds: String = (1 to BpeK).map { r =>
    val prev = s"w${r - 1}"
    s"""p$r AS (SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, string_split(trim(s,'<>'),'><') AS l FROM $prev) t,
       |       LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) u
       |  GROUP BY 1,2),
       |b$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |w$r AS (SELECT word, freq,
       |   replace(s, '<'||b$r.a||'><'||b$r.b||'>', '<'||b$r.a||b$r.b||'>') AS s
       | FROM $prev CROSS JOIN b$r)""".stripMargin
  }.mkString(",\n")

  private def bpeOracleEncExpr: String = (1 to BpeK).foldLeft("s") { (acc, r) =>
    s"replace($acc, '<'||b$r.a||'><'||b$r.b||'>', '<'||b$r.a||b$r.b||'>')"
  }

  private def bpeOracleCross: String =
    (1 to BpeK).map(r => s"CROSS JOIN b$r").mkString(" ")

  /** i46: subword/BPE tokenizer-encode — the real-tokenizer step i42's
    * whole-word encode approximates: LEARN a merge table from corpus
    * character-pair frequencies (K rounds of most-frequent-adjacent-pair,
    * the byte-pair-encoding algorithm of the standard LLM tokenizers),
    * then ENCODE every document by applying the merges greedily in rank
    * order. Words are the [a-z]+ whitespace tokens (drops the
    * marker-unsafe rest deterministically on both engines); output =
    * per-doc subword piece count and the piece sequence.
    *
    * Shape at scale: learning runs on the WORD-FREQUENCY table — one
    * token-keyed shuffle over (word, count) pairs (map-side partial agg,
    * document bodies never move), capped to the top-V rows (BpeV) and
    * collapsed to the driver: a Heaps-law-bounded collect, the i42/i32
    * convention, and exactly where SentencePiece/HF tokenizer training
    * runs too. The K merge rounds then cost K · V · avg_len driver-side —
    * independent of corpus size. The ENCODE is the distributed half: each
    * doc's words are marker-wrapped ("&lt;h&gt;&lt;e&gt;&lt;y&gt;") by one
    * regexp_replace and the K merges apply as a chain of LITERAL
    * `replace` calls (merge table is known at plan time) — a pure NARROW
    * map, whole-stage codegen, no UDF, no shuffle, no explode; the
    * word-wrap markers make `replace`'s left-to-right non-overlapping
    * scan exactly the BPE merge semantics (see applyBpeMerge) while
    * preventing any cross-symbol or cross-word false match ([a-z] symbols
    * can never contain '&lt;'/'&gt;').
    *
    * The oracle recomputes the SAME learning loop as K unrolled CTE
    * rounds (pair counts from the wrapped vocabulary strings → 1-row
    * argmax CTE → replace) and the same encode chain — both engines
    * derive the merge table independently from the raw corpus, so a
    * learning defect on either side hash-mismatches.
    */
  val i46_bpe_encode = OpQuery(
    (s, d) => {
      val toksDf = t(s, d, "documents")
        .where(col("text").isNotNull) // the i37/i38 NULL-text guard
        .select(col("doc_id"),
          expr("filter(split(text, ' '), w -> w rlike '^[a-z]+$')").as("aw"))
        .localCheckpoint() // read twice: vocab aggregate + encode
      val vocab = toksDf.select(explode(col("aw")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cf"))
        .orderBy(col("cf").desc, col("w")).limit(BpeV)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val merges = learnBpeMerges(vocab, BpeK)
      val wrapped = array_join(
        expr("transform(aw, w -> regexp_replace(w, '(.)', '<$1>'))"), " ")
      val encoded = merges.foldLeft(wrapped) { case (c, (a, b)) =>
        replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
      }
      toksDf.filter(size(col("aw")) > 0)
        .select(col("doc_id"), encoded.as("es"))
        .select(col("doc_id"),
          (length(col("es")) - length(replace(col("es"), lit("<"), lit(""))))
            .cast(LongType).as("n_pieces"),
          translate(replace(col("es"), lit("><"), lit(" ")), "<>", "")
            .as("pieces"))
        .orderBy("doc_id")
    },
    Some {
      val rounds = bpeOracleRounds
      val encExpr = bpeOracleEncExpr
      val cross = bpeOracleCross
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
         |         WHERE text IS NOT NULL),
         |aw AS (SELECT doc_id, w FROM (SELECT doc_id, unnest(toks) AS w FROM d)
         |       WHERE regexp_matches(w, '^[a-z]+$$')),
         |words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM aw GROUP BY 1),
         |v AS (SELECT word, freq FROM words ORDER BY freq DESC, word LIMIT $BpeV),
         |w0 AS (SELECT word, freq, regexp_replace(word, '(.)', '<\\1>', 'g') AS s FROM v),
         |$rounds,
         |enc0 AS (SELECT doc_id,
         |   list_aggregate(list_transform(
         |     list_filter(toks, w -> regexp_matches(w,'^[a-z]+$$')),
         |     w -> regexp_replace(w, '(.)', '<\\1>', 'g')), 'string_agg', ' ') AS s
         | FROM d),
         |enc AS (SELECT doc_id, $encExpr AS es FROM enc0 $cross WHERE s IS NOT NULL)
         |SELECT doc_id,
         |  CAST(length(es) - length(replace(es,'<','')) AS BIGINT) AS n_pieces,
         |  translate(replace(es, '><', ' '), '<>', '') AS pieces
         |FROM enc ORDER BY doc_id""".stripMargin
    })

  /** The i60 byte-level BPE core over an arbitrary (doc_id, text) frame —
    * shared by the gate and the randomized-fixture spec. Differences
    * from i46, and why: symbols are the UTF-8 BYTES of each word spelled
    * as 2-hex-digit pairs (hex() in both engines — uppercase, UTF-8), so
    * EVERY token encodes, OOV-free by construction — the GPT-2-class
    * byte-fallback i46's [a-z]+ filter deterministically dropped. The
    * hex spelling is what makes arbitrary text marker-safe: a literal
    * '&lt;' in a document becomes the symbol "3C", so no text byte can
    * ever collide with the marker convention, and the whole encode stays
    * the same narrow plan-literal replace chain (no UDF, no shuffle).
    * Losslessness is a theorem of the construction: concatenating a
    * word's emitted pieces restores hex(word) exactly (merges only
    * regroup byte symbols) — the spec asserts this round-trip on random
    * unicode fixtures.
    */
  private[graft] def bpeBytesEncode(docsIn: DataFrame): DataFrame = {
    val toksDf = docsIn
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w <> '')").as("aw"))
      .localCheckpoint() // read twice: vocab aggregate + encode
    val vocab = toksDf.select(explode(col("aw")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("w")).limit(BpeV)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val symVocab = vocab.map { case (w, f) =>
      (w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X"), f)
    }
    val merges = learnBpeMergesSym(symVocab, BpeK)
    val wrapped = array_join(
      expr("transform(aw, w -> regexp_replace(hex(w), '(..)', '<$1>'))"), " ")
    val encoded = merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
    toksDf.filter(size(col("aw")) > 0)
      .select(col("doc_id"), encoded.as("es"))
      .select(col("doc_id"),
        (length(col("es")) - length(replace(col("es"), lit("<"), lit(""))))
          .cast(LongType).as("n_pieces"),
        translate(replace(col("es"), lit("><"), lit(" ")), "<>", "")
          .as("pieces"))
      .orderBy("doc_id")
  }

  /** i60: BYTE-fallback BPE encode — i46 with the production tokenizer's
    * coverage guarantee (see bpeBytesEncode for the construction). The
    * gate feeds the corpus with a planted multi-byte suffix (" día_N" —
    * an accented two-byte UTF-8 character plus punctuation, per doc_id
    * class) so the multi-byte and non-letter escape paths run AT the
    * gate, not only in the spec; the oracle re-learns the merge table
    * independently from the same augmented corpus (the i46 convention —
    * a learning bug on either side cannot cancel out).
    */
  val i60_bpe_bytes = OpQuery(
    (s, d) => {
      val aug = t(s, d, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"), lit(" día_"),
            (col("doc_id") % 5).cast(StringType)).as("text"))
      bpeBytesEncode(aug)
    },
    Some {
      s"""WITH d AS (SELECT doc_id,
         |         string_split(text || ' día_' || CAST(doc_id % 5 AS VARCHAR), ' ') AS toks
         |       FROM documents WHERE text IS NOT NULL),
         |aw AS (SELECT doc_id, w FROM (SELECT doc_id, unnest(toks) AS w FROM d)
         |       WHERE w <> ''),
         |words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM aw GROUP BY 1),
         |v AS (SELECT word, freq FROM words ORDER BY freq DESC, word LIMIT $BpeV),
         |w0 AS (SELECT word, freq, regexp_replace(hex(word), '(..)', '<\\1>', 'g') AS s FROM v),
         |$bpeOracleRounds,
         |enc0 AS (SELECT doc_id,
         |   list_aggregate(list_transform(list_filter(toks, w -> w <> ''),
         |     w -> regexp_replace(hex(w), '(..)', '<\\1>', 'g')), 'string_agg', ' ') AS s
         | FROM d),
         |enc AS (SELECT doc_id, $bpeOracleEncExpr AS es FROM enc0 $bpeOracleCross
         |        WHERE s IS NOT NULL)
         |SELECT doc_id,
         |  CAST(length(es) - length(replace(es,'<','')) AS BIGINT) AS n_pieces,
         |  translate(replace(es, '><', ' '), '<>', '') AS pieces
         |FROM enc ORDER BY doc_id""".stripMargin
    })

  // -------- i47: trained linear quality classifier -------------------------

  /** i47 hashed-feature dimensionality (bias is feature D). Small so the
    * oracle's exploded feature join stays light; production D (2^18-ish)
    * changes only this constant. Shared with the spec.
    */
  private[graft] val QcD = 16

  /** i47 batch-perceptron epochs — fixed so both engines run the same
    * training schedule. */
  private[graft] val QcE = 4

  // The engine-portable token hash both i47 sides compute identically —
  // sum of position·charcode over the token, mod D — lives in the
  // compiled HashedBagOfTokens expression (graft.functions) since the r5
  // perf pass. (At 100 TB you would use xxhash64 — the i41 convention;
  // the char-sum form is what the regex-subset rule is to i30: the
  // portable subset that keeps the oracle independent.)

  /** i47: trained quality classifier — the wiki-vs-crawl linear scorer of
    * the standard data recipes (the learned counterpart to i29's
    * hand-set thresholds and i38's LM score): hashed bag-of-tokens
    * features (D buckets + bias), weak labels from the `source` field
    * (the corpus-prep idiom: a trusted source list stands in for human
    * labels — here 4-char sources are the positive class, `src0` is held
    * out unlabeled), and QcE epochs of BATCH perceptron training on
    * integer weights. Batch — not stochastic — deliberately: each epoch's
    * update is sum(y·f) over the misclassified set, an order-independent
    * aggregate, so training is deterministic under any partitioning (the
    * i34 integer-grid convention; per-sample SGD would make the model
    * depend on row order, which no distributed gate could reproduce).
    *
    * Shape at scale: feature extraction is a pure NARROW map (token hash
    * + D bucket counts per doc, whole-stage codegen, no explode/shuffle).
    * Each epoch is ONE distributed aggregate (map-side partial sums) that
    * returns D+1 longs to the driver — the bounded scalar-collect
    * pattern; E·(D+1) longs total cross the driver at ANY corpus size.
    * Scoring bakes the learned weights into the plan as literals (the
    * i46 convention) — again a narrow map. Nothing shuffles except the
    * dump sort.
    *
    * The oracle re-trains the SAME model as E unrolled CTE epochs over
    * the exploded (doc, bucket, count) features — both engines learn
    * independently from the raw corpus, so a training defect on either
    * side hash-mismatches.
    */
  val i47_quality_classifier = OpQuery(
    (s, d) => {
      val D = QcD
      val docsF = t(s, d, "documents")
        .where(col("text").isNotNull) // the i37/i38 NULL-text guard
        .select(col("doc_id"), col("source"),
          // one compiled pass per doc (empty-token guard folded in) —
          // replaced the transform/aggregate/filter HOF chain that paid
          // boxed lambda evaluation per CHARACTER (measured ~4× on the
          // feature build); same position·charcode % D math the oracle
          // recomputes in SQL
          graft.functions.HashFunctions.hashedBagOfTokens(
            split(col("text"), " "), D).as("fv"))
        .localCheckpoint() // read E+1 times: E epoch aggregates + scoring
      val labeled = docsF.filter(col("source") =!= "src0")
        .withColumn("y", when(length(col("source")) === 4, 1L).otherwise(-1L))
      def margin(wv: Array[Long]): Column =
        (0 to D).map(j => element_at(col("fv"), j + 1) * lit(wv(j)))
          .reduce(_ + _)
      var w = Array.fill(D + 1)(0L)
      for (_ <- 1 to QcE) {
        // y·margin <= 0 includes 0: with w=0 every labeled doc updates in
        // epoch 1 (the standard perceptron zero-margin rule)
        val aggs = (0 to D).map(j =>
          sum(col("y") * element_at(col("fv"), j + 1)).as(s"u$j"))
        val row = labeled.filter(col("y") * margin(w) <= lit(0L))
          .agg(aggs.head, aggs.tail: _*).collect()(0)
        w = w.zipWithIndex.map { case (wi, j) =>
          wi + (if (row.isNullAt(j)) 0L else row.getLong(j)) }
      }
      docsF.select(col("doc_id"),
          when(col("source") === "src0", 0L)
            .when(length(col("source")) === 4, 1L).otherwise(-1L).as("y"),
          margin(w).as("score"),
          (margin(w) > 0).as("flag_quality"))
        .orderBy("doc_id")
    },
    Some {
      val D = QcD
      val epochs = (1 to QcE).map { e =>
        s"""m$e AS (SELECT fe.doc_id, max(lab.y) AS y, CAST(sum(fe.c * w.wj) AS BIGINT) AS m
           |  FROM fe JOIN w${e - 1} w USING (j) JOIN lab USING (doc_id) GROUP BY fe.doc_id),
           |u$e AS (SELECT fe.j, CAST(sum(m.y * fe.c) AS BIGINT) AS dw
           |  FROM fe JOIN m$e m USING (doc_id) WHERE m.y * m.m <= 0 GROUP BY fe.j),
           |w$e AS (SELECT w.j, w.wj + coalesce(u.dw, CAST(0 AS BIGINT)) AS wj
           |  FROM w${e - 1} w LEFT JOIN u$e u USING (j))""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT doc_id, source,
         |    list_filter(string_split(text,' '), w -> len(w) > 0) AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |hs AS (SELECT doc_id, source,
         |    list_transform(toks, w ->
         |      list_sum(list_transform(range(1, len(w)+1), i -> i * ascii(w[i]))) % $D) AS hh
         |  FROM d),
         |f AS (SELECT doc_id, source,
         |    list_append(list_transform(range(0, $D),
         |      j -> CAST(len(list_filter(hh, x -> x = j)) AS BIGINT)),
         |      CAST(1 AS BIGINT)) AS fv
         |  FROM hs),
         |fe AS (SELECT doc_id, i AS j, fv[i] AS c
         |  FROM f, LATERAL (SELECT unnest(range(1, $D+2)) AS i) u),
         |lab AS (SELECT doc_id,
         |    CAST(CASE WHEN length(source) = 4 THEN 1 ELSE -1 END AS BIGINT) AS y
         |  FROM f WHERE source <> 'src0'),
         |w0 AS (SELECT unnest(range(1, $D+2)) AS j, CAST(0 AS BIGINT) AS wj),
         |$epochs,
         |sc AS (SELECT fe.doc_id, CAST(sum(fe.c * w.wj) AS BIGINT) AS score
         |  FROM fe JOIN w$QcE w USING (j) GROUP BY 1)
         |SELECT f.doc_id,
         |  CAST(coalesce(lab.y, 0) AS BIGINT) AS y,
         |  sc.score, sc.score > 0 AS flag_quality
         |FROM f JOIN sc ON f.doc_id = sc.doc_id LEFT JOIN lab ON f.doc_id = lab.doc_id
         |ORDER BY f.doc_id""".stripMargin
    })

  // -------- i41: substring-level exact dedup -------------------------------

  /** The synthetic corpus has no natural long repeats, so (the i30/i37
    * planting convention) a 12-token sentinel passage is inserted after
    * token 5 of every doc_id % 7 == 0 document, with the SAME construction
    * in the oracle. Sentinel words appear nowhere else in the corpus, so
    * the spec can assert they are all removed; natural 8-gram repeats the
    * small fixture vocabulary produces are ALSO legitimately removed (both
    * engines agree by construction).
    */
  private val PlantToks: Seq[String] =
    "abcdefghijkl".map(c => s"dupseg$c$c")
  private val plantSql = PlantToks.map(w => s"'$w'").mkString("[", ",", "]")

  /** i41: substring-level (k-token span) exact dedup — the finest of the
    * dedup granularities (document b10, near i5/i10/i11, semantic i35,
    * line i37, incremental i25): remove every token covered by some
    * k-token span that occurs verbatim in ≥ 2 distinct documents. This is
    * the exact-substring dedup of the standard LLM prep stack (train-set
    * memorization removal) expressed relationally: spans are the k = 8
    * rolling windows over the token stream; a span's corpus frequency
    * decides duplication; covered token positions are the union of
    * duplicated-span extents; output = per-doc token/coverage counts plus
    * the kept text with covered tokens excised, order preserved.
    *
    * Shape at scale: the span explode is map-side (k·n_tokens rows of
    * (id, pos, span)); span frequency is ONE shuffle keyed by the span —
    * at 100 TB the key would be xxhash64(span) so 8-byte hashes shuffle,
    * not text (the string key here keeps the oracle engine-portable), and
    * k would be ~50 tokens. The coverage join is an equi-join on the same
    * key (no broadcast assumed: the duplicated-span set is corpus-sized in
    * the worst case, and AQE downgrades to broadcast when it is small, as
    * on this fixture). Position expansion is ×k map-side; the only
    * text-carrying shuffle is the per-doc reassembly groupBy, keyed
    * doc_id — parallel across documents, same as i37.
    */
  /** The i41 core, reusable by the prep CLI (`--scrub substring`): input
    * is (doc_id, toks: array<string>); output one row per doc with
    * (n_tokens, n_dup_tokens, text_kept). See i41's Scaladoc for the
    * shape-at-scale argument.
    */
  private[graft] def substringScrub(docsToks: DataFrame, k: Int,
      minDocs: Int): DataFrame = {
    // both the span pipeline and the token pipeline read this frame —
    // without the checkpoint the upstream map (tokenize+plant for i41,
    // the whole prep chain for the CLI) runs twice (the i37 shared-base
    // convention)
    val docs = docsToks.localCheckpoint()
    // CASE guard: sequence(1, n) runs DESCENDING for n < 1 (the b6/i37
    // sequence trap) — short docs must yield zero spans, not garbage
    val spans = docs
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(toks) >= $k
           |  THEN transform(sequence(1, size(toks) - ${k - 1}),
           |    i -> struct(i - 1 AS p0, array_join(slice(toks, i, $k), ' ') AS span))
           |  ELSE CAST(array() AS array<struct<p0:int,span:string>>) END""".stripMargin))
        .as("sp"))
      .select(col("doc_id"), col("sp.p0").as("p0"), col("sp.span").as("span"))
      .localCheckpoint() // read twice: frequency agg + probe side
    val dup = spans.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("span")
    val covered = spans.join(dup, Seq("span"))
      .select(col("doc_id"),
        explode(expr(s"sequence(p0 + 1, p0 + $k)")).as("pos"))
      .distinct()
      .withColumn("cov", lit(true))
    docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0t", "tok")))
      .select(col("doc_id"), (col("p0t") + 1).as("pos"), col("tok"))
      .join(covered, Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cov"), 1L).otherwise(0L)).as("n_dup_tokens"),
        array_join(transform(array_sort(collect_list(
          when(col("cov").isNull, struct(col("pos"), col("tok"))))),
          p => p.getField("tok")), " ").as("text_kept"))
  }

  val i41_dedup_substring = OpQuery(
    (s, d) => {
      val planted = t(s, d, "documents")
        .where(col("text").isNotNull) // the i37/i38 NULL-text guard
        .withColumn("toks0", split(col("text"), " "))
        .withColumn("toks", when(col("doc_id") % 7 === 0,
          concat(slice(col("toks0"), 1, 5),
            array(PlantToks.map(lit): _*),
            expr("slice(toks0, 6, greatest(size(toks0) - 5, 0))")))
          .otherwise(col("toks0")))
        .select("doc_id", "toks")
      substringScrub(planted, k = 8, minDocs = 2).orderBy("doc_id")
    },
    Some(s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS toks0 FROM documents
      |         WHERE text IS NOT NULL),
      |d AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |        THEN toks0[1:5] || $plantSql || toks0[6:]
      |        ELSE toks0 END AS toks FROM d0),
      |sp AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
      |         i -> {'p0': i - 1, 'span': array_to_string(toks[i:i+7], ' ')}),
      |         recursive := true) FROM d),
      |dup AS (SELECT span FROM sp GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT doc_id, pos FROM (
      |         SELECT s.doc_id, unnest(range(s.p0 + 1, s.p0 + 9)) AS pos
      |         FROM sp s JOIN dup USING (span))),
      |tk AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
      |         i -> {'pos': i, 'tok': toks[i]}), recursive := true) FROM d)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(*) FILTER (WHERE c.pos IS NOT NULL) AS BIGINT) AS n_dup_tokens,
      |  coalesce(array_to_string(list(t.tok ORDER BY t.pos)
      |    FILTER (WHERE c.pos IS NULL), ' '), '') AS text_kept
      |FROM tk t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin))

  // -------- i43: URL host extraction + per-domain stats --------------------

  /** i43: domain-level corpus statistics — extract the host from each
    * document's URL and aggregate per domain (doc count, bytes, language
    * spread): the step behind domain blocklists, per-site caps and
    * domain-aware mixture weighting in web-corpus pipelines (a C4/CCNet
    * staple). The synthetic corpus has no URL column, so one is planted
    * from doc_id (the i30/i37/i41 convention — same construction in the
    * oracle); the operator under test is the regex host extraction +
    * domain aggregate. The regex stays in the Java-regex ∩ RE2 subset
    * (character class + quantifier, no backrefs/lookaround), the i30
    * portability rule.
    *
    * Shape at scale: extraction is a narrow codegen'd map; the aggregate
    * is ONE shuffle keyed by host with map-side partials, output is
    * domain-cardinality-sized (≪ corpus). A per-site cap would compose as
    * a host-partitioned window over the same key, parallel across
    * domains.
    */
  /** The planted URL + extracted host columns shared by i43/i44 (same
    * construction in both oracles).
    */
  private[graft] def withHost(docs: DataFrame): DataFrame = docs
    .withColumn("url", concat(lit("https://host"),
      (col("doc_id") % 20).cast(StringType),
      lit(".example.com/p/"), (col("doc_id") % 7).cast(StringType)))
    .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))

  // single-line ON PURPOSE: interpolated inside stripMargin oracles, where
  // a continuation line starting with '||' would lose its first '|'
  private[graft] val hostSql = "regexp_extract('https://host' || (doc_id % 20) || " +
    "'.example.com/p/' || (doc_id % 7), 'https://([^/]+)/', 1)"

  val i43_url_host_stats = OpQuery(
    (s, d) => withHost(t(s, d, "documents"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("host"),
    Some(s"""SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM (SELECT $hostSql AS host, lang, n_chars FROM documents)
      |GROUP BY host ORDER BY host""".stripMargin))

  /** i44: per-domain cap — the POLICY step i43's stats inform: keep at
    * most K = 20 documents per host, chosen by a deterministic
    * multiplicative-hash order (a stable pseudo-random per-site sample:
    * re-runs and engine changes keep the same docs, and adding documents
    * to OTHER hosts never changes a host's selection — the i20/i26
    * stability argument). C4-style site capping keeps one domain from
    * dominating the mixture. doc_id·2971215073 < 2⁵² for ids ≤ ~10⁶
    * (the i26 exactness bound; pre-fold beyond).
    *
    * Shape at scale: one window per host — millions of small partitions,
    * the parallel-friendly shape (i40's argument); no global order
    * anywhere. Output one verdict row per doc.
    */
  val i44_domain_cap = OpQuery(
    (s, d) => {
      val hkey = (col("doc_id") * 2971215073L) % 1000000007L
      withHost(t(s, d, "documents"))
        .select(col("doc_id"), col("host"), hkey.as("hkey"))
        .withColumn("rk", row_number()
          .over(Window.partitionBy("host").orderBy("hkey", "doc_id"))
          .cast(LongType))
        .withColumn("kept", col("rk") <= 20)
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id, host, hkey, CAST(rk AS BIGINT) AS rk, rk <= 20 AS kept
      |FROM (SELECT doc_id, host, hkey,
      |        row_number() OVER (PARTITION BY host ORDER BY hkey, doc_id) AS rk
      |      FROM (SELECT doc_id, $hostSql AS host,
      |              (doc_id * 2971215073) % 1000000007 AS hkey
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin))

  // -------- i34: k-means (Lloyd) over embeddings ---------------------------

  /** i34: two Lloyd iterations of k-means (k = 4) over the embedding table
    * — the semantic-clustering primitive behind cluster-then-dedup and
    * per-cluster mixture balancing. Deterministic and EXACT across
    * engines: coordinates are quantized to an integer grid
    * (floor(x·1000), exact on IEEE doubles widened from float32), so
    * distances, argmin ties (broken by centroid id), and the element-wise
    * integer-mean update (sum DIV count — both engines truncate toward
    * zero) involve no floating-point at all.
    *
    * Shape at scale: k centroids are BROADCAST against the point set
    * (N·k rows, map-side); assignment argmin is min(struct(dist, cid))
    * inside a hash aggregate keyed by point; the centroid update is the
    * i8 posexplode re-agg pattern (the only shuffles, keyed (cid, pos) —
    * 64·k cells regardless of N). Iteration count is fixed (2), not
    * data-dependent — the driver never sees per-iteration results.
    */
  /** Integer-grid quantized embeddings: (vec_id, qv: array<bigint>). */
  private def quantizedEmb(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))").as("qv"))

  /** Nearest-centroid assignment: broadcast the k centroids (cid, cv),
    * integer L2², argmin with ties broken by centroid id.
    */
  private[graft] def lloydAssign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("cid"),
        graft.functions.VectorFunctions.sqDistLong(col("qv"), col("cv"))
          .as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"), first(col("qv")).as("qv"))
      .select(col("vec_id"), col("qv"), col("m.cid").as("cid"))

  /** Element-wise integer-mean centroid update from an assignment frame
    * (vec_id, qv, cid): the i8 posexplode re-agg pattern, keyed
    * (cid, pos) — 64·k cells shuffled regardless of N.
    */
  private[graft] def lloydMeanPos(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(expr("sum(v) DIV count(*)").as("cv_i"))

  /** (cid, pos, cv_i) rows collected back to (cid, cv: array). */
  private[graft] def lloydCollect(meanPos: DataFrame): DataFrame =
    meanPos.groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv_i))), p -> p.cv_i)").as("cv"))

  /** One Lloyd update from the deterministic seed (points vec_id < 4):
    * the centroid table both i34 and i35 assign against.
    */
  private def lloydCentroids(q: DataFrame): DataFrame = {
    val c0 = q.where(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    lloydCollect(lloydMeanPos(lloydAssign(q, c0)))
  }

  /** The full two-iteration Lloyd model over an ARBITRARY embedding
    * frame (vec_id, embedding) — the learned coarse quantizer behind
    * i67's k-means IVF cells and PrepMain's `--ann` artifact (r10
    * verdict #1: the index family's cells were the fixture's arbitrary
    * `label`; i65 certified the cost at recall@10 = 0.2–0.5, and THIS
    * is the missing piece — same Lloyd engine as i34, k-parametrized,
    * seeded deterministically). Seeds are the k HASH-smallest vec_ids
    * (the i51 multiplier — scattered over the id space, so adjacent
    * ids from one document can't all seed one region; `vec_id < k`
    * would also bake in an id-density assumption an arbitrary corpus
    * violates). Returns (cells: vec_id → cid, centPos: cid, pos, cv_i)
    * where centPos is EXACTLY the centroid table the final assignment
    * ran against — a reader ranking cells against it sees the same
    * geometry the partitioner used. Both frames involve no floating
    * point (the ×1000 integer grid), so the model is bit-reproducible
    * in any engine — the property the i67 oracle gates.
    *
    * Shape at scale: seeds = TakeOrdered k over a narrow map; each
    * Lloyd pass is a broadcast of k centroids (k·64 longs) against the
    * point set with a map-side argmin — no N-sized shuffle anywhere;
    * the mean update shuffles 64·k cells. Iterations fixed at 2 (the
    * i34 convention; the driver never sees per-iteration state).
    */
  private[graft] def lloydModel(emb: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val q = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))").as("qv"))
    val c0 = q
      .withColumn("skey", pmod(col("vec_id") * lit(741103597L), lit(1000000007L)))
      .orderBy("skey", "vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    val m1 = lloydMeanPos(lloydAssign(q, c0))
    val cells = lloydAssign(q, lloydCollect(m1)).select("vec_id", "cid")
    (cells, m1)
  }

  /** The shared i34/i35 oracle prefix: quantize → seed → assign → update →
    * re-assign; exposes q, c1(cid, cv) and a2(vec_id, qv, cid, rn) with
    * rn = 1 marking the final assignment row.
    */
  private val lloydSqlCte: String =
    """WITH q AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 4),
      |a1 AS (
      |  SELECT vec_id, qv, cid,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM (
      |    SELECT q.vec_id, q.qv, c0.cid,
      |           list_sum(list_transform(range(1, len(q.qv) + 1),
      |             i -> (q.qv[i] - c0.cv[i]) * (q.qv[i] - c0.cv[i]))) AS dist
      |    FROM q CROSS JOIN c0)),
      |m1 AS (
      |  -- per-row positions (unnest of a struct list), NOT range(1, 65):
      |  -- the Spark side (posexplode over qv) is dimension-agnostic, so the
      |  -- oracle must be too — a hardcoded dim would silently truncate or
      |  -- NULL-pad centroids on a different-width fixture
      |  SELECT cid, pos, CAST(sum(v) AS BIGINT) // count(*) AS v
      |  FROM (SELECT cid, unnest(list_transform(range(1, len(qv) + 1),
      |          i -> {'pos': i, 'v': qv[i]}), recursive := true)
      |        FROM a1 WHERE rn = 1)
      |  GROUP BY cid, pos),
      |c1 AS (SELECT cid, list(v ORDER BY pos) AS cv FROM m1 GROUP BY cid),
      |a2 AS (
      |  SELECT vec_id, qv, cid,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM (
      |    SELECT q.vec_id, q.qv, c1.cid,
      |           list_sum(list_transform(range(1, len(q.qv) + 1),
      |             i -> (q.qv[i] - c1.cv[i]) * (q.qv[i] - c1.cv[i]))) AS dist
      |    FROM q CROSS JOIN c1))""".stripMargin

  val i34_kmeans_lloyd = OpQuery(
    (s, d) => {
      val q = quantizedEmb(s, d)
      val c1 = lloydCentroids(q)
      lloydAssign(q, c1)
        .join(broadcast(c1), "cid")
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_points"),
          sum(expr("aggregate(transform(qv, x -> x * x), 0L, (a, v) -> a + v)")).as("sum_norm"),
          min(expr("aggregate(transform(cv, x -> x * x), 0L, (a, v) -> a + v)")).as("centroid_ssq"))
        .select(col("cid").as("cluster_id"), col("n_points"), col("sum_norm"),
          col("centroid_ssq"))
        .orderBy("cluster_id")
    },
    Some(lloydSqlCte + "\n" + """SELECT a2.cid AS cluster_id,
      |       count(*) AS n_points,
      |       CAST(sum(list_sum(list_transform(qv, x -> x * x))) AS BIGINT) AS sum_norm,
      |       CAST(min(list_sum(list_transform(c1.cv, x -> x * x))) AS BIGINT) AS centroid_ssq
      |FROM a2 JOIN c1 ON a2.cid = c1.cid
      |WHERE rn = 1
      |GROUP BY a2.cid
      |ORDER BY cluster_id""".stripMargin))

  // -------- i35: semantic dedup (cluster-then-pair) ------------------------

  /** i35: SemDeDup-style semantic dedup — candidate pairs are generated
    * ONLY within a k-means cluster, then kept if the exact integer L2²
    * distance is under threshold. This is the scale story for embedding
    * dedup: clustering prunes the O(n²) pair space to Σ|cluster|², and the
    * pair join is an equi-join on the cluster id (one shuffle keyed cid —
    * at 100 TB the cluster id is the partition key and each cluster's
    * pairs are generated locally; cluster size is bounded by increasing k,
    * which this fixed-k fixture stands in for).
    *
    * The threshold (1 150 000 on the ×1000 integer grid ≈ raw L2 1.07)
    * sits in the low tail of the corpus distance distribution so the
    * result is non-empty but small at every SF (15/15/152 pairs) — the
    * corpus plants no true embedding duplicates.
    *
    * The assignment is localCheckpoint'ed before the self-join — without
    * it each join side re-evaluates the whole Lloyd subtree (measured 2×
    * ≈ 2 s at sf0.1); the materialized set is (id, 64 longs, cid) rows,
    * tiny relative to the pair stage it feeds. The pair distance is the
    * compiled SqDistLong kernel, not a zip_with/aggregate lambda chain —
    * the Σ|cluster|² inner loop is where this query lives or dies.
    */
  val i35_semdedup = OpQuery(
    (s, d) => {
      val q = quantizedEmb(s, d)
      val a2 = lloydAssign(q, lloydCentroids(q)).localCheckpoint()
      val left = a2.select(col("cid"), col("vec_id").as("id_a"), col("qv").as("qa"))
      val right = a2.select(col("cid"), col("vec_id").as("id_b"), col("qv").as("qb"))
      left.join(right, Seq("cid"))
        .where(col("id_a") < col("id_b"))
        .select(col("cid").as("cluster_id"), col("id_a"), col("id_b"),
          graft.functions.VectorFunctions.sqDistLong(col("qa"), col("qb")).as("qdist"))
        .where(col("qdist") <= 1150000L)
        .orderBy("id_a", "id_b")
    },
    Some(lloydSqlCte + "\n" + """SELECT * FROM (
      |  SELECT a.cid AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
      |         CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
      |           i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT) AS qdist
      |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  WHERE a.rn = 1 AND b.rn = 1)
      |WHERE qdist <= 1150000
      |ORDER BY id_a, id_b""".stripMargin))

  /** i53: token-length histogram — the corpus-card staple: how are
    * documents distributed over length, and what fraction of the TOKEN
    * budget does each length band carry (the two curves every dataset
    * paper publishes; the second drives packing/curriculum decisions
    * because a few long docs can hold most of the tokens). Fixed-width
    * 16-token buckets with a top catch-all (bucket 31 = 496+), entirely
    * integer-exact; production code would make the boundaries config —
    * the bucketing ARITHMETIC, not the edges, is the operator.
    *
    * Shape at scale: one narrow token-count map, one bucket-keyed
    * aggregate (map-side partial, ≤ 32 groups), then cumulative/share
    * windows over the 32-ROW AGGREGATE — the i33 precedent: global-frame
    * windows are fine when the frame is bucket-sized, not corpus-sized.
    */
  val i53_token_histogram = OpQuery(
    (s, d) => {
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "documents")
        .where(col("text").isNotNull)
        .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .withColumn("bucket", least(expr("n_tok DIV 16"), lit(31L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("cum_docs", sum(col("n_docs")).over(w))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("doc_share",
          round(col("n_docs").cast(DoubleType) / sum(col("n_docs")).over(wAll), 6))
        .withColumn("token_share",
          round(col("n_tokens").cast(DoubleType) / sum(col("n_tokens")).over(wAll), 6))
        .orderBy("bucket")
    },
    Some("""WITH tk AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents WHERE text IS NOT NULL),
      |h AS (SELECT least(n_tok // 16, 31) AS bucket,
      |        CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |      FROM tk GROUP BY 1)
      |SELECT bucket, n_docs, n_tokens,
      |  CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
      |  CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
      |  round(CAST(n_docs AS DOUBLE) / (sum(n_docs) OVER ()), 6) AS doc_share,
      |  round(CAST(n_tokens AS DOUBLE) / (sum(n_tokens) OVER ()), 6) AS token_share
      |FROM h ORDER BY bucket""".stripMargin))

  // -------- i58: overlapping-window chunking (RAG/context prep) ------------

  /** i58 window geometry: W-token chunks every S tokens (W−S overlap) —
    * the retrieval-corpus chunking defaults in miniature; production
    * values (512/384 etc.) change only these constants. Shared with the
    * spec, which derives its coverage/overlap assertions from them.
    */
  private[graft] val ChunkW = 32
  private[graft] val ChunkS = 24

  /** i58: overlapping sliding-window chunking — the retrieval/context
    * preparation step between cleaning and embedding: split every
    * document into W-token chunks at stride S, so consecutive chunks
    * share W−S tokens of context (the overlap that keeps a fact landing
    * on a chunk boundary retrievable from at least one side). Chunk count
    * is the exact integer form c = 1 + ⌈(n−W)/S⌉ for n > W else 1, so
    * every token position is covered and the last chunk is the only
    * short one. Chunk identity is the PURE FUNCTION (doc_id, chunk_id) —
    * re-runs, engine changes and corpus appends never renumber an
    * existing chunk (the i20/i44 stability argument, which is what makes
    * chunk ids usable as stable vector-store keys).
    *
    * Shape at scale: tokenize + window arithmetic + posexplode are all
    * map-side (one narrow codegen'd stage, no shuffle anywhere but the
    * dump sort); output rows ≈ n_tokens/S per doc, emitted streaming —
    * nothing document- or corpus-sized materializes. The oracle replays
    * the same integer geometry via list slices.
    */
  /** The i58 core over an arbitrary (doc_id, text, …) frame — one narrow
    * stage, shared verbatim by the batch gate and j16's streaming form
    * (the j11 shared-lineage convention: batch and stream chunk
    * geometry cannot drift).
    */
  private[graft] def chunksOf(docs: DataFrame): DataFrame = {
    val (w, st) = (ChunkW, ChunkS)
    docs
      .where(col("text").isNotNull) // the i37/i38 NULL-text guard
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("nc", expr(
        s"CASE WHEN size(toks) <= $w THEN 1 ELSE 1 + (size(toks) - $w + ${st - 1}) DIV $st END"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tok"),
        posexplode(expr(
          s"transform(sequence(0, nc - 1), i -> slice(toks, i * $st + 1, $w))"))
          .as(Seq("chunk_id", "ctoks")))
      .select(col("doc_id"), col("n_tok"),
        col("chunk_id").cast(LongType).as("chunk_id"),
        (col("chunk_id") * st + 1).cast(LongType).as("start_tok"),
        size(col("ctoks")).cast(LongType).as("n_chunk_toks"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** i58's oracle — shared verbatim with j16 (same geometry, same dump). */
  private[graft] val chunkSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |         WHERE text IS NOT NULL),
      |dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
      |        CASE WHEN len(toks) <= $ChunkW THEN 1
      |             ELSE 1 + (len(toks) - $ChunkW + ${ChunkS - 1}) // $ChunkS END AS nc
      |      FROM d),
      |ch AS (SELECT doc_id, n AS n_tok, unnest(list_transform(range(0, nc),
      |        i -> {'chunk_id': i, 'ctoks': toks[i*$ChunkS+1 : i*$ChunkS+$ChunkW]}),
      |        recursive := true) FROM dd)
      |SELECT doc_id, n_tok, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(chunk_id * $ChunkS + 1 AS BIGINT) AS start_tok,
      |  CAST(len(ctoks) AS BIGINT) AS n_chunk_toks,
      |  array_to_string(ctoks, ' ') AS chunk_text
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  val i58_chunk_overlap = OpQuery(
    (s, d) => chunksOf(t(s, d, "documents")).orderBy("doc_id", "chunk_id"),
    Some(chunkSql))

  val all: Map[String, OpQuery] = Map(
    "i58_chunk_overlap" -> i58_chunk_overlap,
    "i30_pii_redact" -> i30_pii_redact,
    "i53_token_histogram" -> i53_token_histogram,
    "i31_tfidf_topterms" -> i31_tfidf_topterms,
    "i32_bigram_lm" -> i32_bigram_lm,
    "i33_vocab_df" -> i33_vocab_df,
    "i34_kmeans_lloyd" -> i34_kmeans_lloyd,
    "i35_semdedup" -> i35_semdedup,
    "i36_collocation_lift" -> i36_collocation_lift,
    "i37_dedup_lines" -> i37_dedup_lines,
    "i38_doc_logprob" -> i38_doc_logprob,
    "i49_perplexity_buckets" -> i49_perplexity_buckets,
    "i55_curriculum_order" -> i55_curriculum_order,
    "i41_dedup_substring" -> i41_dedup_substring,
    "i42_vocab_encode" -> i42_vocab_encode,
    "i43_url_host_stats" -> i43_url_host_stats,
    "i44_domain_cap" -> i44_domain_cap,
    "i46_bpe_encode" -> i46_bpe_encode,
    "i60_bpe_bytes" -> i60_bpe_bytes,
    "i47_quality_classifier" -> i47_quality_classifier)
}
