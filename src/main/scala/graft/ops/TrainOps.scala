package graft.ops

import graft.{OpQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data assembly operators (builder-prompt north star): the steps
  * between a cleaned corpus and a training run — reproducible splits,
  * output sharding, sequence packing. The common design rule: NOTHING is
  * random at run time. Every assignment is a pure function of stable ids,
  * so a re-run (or another engine — the DuckDB oracle proves it) produces
  * the identical dataset, job retries can't fork history, and adding data
  * doesn't reshuffle earlier assignments.
  */
object TrainOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Knuth-style multiplicative hash bucket in [0, 1000). doc_id stays
    * ≤ ~10⁶ so the product is < 2⁵² — exact in Spark's ANSI bigint AND in
    * every engine's double-free integer path (the parity trap that rules
    * out xxhash/rand here).
    */
  private val bucket: org.apache.spark.sql.Column =
    (col("doc_id") * 2654435761L) % 1000

  /** i20: deterministic train/val/test split (80/10/10) — the hash-bucket
    * split is per-document stable: adding or removing other documents
    * never moves an existing one between splits (sampling by rand() or by
    * row position does, silently leaking val into train across dataset
    * versions). Pure narrow map: no shuffle at any scale.
    */
  val i20_train_split = OpQuery(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"),
        when(bucket < 800, "train").when(bucket < 900, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id"),
    """SELECT doc_id, lang, (doc_id * 2654435761) % 1000 AS bucket,
      |  CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
      |       WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** i21: deterministic output sharding — shard = hash(doc_id) % 64 plus a
    * dense within-shard ordinal. This is the "write the corpus as N
    * stable training shards" step: the shard column is the partition key
    * of the final write (64 here; thousands at 100 TB), and the ordinal
    * gives every document a reproducible (shard, pos) address. One
    * shuffle on the shard key; the window partitions by shard so there is
    * no global-order bottleneck.
    */
  val i21_shard_assign = OpQuery(
    (s, d) => {
      val shard = ((col("doc_id") * 40503L) % 64).cast(IntegerType)
      t(s, d, "documents")
        .select(col("doc_id"), shard.as("shard"))
        .withColumn("pos", row_number()
          .over(Window.partitionBy("shard").orderBy("doc_id")).cast(LongType))
        .orderBy("doc_id")
    },
    """SELECT doc_id, CAST((doc_id * 40503) % 64 AS INTEGER) AS shard,
      |  CAST(row_number() OVER (PARTITION BY (doc_id * 40503) % 64
      |    ORDER BY doc_id) AS BIGINT) AS pos
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** i22: sequence packing — concatenate documents (in stable doc_id
    * order, per (lang, source) stream) and cut the token stream every 512
    * whitespace tokens: the standard concat-and-chunk pretraining packing,
    * where a document may straddle a cut. Running-cumsum formulation:
    * seq_bin = (tokens-before-it) DIV 512 is the sequence holding the
    * document's first token, seq_offset its position there. One window
    * per (lang, source) stream key keeps the windows parallel at scale —
    * packing one global stream would serialize, and nothing in training
    * needs cross-stream order.
    */
  val i22_seq_pack = OpQuery(
    (s, d) => {
      val toksN = size(split(col("text"), " ")).cast(LongType)
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"), toksN.as("n_tok"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tok")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
          // DIV, not '/': long / long is DOUBLE in Spark SQL
          expr("CAST(cum_before DIV 512 AS BIGINT)").as("seq_bin"),
          (col("cum_before") % 512).as("seq_offset"))
        .orderBy("doc_id")
    },
    """SELECT doc_id, lang, source,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
      |  CAST(cum_before // 512 AS BIGINT) AS seq_bin,
      |  CAST(cum_before % 512 AS BIGINT) AS seq_offset
      |FROM (
      |  SELECT doc_id, lang, source, text,
      |    -- windowed sum(BIGINT) widens to HUGEINT/decimal in DuckDB
      |    coalesce(CAST(sum(CAST(len(string_split(text,' ')) AS BIGINT)) OVER (
      |      PARTITION BY lang, source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin)

  /** i26: stratified sampling — a fixed-size (k = 50) per-stratum sample,
    * deterministic like everything else here: rank within each lang
    * stratum by a multiplicative hash of doc_id (a different odd
    * multiplier than i20's, so the sample is independent of the train
    * split) and keep the k smallest. doc_id · 1099087573 stays < 2⁵² for
    * ids up to ~4×10⁶ — beyond that, pre-fold the id (as b10's 128-bit
    * note). Per-stratum windows parallelize across strata; in the
    * few-huge-strata regime the same hash key degrades gracefully to a
    * threshold filter (keep skey < k/n · M: constant memory, no window,
    * k hit only in expectation) — the exact-k window form is the gate
    * semantics.
    */
  val i26_sample_stratified = OpQuery(
    (s, d) => {
      val key = (col("doc_id") * 1099087573L) % 1000000007L
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), key.as("skey"))
        .withColumn("rk", row_number()
          .over(Window.partitionBy("lang").orderBy("skey", "doc_id"))
          .cast(LongType)) // rank is int32 in Spark, BIGINT in DuckDB
        .filter(col("rk") <= 50)
        .orderBy("lang", "rk")
    },
    """SELECT doc_id, lang, skey, CAST(rk AS BIGINT) AS rk
      |FROM (SELECT doc_id, lang, (doc_id * 1099087573) % 1000000007 AS skey,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY (doc_id * 1099087573) % 1000000007, doc_id) AS rk
      |      FROM documents)
      |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin)

  /** i48: mixture resampler — APPLIES the domain weights i28 computes
    * (i28 stops at the weight table; real pipelines then have to
    * materialize the resampled corpus). Semantics, all in EXACT integer
    * arithmetic so both engines agree bit-for-bit (the i34 convention —
    * no floored double ever decides membership):
    *
    *   share   = total DIV n_langs        (the equal-share target)
    *   over-represented lang (n_docs ≥ share): keep the `share` docs
    *     with the smallest sampling hash (i26's machinery, an
    *     independent multiplier), n_copies = 1;
    *   under-represented: keep ALL docs; base = min(3, share DIV
    *     n_docs) copies each, and the first share MOD n_docs docs by
    *     hash rank carry one extra copy, so the lang's effective count
    *     lands EXACTLY on its target.
    *
    * Invariant (the gate-checkable form of "matches the i28 targets"):
    * every lang contributes exactly least(share, 3·n_docs) effective
    * docs — which is i28's n_docs·min(3, share/n_docs) target with the
    * fractional part resolved by integer remainder instead of a float
    * round. The 3× upsampling cap is i28's weight cap.
    *
    * Scale: one lang-keyed aggregate (vocabulary-sized, broadcast
    * back), one per-stratum window (i26's shape — parallel across
    * strata), no shuffle of document bodies beyond the window's
    * lang-keyed exchange. At 100 TB the window degrades gracefully to
    * the hash-threshold filter documented on i26 (keep skey below a
    * per-lang cutoff: constant memory, no window, exact-k only in
    * expectation) — the exact-k window form is the gate semantics.
    * doc_id · 2147483629 stays < 2⁵² for ids to ~10⁶ (b10's 128-bit
    * note applies beyond); the multiplier is distinct from i20's and
    * i26's so mixture membership is independent of both the train
    * split and the stratified sample.
    */
  /** The i48 core over an arbitrary (doc_id, lang, …) frame — shared by
    * the gated operator and PrepMain's `--mix uniform` stage (the
    * containmentFlags convention: the CLI composes the same lineage the
    * gate proves).
    *
    * CONTRACT: `lang` must be non-null — every step (groupBy, window
    * partition, equi-join) treats lang as a key, and NULL never
    * equi-joins, so NULL-lang rows would silently drop while still
    * inflating `total`. The fixture guarantees it for the gated op;
    * PrepMain coalesces NULL to a sentinel stratum before calling.
    */
  private[graft] def mixApply(docs: DataFrame): DataFrame = {
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val totals = docs.agg(count(lit(1)).as("total"),
      countDistinct(col("lang")).as("n_langs"))
    val tgt = byLang.crossJoin(broadcast(totals))
      .withColumn("share", expr("total DIV n_langs"))
      .withColumn("n_keep", least(col("n_docs"), col("share")))
      .withColumn("base", when(col("n_docs") >= col("share"), lit(1L))
        .otherwise(least(lit(3L), expr("share DIV n_docs"))))
      .withColumn("rem", when(col("n_docs") >= col("share"), lit(0L))
        .when(expr("share DIV n_docs") >= 3, lit(0L))
        .otherwise(col("share") % col("n_docs")))
      .select("lang", "n_keep", "base", "rem")
    val skey = (col("doc_id") * 2147483629L) % 1000000007L
    docs.select(col("doc_id"), col("lang"), skey.as("skey"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy("lang").orderBy("skey", "doc_id"))
        .cast(LongType))
      .join(broadcast(tgt), "lang")
      .filter(col("rk") <= col("n_keep"))
      .select(col("doc_id"), col("lang"),
        (col("base") + when(col("rk") <= col("rem"), lit(1L))
          .otherwise(lit(0L))).as("n_copies"))
      .orderBy("doc_id")
  }

  val i48_mix_apply = OpQuery(
    (s, d) => mixApply(t(s, d, "documents")),
    """WITH byl AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |tot AS (SELECT count(*) AS total, count(DISTINCT lang) AS n_langs
      |        FROM documents),
      |tgt AS (SELECT lang,
      |         least(n_docs, total // n_langs) AS n_keep,
      |         CASE WHEN n_docs >= total // n_langs THEN 1
      |              WHEN (total // n_langs) // n_docs >= 3 THEN 3
      |              ELSE (total // n_langs) // n_docs END AS base,
      |         CASE WHEN n_docs >= total // n_langs THEN 0
      |              WHEN (total // n_langs) // n_docs >= 3 THEN 0
      |              ELSE (total // n_langs) % n_docs END AS rem
      |        FROM byl, tot),
      |r AS (SELECT doc_id, lang,
      |       row_number() OVER (PARTITION BY lang
      |         ORDER BY (doc_id * 2147483629) % 1000000007, doc_id) AS rk
      |      FROM documents)
      |SELECT r.doc_id, r.lang,
      |  CAST(t.base + CASE WHEN r.rk <= t.rem THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_copies
      |FROM r JOIN tgt t ON r.lang = t.lang
      |WHERE r.rk <= t.n_keep
      |ORDER BY r.doc_id""".stripMargin)

  /** i51: deterministic global shuffle — the "shuffle the corpus before
    * training" step every pretraining run needs: a total training order
    * that is (a) statistically shuffled — neighbors in doc_id space land
    * far apart, so a crawl's temporal/source locality doesn't become
    * batch correlation — and (b) a pure function of doc_id, so re-runs,
    * retries, and other engines (the oracle) produce the identical order
    * and a training job can be resumed mid-epoch by position. rand()
    * would satisfy (a) and silently break (b).
    *
    * skey = (doc_id · 741103597) % 1000000007 — a fresh odd multiplier
    * (independent of the i20 split, i26 sample, and i48 mixture hashes,
    * so shuffle position never correlates with any of those decisions),
    * product < 2⁵² for ids to ~6×10⁶ (b10's 128-bit note beyond).
    * train_pos = rank by (skey, doc_id) — the doc_id tiebreak makes the
    * order total even on hash collisions.
    *
    * Shape at scale: the global rank uses b8's two-pass shape —
    * repartitionByRange on (skey, doc_id) + per-partition prefix offsets
    * (Convert.addStablePkey) — so no row ever crosses a single
    * global-window task; the range exchange partitions the ORDER itself,
    * which is exactly how the shuffled corpus would be WRITTEN (shard k
    * = positions [k·n/P, (k+1)·n/P)): the training reader streams shards
    * in filename order and gets the global shuffle for free. Only
    * (doc_id, skey) rows move — never document bodies (they join back
    * by doc_id at write time, one equi-join).
    */
  /** The i51 core over an arbitrary (doc_id, …) frame — shared by the
    * gated operator and PrepMain's `--shuffle hash` stage (the
    * containmentFlags convention: the CLI composes the lineage the gate
    * proves). Returns (doc_id, skey, train_pos).
    */
  private[graft] def globalShuffleOrder(docs: DataFrame): DataFrame = {
    val skey = (col("doc_id") * 741103597L) % 1000000007L
    graft.ingest.Convert.addStablePkey(
      docs.select(col("doc_id"), skey.as("skey"))
        .repartitionByRange(col("skey"), col("doc_id"))
        .sortWithinPartitions(col("skey"), col("doc_id")),
      "train_pos")
  }

  val i51_global_shuffle = OpQuery(
    (s, d) => globalShuffleOrder(t(s, d, "documents")).orderBy("doc_id"),
    """SELECT doc_id, (doc_id * 741103597) % 1000000007 AS skey,
      |  CAST(row_number() OVER (
      |    ORDER BY (doc_id * 741103597) % 1000000007, doc_id) AS BIGINT)
      |    AS train_pos
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** i57: SFT conversation packing — the supervised-fine-tuning data-prep
    * shape: assemble raw documents into CONVERSATIONS with per-turn roles
    * and the loss-mask offset table the trainer consumes (assistant turns
    * contribute loss; user turns are context only). Conversations are
    * planted deterministically — conv = (source, doc_id DIV 80), turns in
    * doc_id order, roles alternating user/assistant by turn parity (the
    * i30/i37 planted-fixture convention) — and each turn row carries its
    * token extent [tok_start, tok_end) within the packed conversation via
    * a per-conversation running cumsum (i22's window shape: one window
    * per conversation key, parallel across conversations, no global
    * order). This is exactly the mask table an SFT pipeline materializes
    * next to the packed text.
    */
  val i57_sft_pack = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("source", "conv_no").orderBy("doc_id")
      t(s, d, "documents")
        .where(col("text").isNotNull) // the i37/i38 NULL-text guard
        .select(col("source"), col("doc_id"),
          expr("doc_id DIV 80").as("conv_no"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .withColumn("turn_no", row_number().over(w).cast(LongType))
        .withColumn("tok_start",
          coalesce(sum(col("n_tok")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("conv_no"), col("doc_id"), col("turn_no"),
          when(col("turn_no") % 2 === 1, "user").otherwise("assistant").as("role"),
          col("n_tok"), col("tok_start"),
          (col("tok_start") + col("n_tok")).as("tok_end"),
          (col("turn_no") % 2 === 0).as("in_loss"))
        .orderBy("doc_id")
    },
    """WITH t AS (SELECT source, doc_id, doc_id // 80 AS conv_no,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (SELECT source, conv_no, doc_id, n_tok,
      |    CAST(row_number() OVER (PARTITION BY source, conv_no
      |      ORDER BY doc_id) AS BIGINT) AS turn_no,
      |    coalesce(CAST(sum(n_tok) OVER (PARTITION BY source, conv_no
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |      AS tok_start
      |  FROM t)
      |SELECT source, CAST(conv_no AS BIGINT) AS conv_no, doc_id, turn_no,
      |  CASE WHEN turn_no % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
      |  n_tok, tok_start, tok_start + n_tok AS tok_end,
      |  turn_no % 2 = 0 AS in_loss
      |FROM w ORDER BY doc_id""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "i57_sft_pack" -> i57_sft_pack,
    "i20_train_split" -> i20_train_split,
    "i21_shard_assign" -> i21_shard_assign,
    "i22_seq_pack" -> i22_seq_pack,
    "i26_sample_stratified" -> i26_sample_stratified,
    "i48_mix_apply" -> i48_mix_apply,
    "i51_global_shuffle" -> i51_global_shuffle)
}
