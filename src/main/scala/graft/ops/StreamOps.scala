package graft.ops

import graft.{OpQuery, Par, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** SURVEY §2 group J — event-time operators with batch/stream parity.
  *
  * Design rule (SURVEY §3.2 E3): each operator is ONE transformation
  * function over a DataFrame, applied identically to `spark.read` (gated by
  * the DuckDB oracle here) and `spark.readStream` (j6 end-to-end harness +
  * StreamOpsSpec parity tests — the oracle cannot run a stream).
  *
  * Scale notes: tumbling/sliding aggregation states are bounded by
  * (windows × types); sessionization shuffles once on user_id; watermarking
  * (j4's batch surrogate computes max(ts) globally — in streaming the
  * watermark tracker does this incrementally, no global agg materializes).
  */
object StreamOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Scale-adaptive shuffle sizing for the streaming harnesses (opt guide
    * §2: derive partitioning from the data, not from a constant tuned for
    * either local mode or the cluster). A streaming query's stateful
    * exchange width is frozen at START time from
    * spark.sql.shuffle.partitions (AQE is disabled in stateful plans), and
    * every micro-batch then pays one state-store load + commit PER
    * PARTITION regardless of rows. Sizing that width to the ARRIVING
    * volume — one partition per ~32 MB of source bytes, clamped to
    * [1, 4 × defaultParallelism] — keeps a 100 TB arrival stream as wide
    * as the cluster while a fixture-scale stream stops paying 32
    * near-empty state commits per batch. Measured on this box (r14,
    * local[32]): a 4-batch stateful stream's per-batch state-commit SUM is
    * 11–59 s at 32 partitions (the concurrent tiny delta-file commits
    * queue on the one ext4 journal: ~1.2 s each) vs 0.3–1.1 s at 4;
    * j25 wall 9.0 → 2.2 s median, results hash-identical (state key
    * hash-partitioning is width-independent). The previous session value
    * is restored in a finally, so batch keys never see the override.
    *
    * The override mutates the SESSION-global conf for the window's
    * duration (including awaitTermination): callers must not start
    * unrelated queries on the session concurrently, and any full-width
    * batch work a harness needs (static index builds, fixtureOnce source
    * synthesis) belongs BEFORE the window — the j12/j13/j17 convention.
    *
    * Arrival bytes are sized through the Hadoop FileSystem of each path
    * (a plain java.io.File reports 0 for hdfs://, s3:// or file: URIs,
    * which would have started a 100 TB cluster stream at width 1);
    * unknown or empty sizes fall back to the cluster's default
    * parallelism, never to 1.
    */
  private[graft] def withArrivalSizedShuffle[T](s: SparkSession,
      srcPaths: Seq[String])(body: => T): T = {
    val bytes = try {
      val conf = s.sparkContext.hadoopConfiguration
      srcPaths.map { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(conf)
        if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
      }.sum
    } catch { case scala.util.control.NonFatal(_) => 0L }
    val dp = s.sparkContext.defaultParallelism.toLong
    val parts =
      if (bytes <= 0L) dp
      else math.max(1L, math.min(bytes / (32L << 20) + 1, dp * 4))
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, parts.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Typed row/state shapes for j7 (top-level for stable Encoders). */
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, n_purchases: Long,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

  /** j1's transformation, shared verbatim between batch and readStream. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Par.dsum(col("value")).as("sum_val"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_val"))

  val j1_tumbling_window = OpQuery(
    (s, d) => tumblingAgg(t(s, d, "events")).orderBy("ws", "event_type"),
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       |  count(*) AS n, ${Par.dsumSql("value")} AS sum_val
       |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)

  val j2_sliding_window = OpQuery(
    (s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), Par.dsum(col("value")).as("sum_val"))
      .select(col("window.start").as("ws"), col("n"), col("sum_val"))
      .orderBy("ws"),
    s"""SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes' * r.k AS ws,
       |  count(*) AS n, ${Par.dsumSql("value")} AS sum_val
       |FROM events, range(0, 4) r(k)
       |GROUP BY 1 ORDER BY ws""".stripMargin)

  /** j3: sessionization, 30-min gap. The batch form (lag → flag → cumsum) is
    * the classic shuffle-once encoding; StreamOpsSpec checks it against
    * session_window() on the same data.
    */
  val j3_session_window = OpQuery(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "sess_id")
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sess_id")
    },
    """SELECT user_id, sess_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM (
      |    SELECT user_id, event_id, ts,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |        OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |           > 30 * 60 * 1000000
      |        THEN 1 ELSE 0 END AS new_sess
      |    FROM events))
      |GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin)

  /** j4: late-data policy (batch surrogate of withWatermark): drop rows more
    * than 1 day behind max event time.
    */
  val j4_watermark_late = OpQuery(
    (s, d) => {
      val ev = t(s, d, "events")
      val mx = ev.agg(max(col("ts")).as("max_ts"))
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") >= col("max_ts") - expr("INTERVAL 1 DAY"))
        .select("event_id", "user_id", "ts")
        .orderBy("event_id")
    },
    """SELECT event_id, user_id, ts FROM events
      |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY
      |ORDER BY event_id""".stripMargin)

  /** j5: dedup-by-key (streaming dropDuplicates' batch semantics) over a
    * doubled input.
    */
  val j5_stateful_dedup = OpQuery(
    (s, d) => {
      val ev = t(s, d, "events").select("event_id", "event_type")
      ev.unionByName(ev)
        .dropDuplicates("event_id")
        .orderBy("event_id")
    },
    """SELECT DISTINCT event_id, event_type
      |FROM (SELECT event_id, event_type FROM events
      |      UNION ALL SELECT event_id, event_type FROM events)
      |ORDER BY event_id""".stripMargin)

  /** j6: end-to-end micro-batch harness — parquet file stream source →
    * tumblingAgg (same function as j1) → memory sink, Trigger.AvailableNow,
    * checkpointed. The result equals batch j1, so the j1 oracle gates it.
    */
  val j6_stream_agg_sink = OpQuery(
    (s, d) => withArrivalSizedShuffle(s, Seq(s"$d/events.parquet")) {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j6"))
      graft.Util.deleteRecursively(ckpt)
      val src = Tables.eventsStream(s, d)
      val q = tumblingAgg(src.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName("graft_j6")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j6").orderBy("ws", "event_type")
    },
    s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
       |  count(*) AS n, ${Par.dsumSql("value")} AS sum_val
       |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)

  /** j7: arbitrary per-key state via typed mapGroupsWithState — the custom
    * stateful-operator surface (KeyValueGroupedDataset). The same lambda
    * runs in batch (each group = one invocation, state unused across
    * batches) and streaming (state persisted in the state store between
    * micro-batches — StreamOpsSpec drives that path). Aggregates are
    * order-insensitive (count/min/max), so iterator order within a group
    * doesn't matter.
    */
  def userStateAgg(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0L, null, null))
          val next = it.foldLeft(prev) { (acc, e) =>
            UserAgg(uid,
              acc.n_events + 1,
              acc.n_purchases + (if (e.event_type == "purchase") 1 else 0),
              if (acc.first_ts == null || e.ts.before(acc.first_ts)) e.ts else acc.first_ts,
              if (acc.last_ts == null || e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }.toDF()
  }

  val j7_stateful_custom = OpQuery(
    (s, d) => userStateAgg(t(s, d, "events")).orderBy("user_id"),
    """SELECT user_id, count(*) AS n_events,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      |  min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)

  /** j8's transformation, shared verbatim between batch and two
    * readStreams: purchases joined to same-user views in the trailing
    * 30 minutes — the attribution shape. The equality key (user_id) plus
    * the two-sided time-range bound is exactly what Structured Streaming
    * requires of a stream-stream inner join so the state store can evict:
    * with both sides watermarked, a buffered view is droppable once the
    * purchase-side watermark passes v_ts + 30 min. One shuffle on
    * user_id per side at any scale.
    */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_id"), col("v_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  val j8_stream_stream_join = OpQuery(
    (s, d) => {
      val ev = t(s, d, "events")
      purchaseViewJoin(ev, ev).orderBy("p_id", "v_id")
    },
    """SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM events p JOIN events v
      |  ON p.user_id = v.user_id
      | AND p.event_type = 'purchase' AND v.event_type = 'view'
      | AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
      |ORDER BY p_id, v_id""".stripMargin)

  /** j9: dedup-on-ingest — the crawl-time face of exact dedup: a document
    * stream grouped by content fingerprint (i17's engine-portable rolling
    * hash), keeping min doc_id as canonical plus a copy count. Streaming
    * state is one row per DISTINCT fingerprint — ids and hashes, never
    * document bodies — so state size tracks the deduplicated corpus, not
    * the crawl volume; the same shape runs continuously against a real
    * crawl feed (with update mode + a sink that upserts on fp). Oracle =
    * the identical batch aggregation in DuckDB.
    */
  val j9_stream_ingest_dedup = OpQuery(
    (s, d) => withArrivalSizedShuffle(s, Seq(s"$d/documents.parquet")) {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j9"))
      graft.Util.deleteRecursively(ckpt)
      val src = s.readStream
        .schema(Tables.t(s, d, "documents").schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val agg = src.withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), LlmOps.fingerprint(col("toks")).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("canonical"), count(lit(1)).as("n_copies"))
      val q = agg.writeStream.format("memory").queryName("graft_j9")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j9").orderBy("canonical")
    },
    s"""SELECT fp, min(doc_id) AS canonical, count(*) AS n_copies
       |FROM (SELECT doc_id, ${LlmOps.fingerprintSql} AS fp FROM documents)
       |GROUP BY fp ORDER BY canonical""".stripMargin)

  /** Typed output row for j10 (top-level for a stable Encoder). */
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** j10's processor: per-user event-type histogram in a typed MapState —
    * the Spark 4 `transformWithState` arbitrary-state API (the successor
    * to mapGroupsWithState, j7): named state variables on a handle,
    * composite state shapes (map, not one value blob), per-variable TTL.
    * Emits the full per-user snapshot each batch; with the AvailableNow
    * one-file source that is exactly the final histogram (same one-batch
    * contract j7's update-mode parity test documents).
    */
  class TypeCountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Ev, TypeCount] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
      }
      counts.iterator().map { case (tp, n) => TypeCount(key, tp, n) }
    }
  }

  /** j10: the new-generation stateful operator, run through the REAL
    * micro-batch harness (readStream → transformWithState → memory sink).
    * transformWithState requires the RocksDB state store provider — set
    * for this query and restored after (the provider is per-query state
    * store machinery; the older j5/j7 ops run on either provider).
    * Scale: state is (user × event_type) counters in RocksDB — spillable
    * off-heap keyed state, the 100 TB answer to unbounded key spaces.
    */
  val j10_transform_with_state = OpQuery(
    (s, d) => withArrivalSizedShuffle(s, Seq(s"$d/events.parquet")) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        // same sweeper-managed scratch pattern as j6/j9 — a raw temp dir
        // would leak RocksDB SSTs on every invocation
        val ckpt = new java.io.File(graft.Util.scratch("ckpt_j10"))
        graft.Util.deleteRecursively(ckpt)
        val out = Tables.eventsStream(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update())
        val q = out.toDF().writeStream.format("memory").queryName("graft_j10")
          .outputMode("update")
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table("graft_j10").orderBy("user_id", "event_type")
      } finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    },
    """SELECT user_id, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin)

  /** j11: STREAMING corpus quality gate — the i29 filter applied to a
    * document stream (the continuous-crawl ingest shape: score and gate
    * each arriving page before it ever lands in the lake, instead of
    * batch-filtering later). The signal lineage is LITERALLY the shared
    * `qualitySignalsOf` the batch i29 and the prep CLI use (pure narrow
    * column ops incl. the compiled TokenRepetitionStats — streaming-safe
    * because nothing aggregates), so batch and stream can never drift;
    * append mode, no state, unbounded-safe at any rate. Oracle: the keep
    * subset of i29's SQL.
    */
  val j11_stream_quality_filter = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j11"))
      graft.Util.deleteRecursively(ckpt)
      val src = s.readStream
        .schema(Tables.t(s, d, "documents").schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val kept = LlmOps.qualitySignalsOf(src)
        .withColumn("verdict", LlmOps.qualityVerdict(LlmOps.QMinTok,
          LlmOps.QMaxDupFrac, LlmOps.QMaxTopBigram, LlmOps.QMinQuality))
        .filter(col("verdict") === "keep")
        .select("doc_id", "n_tok", "quality")
      val q = kept.writeStream.format("memory").queryName("graft_j11")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j11").orderBy("doc_id")
    },
    LlmOps.qualityKeepSql)

  /** j12: STREAMING incremental near-dup gate — i25's batch-vs-corpus
    * LSH probe run inside a micro-batch (the continuous-crawl shape j9
    * covers only for EXACT fingerprints): arriving documents probe a
    * static, precomputed corpus signature index and any arrival whose
    * verified Jaccard against an indexed document clears τ is flagged
    * before it lands in the lake. Both sides share LITERALLY the same
    * `bandedShingles` lineage (the j11 convention), so the stream probe
    * and the batch i25 cannot drift.
    *
    * Shape: TWO compact localCheckpointed static sides — the bucket
    * index (corpus_id, bucket) and the shingle base (corpus_id, hs) —
    * computed once, re-READ per micro-batch, never recomputed (at
    * 100 TB they are the incrementally-maintained signature index and
    * document-signature tables i25 documents, the index keyed/bucketed
    * by band bucket so each probe is a co-located hash-join lookup; the
    * stream side is the small side of every micro-batch join). Storing
    * hs on the 16-way-exploded index rows instead would materialize
    * every shingle array 16× — the two-table shape is batch i25's
    * verifyJaccard layout. Both verify joins precede the aggregation
    * (stream-static joins are legal there), so the only stateful
    * streaming operator is the final per-pair aggregation collapsing
    * multi-band hits; its state is one row per FLAGGED pair, tracking
    * the dup rate, not the crawl volume. Oracle: i25's exact-join SQL
    * verbatim — stream and batch answer the same question, and the gate
    * proves it.
    */
  /** The j12/j17 shared core: probe (stream or batch) → static corpus
    * LSH index → verified-Jaccard flagged-pair aggregation.
    *
    * TWO compact static sides, not one wide one: the bucket index
    * carries only (corpus_id, bucket) — materializing hs on every band
    * row would store each doc's shingle array 16×. The shingle sets live
    * once in `corpusBase` and join back by corpus_id AFTER the bucket
    * match (both joins are stream-static and sit before the aggregation,
    * so both are legal — the streaming restriction only bans joins after
    * it). Batch i25 has the same two-table shape via verifyJaccard.
    * Multi-band hits carry the identical exact jac, and every band row
    * of one probe doc arrives in the SAME micro-batch (the explode is
    * per-row), so min collapses them without a distinct and each
    * (batch_id, corpus_id) key is finalized by the one batch that
    * delivers its probe doc — the write-once property j17's update-mode
    * sink relies on.
    */
  /** The j12/j17 static corpus sides, materialized EAGERLY (localCheckpoint)
    * at full batch width — callers build this BEFORE entering their
    * arrival-sized shuffle window so the corpus indexing never runs on the
    * stream's (narrow) state partitioning.
    */
  private final case class DedupStatics(corpusIdx: DataFrame, corpusHs: DataFrame)

  private def incrementalDedupStatics(docs: DataFrame): DedupStatics = {
    val corpusBase = LlmOps.shingleSets(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val corpusIdx = LlmOps.withBandBuckets(corpusBase)
      .select(col("doc_id").as("corpus_id"), col("bucket"))
      .localCheckpoint()
    val corpusHs = corpusBase
      .select(col("doc_id").as("corpus_id"), col("hs").as("hs_c"))
    DedupStatics(corpusIdx, corpusHs)
  }

  private def incrementalDedupFlagged(st: DedupStatics, probeDocs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.intersectCount
    val corpusIdx = st.corpusIdx
    val corpusHs = st.corpusHs
    val probe = LlmOps.bandedShingles(probeDocs)
      .select(col("doc_id").as("batch_id"), col("hs").as("hs_b"),
        col("bucket"))
    probe.join(corpusIdx, "bucket")
      .join(corpusHs, "corpus_id")
      .withColumn("inter", intersectCount(col("hs_b"), col("hs_c")))
      .withColumn("jac", col("inter").cast(DoubleType) /
        (size(col("hs_b")) + size(col("hs_c")) - col("inter")))
      .filter(col("jac") >= 0.8)
      .groupBy("batch_id", "corpus_id")
      .agg(round(min(col("jac")), 6).as("jaccard"))
  }

  val j12_stream_incremental_dedup = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j12"))
      graft.Util.deleteRecursively(ckpt)
      val docs = t(s, d, "documents")
      // static corpus index at full batch width, BEFORE the arrival-sized
      // window (only the stream's stateful plan is narrow)
      val statics = incrementalDedupStatics(docs)
      withArrivalSizedShuffle(s, Seq(s"$d/documents.parquet")) {
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val flagged =
        incrementalDedupFlagged(statics, src.filter(col("doc_id") % 10 === 0))
      // complete mode re-emits the WHOLE flagged table every micro-batch
      // — state AND sink traffic grow with the cumulative flag count
      // over a crawl's lifetime. Kept as the j12 gate (memory-sink
      // convenience); j17 below is the production form: update mode +
      // append-only sink, each flagged pair crossing the sink exactly
      // once.
      val q = flagged.writeStream.format("memory").queryName("graft_j12")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j12").orderBy("batch_id", "corpus_id")
      }
    },
    // the SAME question as batch i25 — reuse its exact-join oracle
    LlmOps.i25_dedup_incremental.oracle.get)

  /** j17: the UPDATE-MODE production form of j12 — the streaming dedup
    * gate with a real (append-only parquet) sink via foreachBatch. The
    * gated run itself spans TWO micro-batches (two probe files,
    * maxFilesPerTrigger=1), so the delta semantics are exercised at the
    * gate, not just in a spec.
    *
    * State-lifetime contract, stated: the aggregation state holds one
    * row per flagged pair in BOTH modes — what update mode fixes is the
    * SINK: complete mode re-emits the entire cumulative table every
    * micro-batch (O(total flags) per batch, unbounded over a crawl's
    * lifetime), update mode emits each pair exactly once, in the batch
    * that delivered its probe doc (the write-once property proven by
    * this very gate: a re-emission would duplicate rows in the
    * append-only sink and hash-mismatch the oracle). State for
    * long-quiescent pairs still accumulates; a production deployment
    * bounds it by keying state on an event-time window of the arrival
    * time and letting the watermark evict closed windows.
    */
  val j17_stream_update_dedup = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j17"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j17_sink"))
      graft.Util.deleteRecursively(sink)
      val docs = t(s, d, "documents")
      // static corpus index at full batch width (the j12 rule)
      val statics = incrementalDedupStatics(docs)
      // build-once scaffolding, keyed per sfDir (r8 #7): the op under
      // test is the stream, not re-synthesizing its source files. Built
      // at full batch width BEFORE the arrival-sized window (the
      // j12/j13 statics rule), which also lets the window size itself
      // on the ACTUAL arriving files rather than the whole corpus.
      val srcDir = graft.Util.fixtureOnce(
        s"j17_probe_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
        val probeDocs = docs.filter(col("doc_id") % 10 === 0)
        probeDocs.filter(col("doc_id") % 20 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f0")
        probeDocs.filter(col("doc_id") % 20 =!= 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f1")
      }
      withArrivalSizedShuffle(s, Seq(srcDir)) {
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
      val flagged = incrementalDedupFlagged(statics, src)
      val q = flagged.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          batch.withColumn("epoch", lit(epochId))
            .write.mode("append").parquet(sink.getAbsolutePath)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath)
        .select("batch_id", "corpus_id", "jaccard")
        .orderBy("batch_id", "corpus_id")
      }
    },
    // the cumulative union of update-mode deltas answers the SAME
    // question as j12's final complete-mode emission — i25's oracle
    LlmOps.i25_dedup_incremental.oracle.get)

  /** The planted four-batch late-data stream (j25): f0 = day-1 docs
    * (%10=1); f1 = day-3 docs (%10=3); f2 = day-3 RE-SENDS (in-watermark
    * dupes) + new day-3 docs (%10=7) + one CLOCK row (doc_id = −1,
    * day-5 noon — a synthetic heartbeat that advances the watermark far
    * enough to flush every real group by the final batch; real streams
    * get this for free from their continuous arrivals); f3 = the LATE
    * classes — day-1 re-sends (late dupes) and brand-new day-1-stamped
    * docs (%10=5, late arrivals). Files are written sequentially so the
    * file source's mod-time order delivers them as four micro-batches
    * (the j17 convention).
    */
  private def j25SourceDir(s: SparkSession, d: String): String =
    graft.Util.fixtureOnce(
      s"j25_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
      val ids = t(s, d, "documents").select("doc_id")
      def stamped(m: Int, day: String) = ids
        .filter(col("doc_id") % 10 === m)
        .withColumn("ts", expr(s"timestamp'$day 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, CAST(doc_id % 1440 AS INT), 0)"))
      val a = stamped(1, "2024-01-01")
      val b = stamped(3, "2024-01-03")
      val clock = s.range(1).select(lit(-1L).as("doc_id"),
        expr("timestamp'2024-01-05 12:00:00'").as("ts"))
      a.coalesce(1).write.mode("overwrite").parquet(s"$p/f0")
      b.coalesce(1).write.mode("overwrite").parquet(s"$p/f1")
      b.unionByName(stamped(7, "2024-01-03")).unionByName(clock)
        .coalesce(1).write.mode("overwrite").parquet(s"$p/f2")
      a.unionByName(stamped(5, "2024-01-01"))
        .coalesce(1).write.mode("overwrite").parquet(s"$p/f3")
    }

  /** j25: WATERMARKED streaming dedup — the late/out-of-order policy
    * the r12 verdict named missing #5: j9/j12/j17 dedup with UNBOUNDED
    * keyed state, and their write-once guarantees hold only because
    * nothing is ever evicted. This key runs the dedup as a watermarked
    * event-time AGGREGATION in append mode — count per (doc_id, ts)
    * behind a 1-day watermark — deliberately NOT streaming
    * dropDuplicates, for a measured reason: Spark's dedup operator does
    * not filter late input (a duplicate arriving after its key's state
    * was evicted re-emits as new — the engine documents this, and the
    * shell A/B reproduced it), so eviction silently breaks write-once
    * exactly when it starts saving memory. The aggregation path REFUSES
    * late rows instead (rows older than the late-event watermark never
    * reach state), emits each group exactly once when the eviction
    * watermark passes its event time, and evicts the group's state in
    * the same move — write-once, bounded state, and a deterministic
    * lateness cutoff (the delay) all from one operator. Engine
    * subtlety, pinned by the fixture: Spark 3.4+ keeps TWO watermarks —
    * late-row filtering uses the PREVIOUS batch's, eviction the current
    * one — so a row must be a full batch behind the advanced watermark
    * to be refused; the planted stream puts the late classes two
    * batches behind. The sink receives: day-1 originals n=1 (their
    * re-sends were refused — NOT double-counted), day-3 originals n=2
    * (the in-watermark re-send merged into live state: the dedup
    * receipt), new day-3 docs n=1; the late new arrivals (%10=5)
    * nothing. At 100 TB this is the only dedup shape whose state does
    * not grow with the corpus — StreamOpsSpec pins the final state at
    * exactly ONE group (the clock row). Oracle: the j4 batch-surrogate
    * convention — the sink is closed-form from the planted classes.
    */
  val j25_stream_late_dedup = OpQuery(
    (s, d) => withArrivalSizedShuffle(s, Seq(j25SourceDir(s, d))) {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j25"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j25_sink"))
      graft.Util.deleteRecursively(sink)
      val src = s.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("ts", TimestampType))))
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(j25SourceDir(s, d))
      val q = src.withWatermark("ts", "1 day")
        .groupBy(col("doc_id"), col("ts"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          // the clock row is filtered HERE, outside the streaming plan:
          // a filter above the aggregation would be pushed below the
          // EventTimeWatermark node (doc_id is a grouping key) and the
          // clock row would never reach the event-time stats.
          // foreachBatch is AT-LEAST-ONCE: a batch retry after a partial
          // write would double-append under mode("append"), so the sink
          // is made idempotent per epoch — each batch OVERWRITES its own
          // epoch=<id> directory, and a replay replaces its half-written
          // output instead of duplicating it (r13 ADVICE; the documented
          // production late-data pattern must survive its own delivery
          // semantics). The epoch directory is addressed DIRECTLY rather
          // than through dynamic partitionOverwriteMode: the dynamic
          // committer stages the whole batch, lists the sink, and
          // resolves partitions per batch — measured 2.3 s/batch of pure
          // commit machinery on this four-batch stream (r14 bench:
          // 9.0 s → 2.2 s median with the direct path, hash unchanged) —
          // while a direct per-epoch path write has the same replace-
          // my-own-output semantics by construction. Readback is
          // identical: epoch=<id> is the same layout partition discovery
          // reads either way, and the final select drops it.
          batch.filter(col("doc_id") >= 0)
            .write.mode("overwrite")
            .parquet(s"${sink.getAbsolutePath}/epoch=$epochId")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath)
        .select("doc_id", "ts", "n")
        .orderBy("doc_id")
    },
    """SELECT doc_id,
      |  CASE WHEN doc_id % 10 = 1 THEN TIMESTAMP '2024-01-01 00:00:00'
      |       ELSE TIMESTAMP '2024-01-03 00:00:00' END
      |    + (doc_id % 1440) * INTERVAL 1 MINUTE AS ts,
      |  CAST(CASE WHEN doc_id % 10 = 3 THEN 2 ELSE 1 END AS BIGINT) AS n
      |FROM documents WHERE doc_id % 10 IN (1, 3, 7)
      |ORDER BY doc_id""".stripMargin)

  /** The planted four-batch late-data stream for j26 — j25's proven
    * class timing over FULL document rows (the probe docs, %10 = 0,
    * split by mod 40): f0 = day-1 probes (%40=0); f1 = day-3 probes
    * (%40=10); f2 = the day-3 RE-SENDS (in-watermark dupes) + new
    * day-3 probes (%40=30) + one CLOCK row (doc_id −1, day-5 noon,
    * with synthetic text whose shingle set is NON-empty — the clock
    * must survive the shingle guard to reach the EventTimeWatermark
    * node, or the watermark never advances and no group ever flushes);
    * f3 = the LATE classes — day-1 re-sends and brand-new day-1-stamped
    * probes (%40=20), both two batches behind the advanced watermark.
    */
  private def j26SourceDir(s: SparkSession, d: String): String =
    graft.Util.fixtureOnce(
      s"j26_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
      val docs = t(s, d, "documents")
      val probes = docs.filter(col("doc_id") % 10 === 0)
      def stamped(m: Int, day: String) = probes
        .filter(col("doc_id") % 40 === m)
        .withColumn("ts", expr(s"timestamp'$day 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, CAST(doc_id % 1440 AS INT), 0)"))
      val a = stamped(0, "2024-01-01")
      val b = stamped(10, "2024-01-03")
      val clock = docs.orderBy("doc_id").limit(1)
        .withColumn("doc_id", lit(-1L))
        .withColumn("text", lit("graft clock heartbeat row advancing " +
          "the eviction watermark beyond every planted arrival class"))
        .withColumn("ts", expr("timestamp'2024-01-05 12:00:00'"))
      a.coalesce(1).write.mode("overwrite").parquet(s"$p/f0")
      b.coalesce(1).write.mode("overwrite").parquet(s"$p/f1")
      b.unionByName(stamped(30, "2024-01-03")).unionByName(clock)
        .coalesce(1).write.mode("overwrite").parquet(s"$p/f2")
      a.unionByName(stamped(20, "2024-01-01"))
        .coalesce(1).write.mode("overwrite").parquet(s"$p/f3")
    }

  /** j26: the LATE-DATA policy COMPOSED with the near-dup gate — the
    * r13 verdict's #6: j25 established the watermarked-aggregation
    * dedup shape, but the content gates it exists to protect (j12/j17's
    * LSH probe) still ran with unbounded/stateless arrival assumptions.
    * Here the MinHash shingle FINGERPRINT rides the grouping key of
    * j25's watermarked aggregation (the j13 sz-inline trick: everything
    * a later stage needs must travel IN the key, because a second
    * stateful op or a post-aggregation stream join is illegal), so one
    * operator yields all three guarantees at once: in-watermark
    * re-sends of a seen fingerprint MERGE into live state (n counts
    * arrivals), late re-sends are REFUSED before state (the j25
    * dropDuplicates defect cannot re-admit them as new), and each
    * finalized (doc, ts, fingerprint) group crosses to the probe
    * EXACTLY once, state evicted in the same move — bounded by the
    * watermark horizon, never by crawl lifetime. The LSH probe itself
    * runs in foreachBatch over the FINALIZED groups (the documented
    * escape hatch: batch-side joins are unrestricted there), against
    * the j12 static two-table index built once and captured by the
    * closure; the sink write is idempotent per epoch (the j25 r13
    * ADVICE rule). At 100 TB: state ∝ fingerprints inside the horizon,
    * probe cost ∝ finalized arrivals — both arrival-bounded. Oracle:
    * the j4 batch-surrogate convention — i25's flagged-pair oracle
    * restricted to the admitted classes, with the closed-form (ts, n).
    */
  val j26_stream_late_neardup = OpQuery(
    (s, d) => {
      import graft.functions.VectorFunctions.intersectCount
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j26"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j26_sink"))
      graft.Util.deleteRecursively(sink)
      val docs = t(s, d, "documents")
      // the static corpus index (j12's two-table shape), built ONCE and
      // captured by the foreachBatch closure — never per batch, and at
      // full batch width BEFORE the arrival-sized window (the j12 rule)
      val corpusBase = LlmOps.shingleSets(docs.filter(col("doc_id") % 10 =!= 0))
        .localCheckpoint()
      val corpusIdx = LlmOps.withBandBuckets(corpusBase)
        .select(col("doc_id").as("corpus_id"), col("bucket"))
        .localCheckpoint()
      val corpusHs = corpusBase
        .select(col("doc_id").as("corpus_id"), col("hs").as("hs_c"))
      withArrivalSizedShuffle(s, Seq(j26SourceDir(s, d))) {
      val src = s.readStream
        .schema(StructType(docs.schema.fields :+
          StructField("ts", TimestampType)))
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(j26SourceDir(s, d))
      val q = LlmOps.shingleSetsWith(src, Seq("ts")) // (doc_id, ts, hs)
        .withWatermark("ts", "1 day")
        .groupBy(col("doc_id"), col("ts"), col("hs")) // fingerprint IN the key
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          // finalized groups only reach here (append mode); the clock
          // row is dropped HERE, outside the streaming plan (j25 rule)
          val b0 = batch.filter(col("doc_id") >= 0)
          val bands = LlmOps.withBandBuckets(b0.select("doc_id", "hs"))
            .select(col("doc_id").as("batch_id"), col("hs").as("hs_b"),
              col("bucket"))
          val flagged = bands.join(corpusIdx, "bucket")
            .join(corpusHs, "corpus_id")
            .withColumn("inter", intersectCount(col("hs_b"), col("hs_c")))
            .withColumn("jac", col("inter").cast(DoubleType) /
              (size(col("hs_b")) + size(col("hs_c")) - col("inter")))
            .filter(col("jac") >= 0.8)
            .groupBy("batch_id", "corpus_id")
            .agg(round(min(col("jac")), 6).as("jaccard"))
            .join(b0.select(col("doc_id").as("batch_id"), col("ts"),
              col("n")), "batch_id")
          // idempotent per epoch via a DIRECT epoch=<id> path write (the
          // j25 rule and the j25 measurement: the dynamic-overwrite
          // committer costs ~2 s/batch of staging+listing on this
          // four-batch stream; the direct path has the same
          // replace-my-own-output semantics)
          flagged.write.mode("overwrite")
            .parquet(s"${sink.getAbsolutePath}/epoch=$epochId")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath)
        .select("batch_id", "corpus_id", "jaccard", "ts", "n")
        .orderBy("batch_id", "corpus_id")
      }
    },
    s"""WITH flagged AS (
       |${LlmOps.i25_dedup_incremental.oracle.get}
       |)
       |SELECT batch_id, corpus_id, jaccard,
       |  CASE WHEN batch_id % 40 = 0 THEN TIMESTAMP '2024-01-01 00:00:00'
       |       ELSE TIMESTAMP '2024-01-03 00:00:00' END
       |    + (batch_id % 1440) * INTERVAL 1 MINUTE AS ts,
       |  CAST(CASE WHEN batch_id % 40 = 10 THEN 2 ELSE 1 END AS BIGINT) AS n
       |FROM flagged WHERE batch_id % 40 IN (0, 10, 30)
       |ORDER BY batch_id, corpus_id""".stripMargin)

  /** j13: STREAMING decontamination — the i45 capped-containment gate on
    * a document stream, completing the streaming prep trio (j11 quality,
    * j12 near-dup, j13 benchmark overlap): every arriving page is checked
    * against the eval-benchmark index before it lands in the lake. The
    * ENTIRE benchmark side — capped shingle index with per-bench retained
    * sizes inline — is the static `cappedBenchIndex` the batch i45 and
    * the prep CLI build (one lineage), so the stream needs only a hash
    * equi-join and ONE aggregation: sz_bench rides in the grouping key,
    * which is why no post-aggregation join (illegal in streaming) is
    * ever needed. State is one row per (train, bench) pair that shares
    * at least one retained shingle — the h-join output is ≤ cap · (train
    * shingle instances), i.e. linear in the ARRIVING volume with a
    * cap-bounded constant (i45's linearity argument; the bench side
    * contributes only the cap, never a multiplier).
    * Oracle: i45's SQL verbatim.
    *
    * Like j12, this gate uses complete mode for memory-sink convenience;
    * at a real crawl's lifetime the production form is j17's contract —
    * update mode + append-only sink, each flagged pair emitted once by
    * the batch that delivers its train doc (the same write-once argument:
    * sz rides in the grouping key and every (train, bench) contribution
    * arrives with the train doc's micro-batch).
    */
  val j13_stream_decontaminate = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j13"))
      graft.Util.deleteRecursively(ckpt)
      val docs = t(s, d, "documents")
      // checkpointIndex: j13 re-reads the index EVERY micro-batch.
      // Built BEFORE the arrival-sized window below: the static index
      // build is a full-width batch job (localCheckpoint materializes
      // here), only the stream's stateful plan should be arrival-sized.
      val index = LlmOps.cappedBenchIndex(
        docs.filter(col("source") === "src0"), LlmOps.DecontamCap,
        checkpointIndex = true)
      withArrivalSizedShuffle(s, Seq(s"$d/documents.parquet")) {
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val tr = LlmOps.shingleSets(src.filter(col("source") =!= "src0"))
        .select(col("doc_id").as("train_id"), explode(col("hs")).as("h"))
      // the literal shared tail of batch i45 — join, one aggregation,
      // stateless filter/project (see containmentFromIndex)
      val flagged = LlmOps.containmentFromIndex(tr, index, 0.8)
      val q = flagged.writeStream.format("memory").queryName("graft_j13")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j13").orderBy("train_id", "bench_id")
      }
    },
    // the SAME question as batch i45 — reuse its capped-containment oracle
    LlmOps.i45_decontam_capped.oracle.get)

  /** j14: STREAMING perplexity gate — the CCNet LM filter (batch i38's
    * score, the signal behind i49's policy) applied to a document
    * stream, completing the streaming prep gate set: exact j9 / quality
    * j11 / near-dup j12 / decontam j13 / LM-score j14. The corpus
    * bigram LM is the STATIC side, shipped to every executor ONCE as a
    * broadcast hash map ("w1 w2" → integer micro-nat log-prob,
    * vocab²-bounded by Heaps' law — the classic map-side-join shape);
    * each arriving document is scored ROW-LOCALLY inside mapPartitions
    * (O(1) hash lookups per bigram, integer sum and truncating
    * division), so the gate is STATELESS: no per-doc aggregation state,
    * no watermark, append mode, unbounded-safe at any crawl rate. This
    * is the deliberate streaming re-shape of batch i38's
    * explode→join→groupBy: the LM join moves from per-occurrence rows
    * to one hash probe per bigram inside the row — the same integers
    * (i38's quantization makes the two formulations EXACTLY equal),
    * zero stream state. NOT the i42 single-map-row attach: Catalyst map
    * literals are array-backed, so element_at is a LINEAR scan of the
    * vocab²-sized map per bigram — ladder-measured 18.8 s at 1× and
    * superlinear, vs ~1 s for the hash-map form. The driver-side LM
    * collect is vocab²-bounded (never corpus-scaled); at 100 TB the LM
    * table is precomputed/incrementally maintained and shipped as
    * exactly this broadcast artifact. Every stream bigram exists in the
    * gate's LM by construction (learned from the same corpus); a
    * production deployment would smooth unseen bigrams to a floor.
    * Oracle: the keep subset of i38's score CTE — batch and stream
    * answer the same question.
    */
  val j14_stream_perplexity_gate = OpQuery(
    (s, d) => {
      import s.implicits._
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j14"))
      graft.Util.deleteRecursively(ckpt)
      val docs = t(s, d, "documents")
      // static LM side: vocab²-bounded collect → ONE broadcast hash map
      // (re-used by every micro-batch; never re-learned)
      val lm: Map[String, Long] = CorpusOps.bigramLogProbsOf(docs)
        .select(concat_ws(" ", col("w1"), col("w2")), col("lp_micro"))
        .as[(String, Long)].collect().toMap
      val lmB = s.sparkContext.broadcast(lm)
      val src = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val scored = src
        .where(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2) // the docScores scoreability guard
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val table = lmB.value // one handle per partition, rows stream
          it.map { case (id, toks) =>
            var sum = 0L
            var i = 1
            while (i < toks.length) {
              sum += table(toks(i - 1) + " " + toks(i))
              i += 1
            }
            val n = (toks.length - 1).toLong
            (id, n, sum, sum / n) // Java / truncates like DIV
          }
        }
        .toDF("doc_id", "n_bigrams", "sum_lp_micro", "mean_lp_micro")
        .filter(col("mean_lp_micro") >= lit(CorpusOps.PplFlagMicro))
      val q = scored.writeStream.format("memory").queryName("graft_j14")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j14").orderBy("doc_id")
    },
    Some(CorpusOps.docScoresSqlCte + s"""
       |SELECT doc_id, n_bigrams, sum_lp_micro, mean_lp_micro
       |FROM sc WHERE mean_lp_micro >= ${CorpusOps.PplFlagMicro}
       |ORDER BY doc_id""".stripMargin))

  /** j15: STREAMING crossmatch — the alert-broker shape (ZTF/LSST-class
    * surveys publish transient alerts as a stream; every alert is
    * crossmatched against reference catalogs before science cuts): d13's
    * grid-cell xmatch with the arriving catalog as the STREAM side and
    * the reference catalog as the static side. The core is shared
    * verbatim (`RelOps.xmatchPairs` — the j13 convention: the stream
    * composes the lineage the batch gate proves): the stream row
    * explodes to its 9 probe cells (stateless narrow), meets the static
    * catalog in a stream-static equi-join (streaming-legal, no state, no
    * watermark), and the exact integer refine is a stateless filter —
    * append mode, unbounded-safe at any alert rate. At scale the static
    * side is the broadcast/bucketed reference catalog; per-alert cost is
    * 9 hash probes regardless of catalog size.
    * Oracle: batch d13's brute-force oracle verbatim — stream and batch
    * answer the same question on the same tables.
    */
  val j15_stream_xmatch = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j15"))
      graft.Util.deleteRecursively(ckpt)
      val cat = t(s, d, "supplier").select(col("s_suppkey").as("b_id"),
        ((col("s_suppkey") * 7919L) % 360000L).as("ra_m"),
        ((col("s_suppkey") * 104729L) % 180000L - 90000L).as("dec_m"))
      val custSchema = t(s, d, "customer").schema
      val src = s.readStream.schema(custSchema)
        .option("pathGlobFilter", "customer.parquet")
        .parquet(d)
      val alerts = src.select(col("c_custkey").as("a_id"),
        ((col("c_custkey") * 7919L) % 360000L).as("ra_m"),
        ((col("c_custkey") * 104729L) % 180000L - 90000L).as("dec_m"))
      val matched = RelOps.xmatchPairs(alerts, cat,
        cellMilli = 2000L, rMilli = 2000L)
      val q = matched.writeStream.format("memory").queryName("graft_j15")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j15").orderBy("a_id", "b_id")
    },
    RelOps.d13_join_xmatch.oracle.get)

  /** j16: chunking at ingest — i58's sliding-window chunker on the
    * document stream (the RAG-indexing pipeline's streaming half: a
    * crawled page is chunked the moment it arrives, chunks flow straight
    * to the embedder/vector store). LITERALLY the shared `chunksOf`
    * lineage (the j11 convention — batch and stream geometry cannot
    * drift), and chunking is a pure narrow map, so the stream form is a
    * stateless append: no watermark, no state store, per-batch cost ∝
    * arriving tokens. Chunk ids stay the (doc_id, chunk_id) pure
    * function, so re-ingesting a crawled page yields byte-identical
    * chunk keys — idempotent vector-store upserts for free. Oracle =
    * i58's SQL verbatim.
    */
  val j16_stream_chunk = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j16"))
      graft.Util.deleteRecursively(ckpt)
      val src = s.readStream
        .schema(Tables.t(s, d, "documents").schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d)
      val q = CorpusOps.chunksOf(src)
        .writeStream.format("memory").queryName("graft_j16")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_j16").orderBy("doc_id", "chunk_id")
    },
    CorpusOps.chunkSql)

  /** j18: streaming BEST-match crossmatch — the alert-broker production
    * query (j15's pair stream collapsed to d20's "nearest counterpart or
    * none"): every alert arriving on the stream resolves to its single
    * nearest reference-catalog source within the radius, or to NULLs.
    *
    * Why this needs NO streaming aggregation state: the argmin's group
    * is one alert's candidate set, an alert arrives exactly once, and
    * the static reference side is complete in every batch — so the
    * group is batch-local by construction and the foreachBatch body can
    * run the full d20 core (sphereBestMatch) per micro-batch and append
    * (j17's append-only-sink contract: write-once-per-alert, proven BY
    * the gate — a re-emission would duplicate a_id rows and
    * hash-mismatch the unique-keyed oracle). No watermark, no state
    * store; the only cross-batch artifact is the sink. Two real
    * micro-batches at the gate (maxFilesPerTrigger=1 over a two-file
    * alert fixture). At scale each batch costs O(batch · 9 probes)
    * against the broadcast/bucketed reference — per-batch work ∝
    * arriving alerts, the j13 linearity argument on the sky.
    *
    * Oracle = d20's SQL verbatim: the union of per-batch best-matches
    * over any partition of the alert set IS the whole-set best-match.
    */
  val j18_stream_xmatch_best = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j18"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j18_sink"))
      graft.Util.deleteRecursively(sink)
      val cust = t(s, d, "customer")
      // build-once scaffolding, keyed per sfDir (r8 #7)
      val srcDir = graft.Util.fixtureOnce(
        s"j18_alert_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
        cust.filter(col("c_custkey") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f0")
        cust.filter(col("c_custkey") % 2 =!= 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f1")
      }
      val (raA, decA) = SphereSql.catalog("c_custkey")
      val (raB, decB) = SphereSql.catalog("s_suppkey")
      val catB = t(s, d, "supplier").select(col("s_suppkey").as("b_id"),
        expr(raB).as("ra_b"), expr(decB).as("dec_b"))
      val src = s.readStream.schema(cust.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
      val alerts = src.select(col("c_custkey").as("a_id"),
        expr(raA).as("ra_a"), expr(decA).as("dec_a"))
      val q = alerts.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          RelOps.sphereBestMatch(batch, catB)
            .write.mode("append").parquet(sink.getAbsolutePath)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath)
        .select("a_id", "best_b", "dist2q").orderBy("a_id")
    },
    RelOps.d20_xmatch_best.oracle.get)

  /** j19: streaming perceptual image dedup — the multimodal completion
    * of the streaming prep family (text j9/j12, sky j15/j18): every
    * image arriving on the stream is decoded, hashed with the
    * integer-exact m9 average hash, and matched against a STATIC
    * reference catalog of known-image hashes within nibble-hamming ≤ 3
    * (the crawl-time "have we seen this picture before?" gate — the
    * production shape is a frozen dedup index from yesterday's corpus
    * with today's crawl streaming against it).
    *
    * Why this needs NO streaming state (the j18 argument): the pairing
    * is stream-doc × static-catalog, a stream doc arrives exactly once,
    * and the catalog side is complete in every batch — so each doc's
    * match set is batch-local by construction and foreachBatch runs the
    * full m9 core (codec pass + pigeonhole blocked join) per
    * micro-batch into an append-only sink. No watermark, no state
    * store; write-once proven BY the unique-keyed gate. Two real
    * micro-batches (maxFilesPerTrigger=1 over a two-file fixture). At
    * scale each batch costs O(batch · 4 probes) against the
    * checkpointed catalog hash frame — per-batch work ∝ arriving
    * images; the catalog's 24 bytes/doc hash frame is the only
    * long-lived artifact, pixels never persist. The declared catalog
    * count arms the core's saturation guard, so a catalog that
    * outgrows this hash width (524,288 rows at 4 chunks of 4 nibbles:
    * 4·n ≤ 32·16⁴ — m10's tighter ~262k bound is its 8-chunk layout)
    * refuses loudly at startup instead of going quietly quadratic —
    * the documented lever is the m10 fix's: more hash bits, wider
    * chunks.
    *
    * Oracle = the m9 hash chain with the pair predicate swapped from
    * a < b to stream-side × catalog-side: the union of per-batch
    * matches over any partition of the stream set IS the whole-set
    * match relation.
    */
  val j19_stream_image_dedup = OpQuery(
    (s, d) => {
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j19"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j19_sink"))
      graft.Util.deleteRecursively(sink)
      val docs = t(s, d, "documents")
      // build-once scaffolding, keyed per sfDir (r8 #7)
      val srcDir = graft.Util.fixtureOnce(
        s"j19_img_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
        docs.filter(col("doc_id") % 4 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f0")
        docs.filter(col("doc_id") % 4 === 2).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f1")
      }
      val cat = MultimodalOps.phashFrameOf(
          docs.filter(col("doc_id") % 2 === 1))
        .select(col("doc_id").as("b_id"), col("hh").as("db"))
        .localCheckpoint() // hashed ONCE; every batch joins this frame
      val catN = cat.count() // cheap on the checkpoint; arms the guard
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
      val q = src.select("doc_id").writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ah = MultimodalOps.phashFrameOf(batch)
            .select(col("doc_id").as("a_id"), col("hh").as("da"))
          RelOps.hammingBlockedPairs(ah, cat, keyLen = 16, chunks = 4,
            maxHd = 3, alphabet = 16, minSideRows = catN)
            .write.mode("append").parquet(sink.getAbsolutePath)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath).orderBy("a_id", "b_id")
    },
    """WITH f AS (SELECT doc_id, doc_id // 7 AS g,
      |    CASE WHEN doc_id % 7 = 0 THEN -1 ELSE (doc_id * 13) % 64 END AS p
      |  FROM documents),
      |s AS (SELECT doc_id, list_transform(range(0, 64), b ->
      |    8 * ((g + 1) * (b + 3) * 2654435761 % 1000000007 % 240
      |         + CASE WHEN b = p THEN 8 ELSE 0 END))
      |    AS sums FROM f),
      |hb AS (SELECT doc_id, sums, CAST(list_sum(sums) AS BIGINT) AS t FROM s),
      |bits AS (SELECT doc_id, list_transform(range(0, 64), b ->
      |    CASE WHEN 64 * sums[b + 1] > t THEN 1 ELSE 0 END) AS bv FROM hb),
      |hx AS (SELECT doc_id, list_aggregate(list_transform(range(0, 16), j ->
      |    substr('0123456789abcdef',
      |      8 * bv[4*j+1] + 4 * bv[4*j+2] + 2 * bv[4*j+3] + bv[4*j+4] + 1, 1)),
      |    'string_agg', '') AS hh FROM bits),
      |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(len(list_filter(range(1, 17), i ->
      |      substr(a.hh, i, 1) <> substr(b.hh, i, 1))) AS BIGINT) AS hd
      |  FROM hx a JOIN hx b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)
      |SELECT a_id, b_id, hd FROM pr WHERE hd <= 3
      |ORDER BY a_id, b_id""".stripMargin)

  /** j20: streaming ANN serving — the online half of the SQ8 index
    * family (i61 builds, i63/i64 probe once; THIS is the query stream a
    * deployed index actually faces): query vectors arrive in
    * micro-batches and each runs the two-stage SQ8 search against the
    * PERSISTED codes-only index — approx top-50 per query over the code
    * scan (int×double inner loop, window-ranked per q_id), exact
    * re-rank of the survivors against the float table, top-3 emitted
    * per query. Stateless by the j18/j19 argument: a query arrives
    * exactly once and the index side is complete in every batch, so
    * each query's result is batch-local and foreachBatch appends —
    * no watermark, no state store; write-once proven by the
    * unique-keyed gate. Two real micro-batches (maxFilesPerTrigger=1).
    * At scale the per-batch cost is |batch| × the probed index bytes:
    * here the full code scan (the honest gate shape); a deployment
    * composes i64's cell layout so each query prunes to its nprobe
    * partitions — the batch side of that plan is identical. The query
    * set shares the maxabs>0 guard with the index (the r8 ADVICE rule:
    * one guard, both engines). Oracle: i62's two-stage chain PER QUERY
    * (window-ranked), queries = vec_id ≡ 3 (mod 101).
    */
  val j20_stream_ann = OpQuery(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ckpt = new java.io.File(graft.Util.scratch("ckpt_j20"))
      graft.Util.deleteRecursively(ckpt)
      val sink = new java.io.File(graft.Util.scratch("j20_sink"))
      graft.Util.deleteRecursively(sink)
      val e = t(s, d, "embeddings")
      // build-once scaffolding, keyed per sfDir (r8 #7): the arriving
      // queries — two files so AvailableNow runs two real batches
      val srcDir = graft.Util.fixtureOnce(
        s"j20_query_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
        val q = e.filter(col("vec_id") % 101 === 3)
        q.filter(col("vec_id") % 2 === 0).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f0")
        q.filter(col("vec_id") % 2 === 1).coalesce(1)
          .write.mode("overwrite").parquet(s"$p/f1")
      }
      // the persisted codes-only index (i63's artifact) + the float side
      val codes = s.read.parquet(graft.ops.LlmOps.sq8WriteIndex(s, d))
        .localCheckpoint()
      val src = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir)
      val q = src.select("vec_id", "embedding").writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the index-side guard applied to the query stream too
          val qb = batch
            .withColumn("maxq", array_max(transform(col("embedding"),
              x => abs(x.cast("double")))))
            .filter(col("maxq") > 0)
            .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
          val approx = codes.join(broadcast(qb), col("vec_id") =!= col("q_id"))
            .withColumn("approx_sim", col("maxabs") / lit(127.0) *
              aggregate(zip_with(col("qarr"), col("qvec"),
                (qc, v) => qc * v.cast("double")), lit(0.0), (a, x) => a + x))
            .withColumn("rk", row_number().over(Window.partitionBy("q_id")
              .orderBy(desc("approx_sim"), asc("vec_id"))))
            .filter(col("rk") <= 50)
            .select("q_id", "vec_id", "qvec")
          approx.join(t(s, d, "embeddings"), "vec_id")
            .withColumn("sim", round(graft.functions.VectorFunctions.dot(
              col("embedding"), col("qvec")), 6))
            .withColumn("rk", row_number().over(Window.partitionBy("q_id")
              .orderBy(desc("sim"), asc("vec_id"))))
            .filter(col("rk") <= 3)
            .select("q_id", "vec_id", "sim")
            .write.mode("append").parquet(sink.getAbsolutePath)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(sink.getAbsolutePath).orderBy("q_id", "vec_id")
    },
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |c AS (
       |  SELECT vec_id, embedding, maxabs,
       |    list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS BIGINT)) AS qarr
       |  FROM m WHERE maxabs > 0),
       |q AS (SELECT vec_id AS q_id, embedding AS qvec FROM c
       |      WHERE vec_id % 101 = 3),
       |a AS (
       |  SELECT q.q_id, c.vec_id, c.embedding, q.qvec,
       |    maxabs / 127.0 * list_sum(list_transform(range(1,65),
       |      k -> c.qarr[k] * q.qvec[k]::DOUBLE)) AS approx_sim
       |  FROM c, q WHERE c.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, embedding, qvec,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_sim DESC, vec_id) AS rk FROM a),
       |s AS (SELECT q_id, vec_id,
       |    round(${graft.ops.LlmOps.dotSql("embedding", "qvec")}, 6) AS sim
       |  FROM r WHERE rk <= 50),
       |t AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s)
       |SELECT q_id, vec_id, sim FROM t WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  /** Per-batch stage 1 of the IVF-pruned streaming ANN (j21) — the
    * composition the j20 Scaladoc promised ("a deployment composes
    * i64's cell layout so each query prunes to its nprobe partitions"),
    * made a real per-batch plan (r9 verdict #2):
    *
    *  1. rank cells PER QUERY against the PERSISTED k×64 centroid
    *     artifact (i64's `sq8IvfCentDir` — read per batch, k×64 rows;
    *     never the float corpus), rounded csim + (q_id) window rank ≤ 2
    *     — i13's deterministic cut per query;
    *  2. the batch's cell UNION collects into a literal `IN` (bounded
    *     by k cells total, the d2/i7 convention) so the codes scan
    *     plans PartitionFilters — per-batch bytes track the probed
    *     cells, not the index (StreamOpsSpec plan-asserts this);
    *  3. each query approx-scores ONLY its own top-2 cells' codes
    *     (the qcells broadcast join re-restricts the union per query),
    *     window rank ≤ 50 per q_id.
    *
    * Returns (q_id, vec_id, qvec) — the survivors stage 2 re-ranks
    * exactly. qcells is localCheckpointed: it feeds both the bounded
    * cell collect and the broadcast join, and the checkpoint keeps the
    * returned plan's broadcast side a local scan (no recompute).
    */
  /** Per-batch cell ranking against a persisted centroid table — stage 0
    * shared by the SQ8 probe (ivfBatchStage1) and the PQ probe
    * (pqIvfBatchStage1): rounded csim per (query, cell), window rank ≤
    * nprobe. Returns (q_id, cell), localCheckpointed because every
    * caller reads it twice (the bounded cell collect + a broadcast join).
    */
  private[graft] def ivfBatchCells(s: SparkSession, centDir: String,
      qb: DataFrame, nprobe: Int): DataFrame =
    ivfBatchCells(s.read.parquet(centDir), qb, nprobe)

  /** The frame-accepting form: serving harnesses load the k×64 centroid
    * artifact ONCE per op (localCheckpointed) and rank every micro-batch
    * against the held frame instead of re-scanning the parquet per batch
    * (opt guide §6 redundant I/O — the r14 verdict's #2).
    */
  private[graft] def ivfBatchCells(cent: DataFrame,
      qb: DataFrame, nprobe: Int): DataFrame = {
    val qx = qb.select(col("q_id"), posexplode(col("qvec")).as(Seq("pos", "qv")))
      .withColumn("qv", col("qv").cast("double"))
    cent.join(broadcast(qx), Seq("pos"))
      .groupBy("q_id", "cell")
      .agg(round(sum(col("c") * col("qv")), 6).as("csim"))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(desc("csim"), asc("cell"))))
      .filter(col("rk") <= nprobe).select("q_id", "cell")
      .localCheckpoint()
  }

  def ivfBatchStage1(s: SparkSession, idxDir: String, qb: DataFrame,
      nprobe: Int = 2, centDir: Option[String] = None,
      // per-op hoisted side frames (r14 verdict #2): the serving
      // harnesses pass the once-loaded centroid frame and the shared
      // lazy index scan handle so a micro-batch re-plans but never
      // re-loads the statics
      centDf: Option[DataFrame] = None,
      idxDf: Option[DataFrame] = None): DataFrame = {
    // the gate layout keeps centroids at <idx>_cent; PrepMain's --ann
    // artifact names them ann_centroids.parquet beside the index —
    // same table, caller-supplied path
    val qcells = ivfBatchCells(centDf.getOrElse(s.read.parquet(
      centDir.getOrElse(graft.ops.LlmOps.sq8IvfCentDir(idxDir)))), qb, nprobe)
    val cells = qcells.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    // a batch whose queries were ALL guard-filtered (maxq == 0) ranks no
    // cells; isin() with zero arguments is an analyzer edge case, so
    // return the empty survivor frame directly instead of planning it
    if (cells.isEmpty)
      return qb.select(col("q_id"), col("q_id").as("vec_id"), col("qvec"))
        .limit(0)
    idxDf.getOrElse(s.read.parquet(idxDir)).filter(col("cell").isin(cells: _*))
      .join(broadcast(qcells.join(qb, "q_id")), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx_sim", col("maxabs") / lit(127.0) *
        aggregate(zip_with(col("qarr"), col("qvec"),
          (qc, v) => qc * v.cast("double")), lit(0.0), (a, x) => a + x))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(desc("approx_sim"), asc("vec_id"))))
      .filter(col("rk") <= 50)
      .select("q_id", "vec_id", "qvec")
  }

  /** Per-batch stage 1 of the IVF×PQ streaming ANN (j23) — ivfBatchStage1
    * with i71's byte lever swapped in: the SAME per-query cell cut
    * against the persisted learned centroids (stage 0 shared code), but
    * the probed partitions hold 8-byte PQ codes ranked by the integer
    * ADC — per-batch tables (|batch| × m·k rows, broadcast) joined
    * map-side against the exploded codes of ONLY the probed cells. Per
    * batch the cluster reads nprobe directories × 8 bytes/vector — both
    * reductions compound in the SERVING path, where batch cadence
    * multiplies every byte. Returns (q_id, vec_id, qvec) survivors for
    * the exact re-rank, the ivfBatchStage1 contract.
    */
  def pqIvfBatchStage1(s: SparkSession, idxDir: String, cbDir: String,
      centDir: String, qb: DataFrame, nprobe: Int = 2,
      // per-op hoisted side frames (r14 verdict #2) — see ivfBatchStage1
      centDf: Option[DataFrame] = None,
      cbDf: Option[DataFrame] = None,
      idxDf: Option[DataFrame] = None): DataFrame = {
    import graft.ops.LlmOps.{PqDsub => D}
    val qcells = ivfBatchCells(
      centDf.getOrElse(s.read.parquet(centDir)), qb, nprobe)
    val cells = qcells.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty)
      return qb.select(col("q_id"), col("q_id").as("vec_id"), col("qvec"))
        .limit(0)
    // per-query integer ADC tables against the constant-size codebook
    val qx = qb
      .select(col("q_id"), posexplode(
        expr("transform(qvec, x -> CAST(floor(x * 1000) AS BIGINT))"))
        .as(Seq("p0", "qv")))
      .withColumn("sub", expr(s"p0 DIV $D"))
      .withColumn("pos", expr(s"p0 % $D"))
    val dtq = cbDf.getOrElse(s.read.parquet(cbDir))
      .join(broadcast(qx), Seq("sub", "pos"))
      .groupBy("q_id", "sub", "cid")
      .agg(sum(col("cv_i") * col("qv")).as("ds"))
    idxDf.getOrElse(s.read.parquet(idxDir)).filter(col("cell").isin(cells: _*))
      .select(col("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
      .join(broadcast(qcells), Seq("cell")) // each query scores its OWN cells
      .join(broadcast(dtq), Seq("q_id", "sub", "cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum("ds").as("approx_i"))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(desc("approx_i"), asc("vec_id"))))
      .filter(col("rk") <= 50)
      .join(broadcast(qb.select("q_id", "qvec")), Seq("q_id"))
      .select("q_id", "vec_id", "qvec")
  }

  /** j21: IVF-pruned streaming ANN serving — j20 composed with i64's
    * cell layout, closing the r9 verdict's #2: where j20 honestly scans
    * the FULL codes table per micro-batch (the flat serving mode), here
    * each batch ranks its queries' cells against the persisted centroid
    * artifact and probes ONLY the union of their top-2 cells — a
    * literal partition filter per batch, so per-batch index bytes are
    * nprobe cells × (bytes/3.5), not the index (the stream ladder pins
    * it). Stateless by j20's batch-local argument; the index and its
    * centroids are i64's build-once artifacts. Oracle: j20's two-stage
    * chain per query with the SAME per-query cell cut mirrored in SQL
    * (rounded csim, row_number ≤ 2) — recall loss vs the flat scan is
    * the documented IVF trade, and the gate hashes the PRUNED truth.
    */
  /** The j21/j22 serving harness, parametrized by WHICH persisted index
    * the batches probe (label cells vs learned k-means cells — the plan
    * is identical either way; only the artifact differs, which is the
    * i67 comparison made a SERVING path): two AvailableNow micro-batches
    * of arriving queries, per-batch cell rank against the index's
    * persisted centroids, literal-IN partition-filtered probe, exact
    * top-3 re-rank appended to the sink.
    */
  private def streamAnnServe(s: SparkSession, d: String, name: String,
      idx: String): DataFrame = {
    // statics loaded once per op, not once per micro-batch (r14 verdict
    // #2 / opt guide §6): the k×64 centroid artifact is materialized
    // (localCheckpoint — removes one parquet scan job per batch), the
    // index keeps ONE lazy scan handle (file listing resolved once; the
    // per-batch literal cell partition filter plans exactly as before)
    val cent = s.read.parquet(graft.ops.LlmOps.sq8IvfCentDir(idx))
      .localCheckpoint()
    val idxDf = s.read.parquet(idx)
    streamAnnServeWith(s, d, name, qb =>
      ivfBatchStage1(s, idx, qb, centDf = Some(cent), idxDf = Some(idxDf)))
  }

  /** The harness behind streamAnnServe, parametrized by the per-batch
    * stage-1 probe (SQ8 for j21/j22, PQ ADC for j23) — the sink/rerank
    * contract is identical: stage 1 returns (q_id, vec_id, qvec), the
    * harness re-ranks exactly and appends the top-3 per query.
    */
  private def streamAnnServeWith(s: SparkSession, d: String, name: String,
      stage1: DataFrame => DataFrame): DataFrame = {
    val ckpt = new java.io.File(graft.Util.scratch(s"ckpt_$name"))
    graft.Util.deleteRecursively(ckpt)
    val sink = new java.io.File(graft.Util.scratch(s"${name}_sink"))
    graft.Util.deleteRecursively(sink)
    val e = t(s, d, "embeddings")
    // build-once scaffolding, keyed per sfDir (r8 #7): the arriving
    // queries — two files so AvailableNow runs two real batches (the
    // fixture is shared across serving keys: same arriving queries)
    val srcDir = graft.Util.fixtureOnce(
      s"j21_query_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
      val q = e.filter(col("vec_id") % 101 === 3)
      q.filter(col("vec_id") % 2 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$p/f0")
      q.filter(col("vec_id") % 2 === 1).coalesce(1)
        .write.mode("overwrite").parquet(s"$p/f1")
    }
    val src = s.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = src.select("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the index-side guard applied to the query stream too
        val qb = batch
          .withColumn("maxq", array_max(transform(col("embedding"),
            x => abs(x.cast("double")))))
          .filter(col("maxq") > 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
          .localCheckpoint() // read by the cell rank AND the probe join
        val approx = stage1(qb)
        approx.join(t(s, d, "embeddings"), "vec_id")
          .withColumn("sim", round(graft.functions.VectorFunctions.dot(
            col("embedding"), col("qvec")), 6))
          .withColumn("rk", row_number().over(Window.partitionBy("q_id")
            .orderBy(desc("sim"), asc("vec_id"))))
          .filter(col("rk") <= 3)
          .select("q_id", "vec_id", "sim")
          .write.mode("append").parquet(sink.getAbsolutePath)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(sink.getAbsolutePath).orderBy("q_id", "vec_id")
  }

  val j21_stream_ann_ivf = OpQuery(
    (s, d) => streamAnnServe(s, d, "j21", graft.ops.LlmOps.sq8WriteIndexIvf(s, d)),
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |c AS (
       |  SELECT vec_id, label, embedding, maxabs,
       |    list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS BIGINT)) AS qarr
       |  FROM m WHERE maxabs > 0),
       |ex AS (SELECT label, r.i AS pos, embedding[r.i]::DOUBLE AS v
       |       FROM embeddings, range(1,65) r(i)),
       |cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY 1, 2),
       |q AS (SELECT vec_id AS q_id, embedding AS qvec FROM c
       |      WHERE vec_id % 101 = 3),
       |qx AS (SELECT q_id, r.i AS pos, qvec[r.i]::DOUBLE AS qv
       |       FROM q, range(1,65) r(i)),
       |csim AS (SELECT q_id, cent.label, round(sum(c * qv), 6) AS s
       |         FROM cent JOIN qx USING (pos) GROUP BY 1, 2),
       |qc AS (SELECT q_id, label FROM (
       |         SELECT q_id, label, row_number() OVER (PARTITION BY q_id
       |           ORDER BY s DESC, label) AS rk FROM csim) WHERE rk <= 2),
       |a AS (
       |  SELECT q.q_id, c.vec_id, c.embedding, q.qvec,
       |    maxabs / 127.0 * list_sum(list_transform(range(1,65),
       |      k -> c.qarr[k] * q.qvec[k]::DOUBLE)) AS approx_sim
       |  FROM c JOIN qc ON c.label = qc.label
       |         JOIN q ON q.q_id = qc.q_id
       |  WHERE c.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, embedding, qvec,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_sim DESC, vec_id) AS rk FROM a),
       |s AS (SELECT q_id, vec_id,
       |    round(${graft.ops.LlmOps.dotSql("embedding", "qvec")}, 6) AS sim
       |  FROM r WHERE rk <= 50),
       |t AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s)
       |SELECT q_id, vec_id, sim FROM t WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  /** j22: serving the LEARNED index — j21's per-batch IVF-pruned plan
    * run against `sq8WriteIndexKmeans`'s artifact (r11: i67 proves the
    * learned cells beat the label cells at the same nprobe; this key
    * proves the SERVING path — the plan j21 plan-asserts — runs
    * unchanged against the artifact PrepMain's `--ann` actually ships,
    * so the pipeline's index and the gated serving mode are the same
    * object). Harness, batching, pruning, and re-rank are shared code
    * (`streamAnnServe`); only the index dir differs. Oracle: j21's
    * pruned chain with the coarse quantizer replaced by the Lloyd CTE
    * (i67's oracle pieces) — the gate hashes the learned-cell pruned
    * truth per arriving query.
    */
  val j22_stream_ann_kmeans = OpQuery(
    (s, d) => streamAnnServe(s, d, "j22",
      graft.ops.LlmOps.sq8WriteIndexKmeans(s, d)),
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |${graft.ops.LlmOps.lloydCteSql("maxabs > 0")},
       |c AS (
       |  SELECT m.vec_id, k.cid AS cell, m.embedding, m.maxabs,
       |    list_transform(m.embedding,
       |      x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS BIGINT)) AS qarr
       |  FROM m JOIN cellkm k ON m.vec_id = k.vec_id WHERE m.maxabs > 0),
       |q AS (SELECT vec_id AS q_id, embedding AS qvec FROM c
       |      WHERE vec_id % 101 = 3),
       |qx AS (SELECT q_id, r.i AS pos, qvec[r.i]::DOUBLE AS qv
       |       FROM q, range(1,65) r(i)),
       |csim AS (SELECT q_id, centkm.label, round(sum(c * qv), 6) AS s
       |         FROM centkm JOIN qx USING (pos) GROUP BY 1, 2),
       |qc AS (SELECT q_id, label FROM (
       |         SELECT q_id, label, row_number() OVER (PARTITION BY q_id
       |           ORDER BY s DESC, label) AS rk FROM csim) WHERE rk <= 2),
       |a AS (
       |  SELECT q.q_id, c.vec_id, c.embedding, q.qvec,
       |    maxabs / 127.0 * list_sum(list_transform(range(1,65),
       |      k -> c.qarr[k] * q.qvec[k]::DOUBLE)) AS approx_sim
       |  FROM c JOIN qc ON c.cell = qc.label
       |         JOIN q ON q.q_id = qc.q_id
       |  WHERE c.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, embedding, qvec,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_sim DESC, vec_id) AS rk FROM a),
       |s AS (SELECT q_id, vec_id,
       |    round(${graft.ops.LlmOps.dotSql("embedding", "qvec")}, 6) AS sim
       |  FROM r WHERE rk <= 50),
       |t AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s)
       |SELECT q_id, vec_id, sim FROM t WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  /** j23: IVF×PQ streaming serving — i71's index behind the SAME
    * harness as j21/j22 (one sink/rerank contract, three stage-1
    * probes), closing the serving story for the compression ladder:
    * per micro-batch the queries rank their learned cells (shared
    * stage-0 code against the shared centroid artifact), and the probe
    * reads nprobe DIRECTORIES of 8-BYTE codes ranked by the integer
    * ADC — the shape whose per-batch bytes a 100 TB serving fleet
    * actually pays, ~20× below j22's SQ8 probe at the same nprobe.
    * All three artifacts are the i67/i69/i71 builds (no retrain per
    * batch, no re-encode). Oracle: j22's chain with the ADC as the
    * within-cell approx metric (integer end to end), same cuts, same
    * exact top-3 re-rank.
    */
  /** j24: RESIDUAL IVF-PQ streaming serving — i75's index behind the
    * same micro-batch harness as j21–j23 (one shared fixture of
    * arriving queries, one re-rank/sink shape): per batch, the learned
    * cells prune the scan to the batch's cell union (partition filter),
    * the per-query 2,048-row integer ADC tables rank the 8-byte
    * RESIDUAL codes map-side, and the per-(query, cell) centroid term
    * re-bases scores across cells — i76 certifies this exact chain at
    * recall ≥ the flat index's, so this is the serving mode a
    * deployment actually runs. Oracle: j23's chain with the residual
    * mirrors swapped in.
    */
  val j24_stream_ann_rivfpq = OpQuery(
    (s, d) => {
      val idx = graft.ops.LlmOps.pqrWriteIndex(s, d)
      val cent = graft.ops.LlmOps.sq8IvfCentDir(
        graft.ops.LlmOps.sq8WriteIndexKmeans(s, d))
      // statics once per op (r14 verdict #2): centroid + codebook
      // frames held across batches, one lazy index scan handle
      val centDf = s.read.parquet(cent).localCheckpoint()
      val cbDf = s.read.parquet(graft.ops.LlmOps.pqrCbDir(idx))
        .localCheckpoint()
      val idxDf = s.read.parquet(idx)
      streamAnnServeWith(s, d, "j24", qb =>
        graft.ops.LlmOps.pqrBatchTop(s, idx, cent,
            qb.withColumn("qq",
              expr("transform(qvec, x -> CAST(floor(x * 1000) AS BIGINT))")),
            50, centDf = Some(centDf), cbDf = Some(cbDf),
            idxDf = Some(idxDf))
          .join(broadcast(qb), Seq("q_id"))
          .select("q_id", "vec_id", "qvec"))
    },
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |${graft.ops.LlmOps.lloydCteSql("maxabs > 0")},
       |${graft.ops.LlmOps.pqrCteSql},
       |qs AS (SELECT vec_id AS q_id, embedding AS qvec,
       |         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qq
       |       FROM m WHERE vec_id % 101 = 3 AND maxabs > 0),
       |qx AS (SELECT q_id, r.i AS pos, qvec[r.i]::DOUBLE AS qv
       |       FROM qs, range(1,65) r(i)),
       |csim AS (SELECT q_id, centkm.label, round(sum(c * qv), 6) AS s
       |         FROM centkm JOIN qx USING (pos) GROUP BY 1, 2),
       |qc AS (SELECT q_id, label FROM (
       |         SELECT q_id, label, row_number() OVER (PARTITION BY q_id
       |           ORDER BY s DESC, label) AS rk FROM csim) WHERE rk <= 2),
       |rdtq AS (SELECT qs.q_id, rm1.sub, rm1.cid,
       |          sum(qs.qq[rm1.sub * ${graft.ops.LlmOps.PqDsub} + rm1.pos] * rm1.cv_i) AS ds
       |        FROM rm1, qs GROUP BY 1, 2, 3),
       |cdtq AS (SELECT qs.q_id, c1.cid AS cell,
       |          list_sum(list_transform(range(1, len(c1.cv) + 1),
       |            i -> qs.qq[i] * c1.cv[i])) AS cd
       |        FROM c1, qs),
       |apr AS (SELECT rdtq.q_id, rcd.vec_id, cdtq.cd + sum(rdtq.ds) AS approx_i
       |        FROM rcd JOIN rdtq ON rcd.sub = rdtq.sub AND rcd.cid = rdtq.cid
       |             JOIN cellkm ON cellkm.vec_id = rcd.vec_id
       |             JOIN qc ON qc.q_id = rdtq.q_id AND qc.label = cellkm.cid
       |             JOIN cdtq ON cdtq.q_id = rdtq.q_id AND cdtq.cell = cellkm.cid
       |        WHERE rcd.vec_id <> rdtq.q_id
       |        GROUP BY rdtq.q_id, rcd.vec_id, cdtq.cd),
       |pr AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_i DESC, vec_id) AS rk FROM apr) WHERE rk <= 50),
       |s2 AS (SELECT pr.q_id, pr.vec_id,
       |         round(${graft.ops.LlmOps.dotSql("e.embedding", "qs.qvec")}, 6) AS sim
       |       FROM pr JOIN embeddings e USING (vec_id) JOIN qs USING (q_id)),
       |t2 AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s2)
       |SELECT q_id, vec_id, sim FROM t2 WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  /** j27: residual serving WITH the delete path — the r13 verdict #3's
    * serving tier: i84 gave the production index its tombstones in
    * batch, but a deployment serves it through j24, so the SERVING
    * probe must honor the deletion log too or a takedown stays
    * queryable exactly where it matters. Same micro-batch chain as j24
    * with the tombstone side table (loaded once, broadcast, captured by
    * the closure — never re-read per batch) anti-joined out of the
    * codes scan BEFORE the rank window (pqrBatchTop's tombstones hook;
    * filtering after the cut returns short exactly when a deleted
    * vector ranked high — the i73/i74 rule). At 100 TB the log is
    * i74's small side table (a bloom filter once it grows) and the
    * per-batch cost is one broadcast hash probe per candidate on an
    * otherwise byte-identical plan. Oracle: j24's chain with the
    * tombstone predicate on the candidate pool.
    */
  val j27_stream_ann_rivfpq_tomb = OpQuery(
    (s, d) => {
      val idx = graft.ops.LlmOps.pqrWriteIndex(s, d)
      val cent = graft.ops.LlmOps.sq8IvfCentDir(
        graft.ops.LlmOps.sq8WriteIndexKmeans(s, d))
      val tomb = t(s, d, "embeddings")
        .filter(col("vec_id") % 13 === 2).select("vec_id")
        .localCheckpoint() // the deletion log: loaded once, not per batch
      // statics once per op (r14 verdict #2), same shape as j24
      val centDf = s.read.parquet(cent).localCheckpoint()
      val cbDf = s.read.parquet(graft.ops.LlmOps.pqrCbDir(idx))
        .localCheckpoint()
      val idxDf = s.read.parquet(idx)
      streamAnnServeWith(s, d, "j27", qb =>
        graft.ops.LlmOps.pqrBatchTop(s, idx, cent,
            qb.withColumn("qq",
              expr("transform(qvec, x -> CAST(floor(x * 1000) AS BIGINT))")),
            50, tombstones = Some(tomb), centDf = Some(centDf),
            cbDf = Some(cbDf), idxDf = Some(idxDf))
          .join(broadcast(qb), Seq("q_id"))
          .select("q_id", "vec_id", "qvec"))
    },
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |${graft.ops.LlmOps.lloydCteSql("maxabs > 0")},
       |${graft.ops.LlmOps.pqrCteSql},
       |qs AS (SELECT vec_id AS q_id, embedding AS qvec,
       |         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qq
       |       FROM m WHERE vec_id % 101 = 3 AND maxabs > 0),
       |qx AS (SELECT q_id, r.i AS pos, qvec[r.i]::DOUBLE AS qv
       |       FROM qs, range(1,65) r(i)),
       |csim AS (SELECT q_id, centkm.label, round(sum(c * qv), 6) AS s
       |         FROM centkm JOIN qx USING (pos) GROUP BY 1, 2),
       |qc AS (SELECT q_id, label FROM (
       |         SELECT q_id, label, row_number() OVER (PARTITION BY q_id
       |           ORDER BY s DESC, label) AS rk FROM csim) WHERE rk <= 2),
       |rdtq AS (SELECT qs.q_id, rm1.sub, rm1.cid,
       |          sum(qs.qq[rm1.sub * ${graft.ops.LlmOps.PqDsub} + rm1.pos] * rm1.cv_i) AS ds
       |        FROM rm1, qs GROUP BY 1, 2, 3),
       |cdtq AS (SELECT qs.q_id, c1.cid AS cell,
       |          list_sum(list_transform(range(1, len(c1.cv) + 1),
       |            i -> qs.qq[i] * c1.cv[i])) AS cd
       |        FROM c1, qs),
       |apr AS (SELECT rdtq.q_id, rcd.vec_id, cdtq.cd + sum(rdtq.ds) AS approx_i
       |        FROM rcd JOIN rdtq ON rcd.sub = rdtq.sub AND rcd.cid = rdtq.cid
       |             JOIN cellkm ON cellkm.vec_id = rcd.vec_id
       |             JOIN qc ON qc.q_id = rdtq.q_id AND qc.label = cellkm.cid
       |             JOIN cdtq ON cdtq.q_id = rdtq.q_id AND cdtq.cell = cellkm.cid
       |        WHERE rcd.vec_id <> rdtq.q_id AND rcd.vec_id % 13 <> 2
       |        GROUP BY rdtq.q_id, rcd.vec_id, cdtq.cd),
       |pr AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_i DESC, vec_id) AS rk FROM apr) WHERE rk <= 50),
       |s2 AS (SELECT pr.q_id, pr.vec_id,
       |         round(${graft.ops.LlmOps.dotSql("e.embedding", "qs.qvec")}, 6) AS sim
       |       FROM pr JOIN embeddings e USING (vec_id) JOIN qs USING (q_id)),
       |t2 AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s2)
       |SELECT q_id, vec_id, sim FROM t2 WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  val j23_stream_ann_ivfpq = OpQuery(
    (s, d) => {
      val idx = graft.ops.LlmOps.pqIvfWriteIndex(s, d)
      val cb = graft.ops.LlmOps.pqCbDir(graft.ops.LlmOps.pqWriteIndex(s, d))
      val cent = graft.ops.LlmOps.sq8IvfCentDir(
        graft.ops.LlmOps.sq8WriteIndexKmeans(s, d))
      // statics once per op (r14 verdict #2): centroid + codebook
      // frames held across batches, one lazy index scan handle
      val centDf = s.read.parquet(cent).localCheckpoint()
      val cbDf = s.read.parquet(cb).localCheckpoint()
      val idxDf = s.read.parquet(idx)
      streamAnnServeWith(s, d, "j23",
        qb => pqIvfBatchStage1(s, idx, cb, cent, qb,
          centDf = Some(centDf), cbDf = Some(cbDf), idxDf = Some(idxDf)))
    },
    s"""WITH m AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
       |  FROM embeddings),
       |${graft.ops.LlmOps.lloydCteSql("maxabs > 0")},
       |${graft.ops.LlmOps.pqCteSql},
       |qs AS (SELECT vec_id AS q_id, embedding AS qvec,
       |         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qq
       |       FROM m WHERE vec_id % 101 = 3 AND maxabs > 0),
       |qx AS (SELECT q_id, r.i AS pos, qvec[r.i]::DOUBLE AS qv
       |       FROM qs, range(1,65) r(i)),
       |csim AS (SELECT q_id, centkm.label, round(sum(c * qv), 6) AS s
       |         FROM centkm JOIN qx USING (pos) GROUP BY 1, 2),
       |qc AS (SELECT q_id, label FROM (
       |         SELECT q_id, label, row_number() OVER (PARTITION BY q_id
       |           ORDER BY s DESC, label) AS rk FROM csim) WHERE rk <= 2),
       |dtq AS (SELECT qs.q_id, pm1.sub, pm1.cid,
       |          sum(qs.qq[pm1.sub * ${graft.ops.LlmOps.PqDsub} + pm1.pos] * pm1.cv_i) AS ds
       |        FROM pm1, qs GROUP BY 1, 2, 3),
       |ap AS (SELECT dtq.q_id, cd.vec_id, sum(dtq.ds) AS approx_i
       |       FROM cd JOIN dtq ON cd.sub = dtq.sub AND cd.cid = dtq.cid
       |            JOIN cellkm ON cellkm.vec_id = cd.vec_id
       |            JOIN qc ON qc.q_id = dtq.q_id AND qc.label = cellkm.cid
       |       WHERE cd.vec_id <> dtq.q_id
       |       GROUP BY 1, 2),
       |pr AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx_i DESC, vec_id) AS rk FROM ap) WHERE rk <= 50),
       |s2 AS (SELECT pr.q_id, pr.vec_id,
       |         round(${graft.ops.LlmOps.dotSql("e.embedding", "qs.qvec")}, 6) AS sim
       |       FROM pr JOIN embeddings e USING (vec_id) JOIN qs USING (q_id)),
       |t2 AS (SELECT q_id, vec_id, sim, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rk FROM s2)
       |SELECT q_id, vec_id, sim FROM t2 WHERE rk <= 3
       |ORDER BY q_id, vec_id""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "j23_stream_ann_ivfpq" -> j23_stream_ann_ivfpq,
    "j24_stream_ann_rivfpq" -> j24_stream_ann_rivfpq,
    "j27_stream_ann_rivfpq_tomb" -> j27_stream_ann_rivfpq_tomb,
    "j22_stream_ann_kmeans" -> j22_stream_ann_kmeans,
    "j21_stream_ann_ivf" -> j21_stream_ann_ivf,
    "j20_stream_ann" -> j20_stream_ann,
    "j19_stream_image_dedup" -> j19_stream_image_dedup,
    "j18_stream_xmatch_best" -> j18_stream_xmatch_best,
    "j17_stream_update_dedup" -> j17_stream_update_dedup,
    "j25_stream_late_dedup" -> j25_stream_late_dedup,
    "j26_stream_late_neardup" -> j26_stream_late_neardup,
    "j16_stream_chunk" -> j16_stream_chunk,
    "j15_stream_xmatch" -> j15_stream_xmatch,
    "j14_stream_perplexity_gate" -> j14_stream_perplexity_gate,
    "j13_stream_decontaminate" -> j13_stream_decontaminate,
    "j12_stream_incremental_dedup" -> j12_stream_incremental_dedup,
    "j11_stream_quality_filter" -> j11_stream_quality_filter,
    "j10_transform_with_state" -> j10_transform_with_state,
    "j9_stream_ingest_dedup" -> j9_stream_ingest_dedup,
    "j8_stream_stream_join" -> j8_stream_stream_join,
    "j7_stateful_custom" -> j7_stateful_custom,
    "j1_tumbling_window" -> j1_tumbling_window,
    "j2_sliding_window" -> j2_sliding_window,
    "j3_session_window" -> j3_session_window,
    "j4_watermark_late" -> j4_watermark_late,
    "j5_stateful_dedup" -> j5_stateful_dedup,
    "j6_stream_agg_sink" -> j6_stream_agg_sink)
}
