package graft.corpus

import graft.Tables
import graft.ops.{LlmOps, TrainOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** End-to-end corpus-preparation CLI — the LLM-pipeline counterpart to
  * `graft.ingest.Main` (which is the fits2db argv surface). Composes the
  * GATED operators into the standard prep chain:
  *
  *   quality filter (i29) → near-dup drop (i10 MinHash+LSH) →
  *   split assignment (i20) → shard + dense position (i21) →
  *   partitioned parquet write + JSON manifest
  *
  * No stage re-implements operator logic: verdicts, dup pairs and split
  * come from the same `OpQuery.fn`s the correctness gate hash-matches, so
  * the pipeline inherits their oracles. Output layout mirrors the input
  * table layout (`<out>/documents.parquet/split=…`), so every gated
  * operator — including i10 itself — can run ON the pipeline's output
  * (PrepPipelineSpec proves the kept set is pair-free that way).
  *
  * Dedup semantics: every pair (a < b) drops b, keyed on the FULL corpus
  * pair set, independent of the quality verdicts. That over-drops a doc
  * whose only duplicate partner was already quality-dropped — deliberate:
  * dedup must never under-drop, and making drops a function of corpus
  * content alone keeps the stage idempotent and order-independent.
  *
  * Scale posture: counts in the manifest are the only driver-side data
  * (a fixed handful of longs); everything else is joins on doc_id —
  * broadcast-able drop/verdict sides at gate scale, plain shuffles at
  * 100 TB — and one partitioned write. The shard ordinal window partitions
  * by shard (64-way parallel, same shape i21 documents).
  */
object PrepMain {

  final case class Opts(in: String, out: String, dedup: String)

  def parse(args: Array[String]): Opts = {
    var in = ""; var out = ""; var dedup = "minhash"
    var i = 0
    while (i < args.length) {
      val flag = args(i)
      if (!Set("--in", "--out", "--dedup")(flag))
        throw new IllegalArgumentException(s"unknown flag: $flag")
      if (i + 1 >= args.length)
        throw new IllegalArgumentException(s"$flag needs a value")
      flag match {
        case "--in" => in = args(i + 1)
        case "--out" => out = args(i + 1)
        case "--dedup" => dedup = args(i + 1)
      }
      i += 2
    }
    require(in.nonEmpty && out.nonEmpty, "usage: --in <tableDir> --out <dir> [--dedup minhash|none]")
    require(Set("minhash", "none")(dedup), s"--dedup must be minhash|none, got $dedup")
    Opts(in, out, dedup)
  }

  /** Runs the pipeline; returns the manifest counts (also written to
    * `<out>/manifest.json`).
    */
  def run(spark: SparkSession, opts: Opts): Map[String, Long] = {
    val docs = Tables.t(spark, opts.in, "documents")
    val nInput = docs.count()

    // -- stage 1: quality (i29 verdicts; "keep" survives) ------------------
    val verdicts = LlmOps.i29_quality_filter.fn(spark, opts.in)
      .select(col("doc_id"), col("verdict"))
    val verdictCounts = verdicts.groupBy("verdict").count()
      .collect().map(r => s"verdict_${r.getString(0)}" -> r.getLong(1)).toMap
    val keptQuality = docs.join(
      broadcast(verdicts.filter(col("verdict") === "keep").select("doc_id")), "doc_id")

    // -- stage 2: near-dup drop (i10 pairs; right member of each pair) -----
    val drops: DataFrame = opts.dedup match {
      case "minhash" => LlmOps.i10_dedup_minhash_lsh.fn(spark, opts.in)
        .select(col("b_id").as("doc_id")).distinct()
      case _ => spark.range(0).select(col("id").as("doc_id"))
    }
    val kept = keptQuality.join(broadcast(drops), Seq("doc_id"), "left_anti")

    // -- stage 3: split + shard addresses ----------------------------------
    val split = TrainOps.i20_train_split.fn(spark, opts.in).select("doc_id", "split")
    val shard = TrainOps.i21_shard_assign.fn(spark, opts.in).select("doc_id", "shard")
    // i21's dense per-shard ordinal, recomputed over the KEPT set so output
    // addresses have no gaps (same window shape: parallel across shards)
    val addressed = kept.join(split, "doc_id").join(shard, "doc_id")
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("doc_id")).cast(LongType))

    addressed.write.mode("overwrite").partitionBy("split")
      .parquet(s"${opts.out}/documents.parquet")

    // direct read, NOT Tables.t: the handle cache assumes immutable dirs,
    // and this dir was just overwritten (possibly again in the same JVM)
    val written = spark.read.parquet(s"${opts.out}/documents.parquet")
    val splitCounts = written.groupBy("split").count()
      .collect().map(r => s"split_${r.getString(0)}" -> r.getLong(1)).toMap

    // n_dedup_dropped = docs the dedup STAGE removed (so the counts
    // reconcile: quality_kept − dedup_dropped = final); the corpus-wide
    // pair-member set is reported separately — a doc can be both a b_id
    // and already quality-dropped, and must not be double-counted
    val nQualityKept = keptQuality.count()
    val nFinal = written.count()
    val manifest: Map[String, Long] = Map(
      "n_input" -> nInput,
      "n_quality_kept" -> nQualityKept,
      "n_dedup_dropped" -> (nQualityKept - nFinal),
      "n_dup_members_corpus" -> drops.count(),
      "n_final" -> nFinal) ++ verdictCounts ++ splitCounts
    val json = manifest.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": $v""" }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(opts.out))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${opts.out}/manifest.json"), json)
    manifest
  }

  def main(args: Array[String]): Unit = {
    val opts = parse(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val manifest = run(spark, opts)
      println(manifest.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(" "))
    } finally spark.stop()
  }
}
