package graft

import graft.corpus.PrepMain
import graft.ops.LlmOps
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics: the composed stages must agree with the
  * individual gated operators they are built from, and the output layout
  * must be a valid operator input itself.
  */
class PrepPipelineSpec extends SparkTestBase {

  private lazy val outDir = Util.scratch("prep_out")
  private lazy val manifest =
    PrepMain.run(spark, PrepMain.Opts(sfDir, outDir, "minhash"))

  /** Every test forces this first: with only test 1 touching the lazy
    * `manifest`, running a later test in isolation (testOnly -z) would
    * read an output dir the pipeline never wrote.
    */
  private def pipelineRan(): Unit = assert(manifest.nonEmpty)

  test("manifest counts are internally consistent") {
    assert(manifest("n_input") > 0)
    assert(manifest("n_quality_kept") <= manifest("n_input"))
    assert(manifest("n_final") <= manifest("n_quality_kept"))
    // the stage counts must reconcile exactly
    assert(manifest("n_quality_kept") - manifest("n_dedup_dropped") ==
      manifest("n_final"), "stage arithmetic doesn't reconcile")
    assert(manifest("n_dedup_dropped") <= manifest("n_dup_members_corpus"),
      "stage can't drop more than the corpus-wide pair-member set")
    // verdict histogram partitions the input
    val verdictTotal = manifest.collect {
      case (k, v) if k.startsWith("verdict_") => v
    }.sum
    assert(verdictTotal == manifest("n_input"), "verdicts don't partition input")
    // split histogram partitions the output
    val splitTotal = manifest.collect {
      case (k, v) if k.startsWith("split_") => v
    }.sum
    assert(splitTotal == manifest("n_final"), "splits don't partition output")
  }

  test("output dir is a valid operator input and the kept set is pair-free") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    assert(written.columns.contains("split") && written.columns.contains("shard"))
    // re-run the SAME gated dedup operator ON the output: every detected
    // pair had its right member dropped, so the kept set must be pair-free
    val residual = LlmOps.i10_dedup_minhash_lsh.fn(spark, outDir).count()
    assert(residual == 0, s"$residual duplicate pairs survived the pipeline")
  }

  test("every kept doc has verdict keep and is not a dropped pair member") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    val verdicts = LlmOps.i29_quality_filter.fn(spark, sfDir)
      .select(col("doc_id"), col("verdict"))
    val nonKeep = written.join(verdicts, "doc_id")
      .filter(col("verdict") =!= "keep").count()
    assert(nonKeep == 0, "a non-keep doc leaked into the output")
    val drops = LlmOps.i10_dedup_minhash_lsh.fn(spark, sfDir)
      .select(col("b_id").as("doc_id")).distinct()
    assert(written.join(drops, "doc_id").count() == 0, "a dropped dup leaked")
  }

  test("per-shard positions are dense 1..n over the kept set") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    val bad = written.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
      .count()
    assert(bad == 0, "shard positions not dense")
  }

  test("manifest.json exists and parses as flat key:number pairs") {
    pipelineRan()
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/manifest.json")))
    assert(txt.startsWith("{") && txt.trim.endsWith("}"))
    val pairs = txt.linesIterator.filter(_.contains(":")).toSeq
    assert(pairs.nonEmpty)
    pairs.foreach { l =>
      assert(l.matches("""\s*"[a-z_]+": \d+,?\s*"""), s"bad manifest line: $l")
    }
  }

  test("argv parsing: flags map to opts, bad input rejected") {
    val o = PrepMain.parse(Array("--in", "a", "--out", "b", "--dedup", "none"))
    assert(o == PrepMain.Opts("a", "b", "none"))
    intercept[IllegalArgumentException](PrepMain.parse(Array("--in", "a")))
    intercept[IllegalArgumentException](PrepMain.parse(Array("--bogus", "x")))
    // dangling flag (value forgotten) must give the usage error, not AIOOBE
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out")))
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--dedup", "simhash")))
  }
}
