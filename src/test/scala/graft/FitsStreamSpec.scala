package graft

import graft.fits.FitsWriter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming FITS ingest (MICRO_BATCH_READ): the nightly-drop shape —
  * files appear under a glob, each trigger processes only the unseen
  * ones, offsets survive restarts through the checkpoint.
  */
class FitsStreamSpec extends SparkTestBase {

  private def writeNationSlice(dir: String, name: String, lo: Int, hi: Int): Unit = {
    val slice = Tables.t(spark, sfDir, "nation")
      .filter(col("n_nationkey") >= lo && col("n_nationkey") < hi)
      .orderBy("n_nationkey")
    FitsWriter.write(s"$dir/$name", slice.schema, slice.collect().toIndexedSeq,
      strLens = Map("n_name" -> 25))
  }

  private def runAvailableNow(glob: String, ckpt: String, out: String): Unit = {
    // parquet sink: supports checkpoint RECOVERY (memory sink does not),
    // and appends across runs — so the accumulated row count proves
    // exactly which files each run processed
    val q = spark.readStream.format("fits").load(glob)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("fits readStream processes a glob and picks up only NEW files per run") {
    val dir = "/tmp/graft_test/fits_stream"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    val ckpt = s"$dir/ckpt"
    val out = s"$dir/out"
    writeNationSlice(dir, "drop_a.fits", 0, 8)
    writeNationSlice(dir, "drop_b.fits", 8, 16)

    runAvailableNow(s"$dir/drop_*.fits", ckpt, out)
    val afterTwo = spark.read.parquet(out)
    val expectTwo = Tables.t(spark, sfDir, "nation").filter(col("n_nationkey") < 16)
    assert(afterTwo.count() == expectTwo.count())
    assert(afterTwo.exceptAll(expectTwo).count() == 0)

    // a third file lands; SAME checkpoint ⇒ the next run must process
    // EXACTLY the new file: a re-read of drop_a/drop_b would append
    // duplicates (count 41), a missed offset would leave 16
    writeNationSlice(dir, "drop_c.fits", 16, 100)
    runAvailableNow(s"$dir/drop_*.fits", ckpt, out)
    val all = spark.read.parquet(out)
    val nation = Tables.t(spark, sfDir, "nation")
    assert(all.count() == nation.count(),
      s"incremental run re-read old files or missed the new one: ${all.count()}")
    assert(all.exceptAll(nation).count() == 0 &&
      nation.exceptAll(all).count() == 0)
  }

  test("fits readStream ingests gzipped drops alongside plain ones") {
    val dir = "/tmp/graft_test/fits_stream_gz"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    writeNationSlice(dir, "drop_a.fits", 0, 8)
    // the gz member: written plain under a name OUTSIDE the glob, then
    // compressed into it (the crawl-drop shape: compressed files land)
    writeNationSlice(dir, "raw_b.fits", 8, 16)
    Util.gzipFile(s"$dir/raw_b.fits", s"$dir/drop_b.fits.gz")
    runAvailableNow(s"$dir/drop_*", s"$dir/ckpt", s"$dir/out")
    val got = spark.read.parquet(s"$dir/out")
    val expect = Tables.t(spark, sfDir, "nation").filter(col("n_nationkey") < 16)
    assert(got.count() == expect.count(),
      s"plain+gz stream ingested ${got.count()} rows")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
  }

  test("fits readStream ingests tile-compressed drops alongside plain ones") {
    val dir = "/tmp/graft_test/fits_stream_tiled"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    writeNationSlice(dir, "drop_a.fits", 0, 8)
    // the tiled member: same logical schema (J ints + 25A name), stored
    // as ZTABLE=T with tileLen 3 so the 8-row slice spans 3 tiles
    val slice = Tables.t(spark, sfDir, "nation")
      .filter(col("n_nationkey") >= 8 && col("n_nationkey") < 16)
    FitsWriter.writeTiledDataFrame(s"$dir/drop_b.fits", slice,
      tileLen = 3, strLens = Map("n_name" -> 25))
    runAvailableNow(s"$dir/drop_*", s"$dir/ckpt", s"$dir/out")
    val got = spark.read.parquet(s"$dir/out")
    val expect = Tables.t(spark, sfDir, "nation").filter(col("n_nationkey") < 16)
    assert(got.count() == expect.count(),
      s"plain+tiled stream ingested ${got.count()} rows")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
  }

  test("fits batch load accepts a glob directly") {
    // self-contained fixture — must not depend on the streaming test's dir
    val dir = "/tmp/graft_test/fits_glob_batch"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    writeNationSlice(dir, "part_a.fits", 0, 8)
    writeNationSlice(dir, "part_b.fits", 8, 100)
    val got = spark.read.format("fits").load(s"$dir/part_*.fits")
    assert(got.count() == Tables.t(spark, sfDir, "nation").count())
  }

  test("fits batch load: literal path with glob metacharacters") {
    val dir = "/tmp/graft_test/fits_glob_literal"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    // '[1]' would be a character class under glob interpretation and match
    // nothing; the literal fast-path must win
    writeNationSlice(dir, "obs[1].fits", 0, 8)
    val got = spark.read.format("fits").load(s"$dir/obs[1].fits")
    assert(got.count() == 8)
  }

  test("fits batch load: repeated path keeps append semantics (no dedupe)") {
    val dir = "/tmp/graft_test/fits_glob_repeat"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    writeNationSlice(dir, "n.fits", 0, 8)
    val p = s"$dir/n.fits"
    val got = spark.read.format("fits").load(p, p)
    assert(got.count() == 16, "each mention of a path must contribute once")
  }
}
