package graft

import org.apache.spark.sql.functions._

/** Measurement instrument (r15): A/B the serving-harness static hoist —
  * pqrBatchTop with per-call parquet side reads (the r14 shape) vs with
  * per-op hoisted frames (localCheckpointed centroid/codebook, shared
  * lazy index handle). Prints the executed stage-1 plan for both forms
  * and interleaved wall times, so a plan flip (e.g. a broadcast turning
  * into a sort-merge join because an RDD-backed side lost its size
  * statistics) is visible directly rather than inferred from bench
  * medians. Not a query path — a committed probe like Aqe/Cc/PfProbeMain.
  *
  * Usage: runMain graft.ServeProbeMain <sfDir> [reps]
  */
object ServeProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.ops.LlmOps
    val idx = LlmOps.pqrWriteIndex(s, sfDir)
    val cent = LlmOps.sq8IvfCentDir(LlmOps.sq8WriteIndexKmeans(s, sfDir))
    val e = Tables.t(s, sfDir, "embeddings")
    val qb = e.filter(col("vec_id") % 101 === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
        expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
          .as("qq"))
      .localCheckpoint()
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[serveprobe] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both paths once
    val centDf = s.read.parquet(cent).localCheckpoint()
    val cbDf = s.read.parquet(LlmOps.pqrCbDir(idx)).localCheckpoint()
    val idxDf = s.read.parquet(idx)
    println("=== plan: path-based (before) ===")
    LlmOps.pqrBatchTop(s, idx, cent, qb, 50)
      .queryExecution.executedPlan.toString.linesIterator.take(80)
      .foreach(println)
    println("=== plan: hoisted frames (after) ===")
    LlmOps.pqrBatchTop(s, idx, cent, qb, 50, centDf = Some(centDf),
        cbDf = Some(cbDf), idxDf = Some(idxDf))
      .queryExecution.executedPlan.toString.linesIterator.take(80)
      .foreach(println)
    timed("warm path")(LlmOps.pqrBatchTop(s, idx, cent, qb, 50).count())
    timed("warm hoist")(LlmOps.pqrBatchTop(s, idx, cent, qb, 50,
      centDf = Some(centDf), cbDf = Some(cbDf), idxDf = Some(idxDf)).count())
    (1 to reps).foreach { i =>
      timed(s"path  $i")(LlmOps.pqrBatchTop(s, idx, cent, qb, 50).count())
      timed(s"hoist $i")(LlmOps.pqrBatchTop(s, idx, cent, qb, 50,
        centDf = Some(centDf), cbDf = Some(cbDf), idxDf = Some(idxDf)).count())
    }
    s.stop()
  }
}
