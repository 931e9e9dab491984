package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (plans/rNN/<key>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDumpMain <sfDir> <outDir> <suffix> [k1,k2,...]
  * Writes <outDir>/<key>_<suffix>.txt per key (all keys when none given).
  *
  * Streaming (j*) keys execute their micro-batch harness when the frame is
  * built, so the dumped plan is the RESULT frame's (sink readback) — the
  * batch-side plans are asserted separately in PlanAuditSpec; this main
  * still dumps them for completeness but the interesting j-plans live in
  * the spec pins.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
        println(s"[plandump] $k ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $k failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
