package graft

/** Throwaway diagnostic: per-anchor timings with AQE on vs off in ONE JVM
  * (interleaved, so window noise hits both arms equally).
  */
object AqeProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val anchors = Seq("e2_agg_groupby", "d8_join_multiway_star",
      "f2_win_topk_per_group", "e5_agg_rollup_cube", "j1_tumbling_window",
      "i6_sim_pairwise_topk", "i1_text_tokenize_count")
    val qs = anchors.map(k => k -> SparkEntry.queries(k))
    // warm both arms
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      qs.foreach(_._2(spark, d).count())
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (rep <- 1 to 5; aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      qs.foreach { case (k, fn) =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        acc((k, aqe)) = dt :: acc.getOrElse((k, aqe), Nil)
      }
    }
    def med(xs: List[Double]) = Util.median(xs)
    var tOn = 0.0; var tOff = 0.0
    anchors.foreach { k =>
      val on = med(acc((k, "true"))); val off = med(acc((k, "false")))
      tOn += on; tOff += off
      println(f"[aqe] $k%-28s on=$on%.3f off=$off%.3f delta=${on - off}%+.3f")
    }
    println(f"[aqe] TOTAL on=$tOn%.3f off=$tOff%.3f")
    spark.stop()
  }
}
