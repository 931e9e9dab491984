package graft

/** Throwaway diagnostic: spark.sql.adaptive.coalescePartitions.parallelismFirst
  * true (default) vs false, interleaved in ONE JVM at the bench core count.
  */
object PfProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("e2_agg_groupby", "d8_join_multiway_star",
      "f2_win_topk_per_group", "e5_agg_rollup_cube", "j1_tumbling_window",
      "i6_sim_pairwise_topk", "i1_text_tokenize_count",
      "i74_ann_tombstone", "i64_sim_ann_ivf_sq8", "d6_join_theta_range",
      "i5_dedup_near_jaccard", "e11_pivot", "f4_win_running_frame",
      "g4_intersect_except", "h9_json_extract")
    val qs = keys.map(k => k -> SparkEntry.queries(k))
    val flag = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    for (v <- Seq("true", "false")) { // warm both arms
      spark.conf.set(flag, v); qs.foreach(_._2(spark, d).count())
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (rep <- 1 to 5; v <- Seq("true", "false")) {
      spark.conf.set(flag, v)
      qs.foreach { case (k, fn) =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        acc((k, v)) = (System.nanoTime() - t0) / 1e9 :: acc.getOrElse((k, v), Nil)
      }
    }
    var tT = 0.0; var tF = 0.0
    keys.foreach { k =>
      val t = Util.median(acc((k, "true"))); val f = Util.median(acc((k, "false")))
      tT += t; tF += f
      println(f"[pf] $k%-28s pfTrue=$t%.3f pfFalse=$f%.3f delta=${f - t}%+.3f")
    }
    println(f"[pf] TOTAL pfTrue=$tT%.3f pfFalse=$tF%.3f")
    spark.stop()
  }
}
