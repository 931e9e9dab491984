package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: split i23's cost into edge kernel vs CC loop. */
object CcProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.ops.LlmOps.i23_dedup_components.fn(spark, d).count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.LlmOps.blockedPairs(
        graft.Tables.t(spark, d, "embeddings"), (ia, ea, ib, eb) => {
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var s0 = 0.0; var k = 0
          while (k < a.length) { s0 += a(k).toDouble * b(k).toDouble; k += 1 }
          s0
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < ia.length) {
          var j = 0
          while (j < ib.length) {
            if (ia(i) < ib(j) && dot(ea(i), eb(j)) >= 0.4)
              out += ((ia(i), ib(j), 0.0))
            j += 1
          }
          i += 1
        }
        out.toSeq
      }).select(org.apache.spark.sql.functions.col("a_id").as("a_id"),
        org.apache.spark.sql.functions.col("b_id").as("b_id"))
      val n = pairs.count()
      val t1 = System.nanoTime()
      val labels = graft.ops.LlmOps.connectedComponents(spark, pairs)
      val t2 = System.nanoTime()
      val out = graft.Tables.t(spark, d, "embeddings")
        .filter(col("vec_id").isNotNull).select(col("vec_id"))
        .join(labels.withColumnRenamed("node_id", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("lbl"), col("vec_id")).as("canonical"))
        .orderBy("vec_id")
      out.count()
      val t3 = System.nanoTime()
      println(f"[ccprobe] rep$rep edges=$n kernel=${(t1-t0)/1e9}%.2f cc=${(t2-t1)/1e9}%.2f join=${(t3-t2)/1e9}%.2f")
    }
    spark.stop()
  }
}
