package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Throwaway diagnostic: run j25's shape once and print per-batch
  * progress durations (where does each micro-batch's time go).
  */
object StreamProbeMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.StreamOps
    // warm-up: one full j25 run
    val t0 = System.nanoTime()
    StreamOps.j25_stream_late_dedup.fn(spark, d).count()
    println(f"[probe] warm j25 total ${(System.nanoTime()-t0)/1e9}%.2f s")
    // instrumented second run: replicate the op but keep the query handle
    val ckpt = new java.io.File(graft.Util.scratch("ckpt_j25probe"))
    graft.Util.deleteRecursively(ckpt)
    val sink = new java.io.File(graft.Util.scratch("j25probe_sink"))
    graft.Util.deleteRecursively(sink)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(privateSrc(spark, d))
    val t1 = System.nanoTime()
    val q = src.withWatermark("ts", "1 day")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val tb = System.nanoTime()
        batch.filter(col("doc_id") >= 0)
          .write.mode("overwrite")
          .parquet(s"${sink.getAbsolutePath}/epoch=$epochId")
        println(f"[probe] epoch $epochId sink write ${(System.nanoTime()-tb)/1e9}%.2f s")
      }
      .start()
    q.awaitTermination()
    println(f"[probe] instrumented run total ${(System.nanoTime()-t1)/1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs} state=${p.stateOperators.map(o =>
          s"commit=${o.commitTimeMs}ms rows=${o.numRowsTotal}").mkString(";")}")
    }
    // second instrumented run at 4 state partitions: if per-partition
    // commit time is queueing (lock/disk contention), wall drops ~8x
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val ckpt2 = new java.io.File(graft.Util.scratch("ckpt_j25probe4"))
    graft.Util.deleteRecursively(ckpt2)
    val sink2 = new java.io.File(graft.Util.scratch("j25probe4_sink"))
    graft.Util.deleteRecursively(sink2)
    val t2 = System.nanoTime()
    val q2 = src.withWatermark("ts", "1 day")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt2.getAbsolutePath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val tb = System.nanoTime()
        batch.filter(col("doc_id") >= 0)
          .write.mode("overwrite")
          .parquet(s"${sink2.getAbsolutePath}/epoch=$epochId")
        println(f"[probe4] epoch $epochId sink write ${(System.nanoTime()-tb)/1e9}%.2f s")
      }
      .start()
    q2.awaitTermination()
    println(f"[probe4] instrumented run total ${(System.nanoTime()-t2)/1e9}%.2f s")
    q2.recentProgress.foreach { p =>
      println(s"[probe4] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs} state=${p.stateOperators.map(o =>
          s"commit=${o.commitTimeMs}ms rows=${o.numRowsTotal}").mkString(";")}")
    }
    spark.stop()
  }

  private def privateSrc(s: org.apache.spark.sql.SparkSession, d: String): String = {
    // same planted stream as j25 (re-synthesized under a different key so
    // the probe cannot disturb the op's own fixture)
    graft.Util.fixtureOnce(s"j25probe_src_${d.replaceAll("[^a-zA-Z0-9]", "_")}") { p =>
      val ids = graft.Tables.t(s, d, "documents").select("doc_id")
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
  }
}
