package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (SURVEY §5.2). */
object SparkTestBase {
  // Util.sessionBuilder owns the shared config incl. disabled NTZ
  // inference: the events fixture stores ts as unannotated timestamp[us];
  // NTZ inference would surface it as TIMESTAMP_NTZ, which unix_micros
  // and streaming watermarks reject — read as TimestampType (µs, UTC
  // session), the semantics every oracle-gated query was verified under
  lazy val spark: SparkSession = Util.sessionBuilder("local[4]", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def sfDir: String = SparkTestBase.sfDir
}
