package graft

import graft.ops.{AggOps, MisraGries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e16's two load-bearing claims, each tested independently of the oracle:
  * the Misra–Gries superset guarantee (pure-function property test over
  * randomized streams and chunkings — the aggregator's reduce/merge are
  * called directly, no Spark), and end-to-end equality with a plain-Scala
  * exact computation on the fixture (breaks any planted symmetry with the
  * SQL oracle).
  */
class MisraGriesSpec extends AnyFunSuite {

  private def runChunked(toks: Seq[String], chunks: Int, seed: Long): Map[String, Long] = {
    val rnd = new scala.util.Random(seed)
    // random chunking simulates arbitrary partitioning; random merge order
    // simulates arbitrary reduce trees
    val parts = toks.grouped(math.max(1, toks.size / chunks)).toSeq
    val partials = parts.map(_.foldLeft(MisraGries.zero)(MisraGries.reduce))
    MisraGries.finish(
      rnd.shuffle(partials).foldLeft(MisraGries.zero)(MisraGries.merge))
  }

  test("MG summary is a superset of the true heavy hitters under any partitioning") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      // zipf-ish universe: token t_i appears ~ n/i times
      val toks = rnd.shuffle((1 to 40).flatMap(i => Seq.fill(400 / i)(s"t$i")))
      val n = toks.size.toLong
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val trueHH = exact.filter { case (_, c) => c * (MisraGries.K + 1) > n }.keySet
      val summary = runChunked(toks, chunks = 1 + trial % 7, seed = trial)
      assert(summary.size <= MisraGries.K, s"summary exceeded K: ${summary.size}")
      val missing = trueHH -- summary.keySet
      assert(missing.isEmpty,
        s"trial $trial: HHs missing from MG summary: $missing (n=$n)")
    }
  }

  test("MG counts never exceed true counts (the one-sided error direction)") {
    val toks = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"w$i"))
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val summary = runChunked(toks, chunks = 5, seed = 7)
    summary.foreach { case (t, c) =>
      assert(c <= exact(t), s"MG over-counted $t: $c > ${exact(t)}")
    }
  }
}

class AggOpsSpec extends SparkTestBase {

  test("e16 output equals the exact heavy-hitter set (plain-Scala reference)") {
    val docs = Tables.t(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select("text").collect().map(_.getString(0))
    val toks = docs.flatMap(_.split(" ").filter(_.nonEmpty))
    val n = toks.length.toLong
    val expected = toks.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
      .filter { case (_, c) => c * (MisraGries.K + 1) > n }
    val got = AggOps.e16_heavy_hitters.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"e16 mismatch:\n got=$got\n exp=$expected")
    assert(expected.nonEmpty, "fixture exercises no heavy hitters — vacuous gate")
    // ...and the threshold excludes something, or the filter is vacuous too
    assert(expected.size < toks.distinct.length,
      "every token is a heavy hitter — threshold not exercised")
  }
}
