package graft

import graft.functions.{DotProduct, HaversineMilli, IntersectCountSorted,
  LshBucket64, MinHashSignature, ShingleHashSet, SimHash64, SqDistLong,
  TokenRepetitionStats, TokenTermFreq}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §4.3 mechanism slot):
  * registers the custom Catalyst expressions as SQL functions so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works next to the Column API.
  *
  * Enable with either
  *   .config("spark.sql.extensions", "graft.GraftExtensions")  or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
  }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((c: Seq[Expression]) => DotProduct(c(0), c(1))),
    "vec_sqdist_long" -> ((c: Seq[Expression]) => SqDistLong(c(0), c(1))),
    "intersect_count" -> ((c: Seq[Expression]) => IntersectCountSorted(c(0), c(1))),
    "vec_lsh_bucket" -> ((c: Seq[Expression]) => LshBucket64(c(0))),
    "minhash_signature" -> ((c: Seq[Expression]) => MinHashSignature(c(0))),
    "simhash64" -> ((c: Seq[Expression]) => SimHash64(c(0))),
    "shingle_hash_set" -> ((c: Seq[Expression]) => ShingleHashSet(c(0))),
    "token_repetition_stats" -> ((c: Seq[Expression]) => TokenRepetitionStats(c(0))),
    "token_term_freq" -> ((c: Seq[Expression]) => TokenTermFreq(c(0))),
    "sphere_haversine" -> ((c: Seq[Expression]) =>
      HaversineMilli(c(0), c(1), c(2), c(3))))

  /** Same registrations on an already-running session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
