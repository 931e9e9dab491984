package graft

import graft.functions.{DotProduct, HammingDistanceAscii, HaversineMilli,
  IntersectCountSorted, LshBucket64, MinHashSignature, ShingleHashSet,
  SimHash64, SqDistLong, TokenRepetitionStats, TokenTermFreq}
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

  /** Arity-checked builder (the r7 advisor nit): without the guard a SQL
    * call with the wrong argument count dies inside the builder with
    * IndexOutOfBoundsException instead of a readable signature error.
    */
  private def arity(n: Int, signature: String)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    c => {
      if (c.length != n) throw new IllegalArgumentException(
        s"expected signature $signature, got ${c.length} argument(s)")
      build(c)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> arity(2, "vec_dot(a, b)")(c => DotProduct(c(0), c(1))),
    "vec_sqdist_long" ->
      arity(2, "vec_sqdist_long(a, b)")(c => SqDistLong(c(0), c(1))),
    "intersect_count" ->
      arity(2, "intersect_count(a, b)")(c => IntersectCountSorted(c(0), c(1))),
    "vec_lsh_bucket" -> arity(1, "vec_lsh_bucket(v)")(c => LshBucket64(c(0))),
    "minhash_signature" ->
      arity(1, "minhash_signature(hashes)")(c => MinHashSignature(c(0))),
    "simhash64" -> arity(1, "simhash64(hashes)")(c => SimHash64(c(0))),
    "shingle_hash_set" ->
      arity(1, "shingle_hash_set(tokens)")(c => ShingleHashSet(c(0))),
    "token_repetition_stats" ->
      arity(1, "token_repetition_stats(tokens)")(c => TokenRepetitionStats(c(0))),
    "token_term_freq" ->
      arity(1, "token_term_freq(tokens)")(c => TokenTermFreq(c(0))),
    "hamming_ascii" ->
      arity(2, "hamming_ascii(a, b)")(c => HammingDistanceAscii(c(0), c(1))),
    "sphere_haversine" ->
      arity(4, "sphere_haversine(ra_a, dec_a, ra_b, dec_b)")(c =>
        HaversineMilli(c(0), c(1), c(2), c(3))))

  /** Same registrations on an already-running session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
