package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Signature expressions for near-dup detection. Both take the PRE-HASHED
  * element array (xxhash64 per shingle/token — one pass, codegen'd) and
  * produce the whole signature in one narrow loop per row.
  *
  * Why not explode + groupBy: a 64-permutation minhash via 64 min()
  * aggregates costs an explode (|elements| rows), a shuffle, and a 64-slot
  * aggregation buffer per group — measured ~7s at sf0.1. This expression is
  * a map-side O(|elements| × 64) register loop: no shuffle, no state, scales
  * linearly with document count and parallelizes per split.
  */
abstract class SignatureExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects array<bigint> (pre-hashed elements), got $t")
  }
  // Null elements (and, where noted, empty inputs) have no well-defined
  // signature — the LshBucket64 standard: return NULL rather than silently
  // folding null to hash 0 (an engine-specific bias a SQL oracle rebuilding
  // the signature would NULL-poison instead). The repo's own callers feed
  // non-null hash arrays; this is for the SQL-registered surface.
  override def nullable: Boolean = true
}

/** 64 minhashes of a hashed-element set: mh_j = min_e pmod(pmod(e, M)·A_j +
  * B_j, P). Affine constants stay < 2^31 and the pre-reduction domain < 2^20·
  * keeps every intermediate < 2^52 (ANSI-overflow-safe).
  */
case class MinHashSignature(child: Expression) extends SignatureExpression {
  import MinHashSignature._

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // An empty set has no minimum (all-MaxValue would make every empty doc
  // band-identical — an O(k²) spurious LSH clique); null elements fold to
  // no defined hash. Both return NULL (nullable in the base class).
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](NumHashes)
    var j = 0
    while (j < NumHashes) { out(j) = Long.MaxValue; j += 1 }
    i = 0
    while (i < n) {
      val hm = java.lang.Math.floorMod(arr.getLong(i), M)
      j = 0
      while (j < NumHashes) {
        val v = java.lang.Math.floorMod(hm * (ABase + AStep * j) + BStep.toLong * j + B0, P)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val hm = ctx.freshName("hm"); val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n == 0);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$NumHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hm = java.lang.Math.floorMod($a.getLong($i), ${M}L);
         |    for (int $j = 0; $j < $NumHashes; $j++) {
         |      long $v = java.lang.Math.floorMod(
         |        $hm * (${ABase}L + ${AStep}L * $j) + ${BStep}L * $j + ${B0}L, ${P}L);
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val NumHashes = 64
  val M = 1000003L       // pre-reduction domain
  val P = 2038074743L    // prime < 2^31
  val ABase = 976369L; val AStep = 104729L
  val B0 = 12345L; val BStep = 981203L
}

/** 64-bit SimHash from hashed tokens (with multiplicity): bit k of the
  * signature is set iff Σ_tokens (bit_k(hash) ? +1 : −1) > 0.
  */
case class SimHash64(child: Expression) extends SignatureExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  // Null elements → NULL (base-class standard); a null would otherwise
  // vote −1 on all 64 bits (hash 0), silently biasing the signature where
  // a SQL oracle NULL-poisons. Empty input keeps its defined value
  // (all votes −1 ⇒ signature 0, same as the summation oracle form).
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $votes = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $a.getLong($i);
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ($votes[$k] > 0) $sig |= (1L << $k);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Sorted distinct 2-gram shingle hashes straight from the token array:
  * hash each token's UTF-8 bytes once (xxhash64), mix consecutive pairs,
  * sort, dedup in place — one compiled pass per row producing the
  * array<bigint> that i5/i10 intersect and minhash.
  *
  * The composed pipeline this replaces (concat shingle strings →
  * array_distinct over strings → xxhash64 per string → sort_array)
  * allocates one UTF8String per shingle and dedups via a string hash set;
  * here the only allocation is the output long[]. Hash VALUES differ from
  * the string formulation (pair-mix vs hash-of-concat) — that is internal:
  * both sides of every jaccard use the same representation, and collisions
  * (~|sh|²/2⁶⁴) are as negligible as before. Docs with < 2 tokens yield an
  * empty set (same guard as the string `shingles`).
  */
case class ShingleHashSet(child: Expression) extends UnaryExpression {

  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashSet.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** The ONE definition of the token-hash/bigram-mix kernel that
  * ShingleHashSet and TokenRepetitionStats both document as "the same
  * hashed representation" — a shared helper so the must-stay-bit-identical
  * pieces (xxhash64 seed, null→0 convention, order-sensitive pair mix)
  * cannot drift between the two compute loops.
  */
private[functions] object TokenHashKernel {
  final val Seed = 1L
  /** Per-token hash of the UTF-8 bytes; null tokens hash to 0L. */
  def hashToken(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) 0L
    else {
      val s = arr.getUTF8String(i)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
    }
  /** Order-sensitive bigram mix (second hash as the seed). */
  def mixBigram(a: Long, b: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(a, b)
}

object ShingleHashSet {
  /** Static entry point shared by eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    // per-token hash of the UTF-8 bytes, one pass
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = TokenHashKernel.hashToken(arr, i)
      i += 1
    }
    // pair mix: xxhash64-style avalanche over (h_i, h_{i+1})
    val out = new Array[Long](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = TokenHashKernel.mixBigram(th(i), th(i + 1))
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place on the sorted array
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out
      else java.util.Arrays.copyOf(out, w))
  }
}

/** One-pass repetition statistics from the token array for the Gopher-class
  * quality filters (i27): returns [distinct-token count, max bigram
  * frequency] as array<bigint>. Same hashed representation as
  * ShingleHashSet (per-token xxhash64, order-sensitive pair mix for
  * bigrams); distinctness/frequency over hashes instead of strings — the
  * usual ~n²/2⁶⁴ collision argument vs the string oracle. Replaces an
  * explode + two groupBys (the top-frequency-per-doc shape) with a narrow
  * map: sort the hashes, count runs — no shuffle at any scale.
  */
case class TokenRepetitionStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_repetition_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenRepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenRepetitionStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenRepetitionStats =
    copy(child = newChild)
}

object TokenRepetitionStats {
  /** Static entry point shared by eval and generated code. Null tokens
    * hash to 0L in the bigram mix (the ShingleHashSet precedent) but are
    * EXCLUDED from the distinct-token count — matching the DuckDB
    * `list_distinct` oracle formulation, which drops NULLs (unreachable
    * from i27's split()-derived tokens, but this function is SQL-exposed).
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val th = new Array[Long](n)
    val nn = new Array[Long](n) // hashes of non-null tokens only
    var nonNull = 0
    var i = 0
    while (i < n) {
      th(i) = TokenHashKernel.hashToken(arr, i)
      if (!arr.isNullAt(i)) { nn(nonNull) = th(i); nonNull += 1 }
      i += 1
    }
    // bigram hashes BEFORE the count paths sort anything (pair mix is
    // order-sensitive)
    val bg = if (n < 2) Array.emptyLongArray else {
      val b = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        b(i) = TokenHashKernel.mixBigram(th(i), th(i + 1))
        i += 1
      }
      b
    }
    new GenericArrayData(Array(
      distinctCount(java.util.Arrays.copyOf(nn, nonNull)), maxRun(bg)))
  }

  private def distinctCount(a: Array[Long]): Long = {
    if (a.isEmpty) return 0L
    java.util.Arrays.sort(a)
    var c = 1L; var i = 1
    while (i < a.length) { if (a(i) != a(i - 1)) c += 1; i += 1 }
    c
  }

  private def maxRun(a: Array[Long]): Long = {
    if (a.isEmpty) return 0L
    java.util.Arrays.sort(a)
    var best = 1L; var run = 1L; var i = 1
    while (i < a.length) {
      if (a(i) == a(i - 1)) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}

/** Per-document term frequencies in one narrow pass (i31): token array →
  * array<struct<tok, tf>> over the DISTINCT tokens, sorted by token. Term
  * frequency is row-local information, so computing it here (instead of
  * explode + groupBy(doc_id, tok)) deletes the corpus-sized tf shuffle
  * from the term-weighting pipeline — only the vocabulary-sized df
  * aggregate still moves (the ShingleHashSet/TokenRepetitionStats rule:
  * per-row collection pipelines belong in a compiled expression). Empty
  * and null tokens are skipped, matching the oracle's `tok <> ''` filter.
  */
case class TokenTermFreq(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_term_freq"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenTermFreq.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenTermFreq.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenTermFreq =
    copy(child = newChild)
}

object TokenTermFreq {
  /** Static entry point shared by eval and generated code. Input
    * UTF8Strings may alias a reused scan buffer, so kept keys are cloned.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.TreeMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) {
          // clone only FIRST-SEEN keys: Map.put keeps the existing (cloned)
          // key on hit, so repeat occurrences need no byte-array copy —
          // merge(s.clone(), …) cloned per OCCURRENCE in the per-row loop
          val prev = counts.get(s)
          if (prev == null) counts.put(s.clone(), java.lang.Long.valueOf(1L))
          else counts.put(s, java.lang.Long.valueOf(prev.longValue + 1L))
        }
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    var w = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(w) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue.longValue)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** One-pass hashed bag-of-tokens feature vector (i47): D bucket counts +
  * a trailing bias 1, bucket = (Σᵢ i·code(charᵢ)) % D per token — the
  * engine-portable position·charcode hash the i47 oracle recomputes in
  * SQL. Empty tokens are dropped (the `length(w) > 0` guard folded in).
  * Replaces a transform/aggregate/filter lambda chain that paid boxed
  * HOF evaluation per CHARACTER; this is one codegen'd loop per doc.
  */
case class HashedBagOfTokens(child: Expression, d: Int)
  extends UnaryExpression {

  // plan-time, not task-time: d <= 0 would otherwise surface as a
  // floorMod-by-zero ArithmeticException deep inside an executor task
  require(d >= 1, s"hashed_bag_of_tokens needs d >= 1 buckets, got $d")

  override def prettyName: String = "hashed_bag_of_tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> (tokens), got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashedBagOfTokens.compute(input.asInstanceOf[ArrayData], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedBagOfTokens.compute($a, $d);")

  override protected def withNewChildInternal(newChild: Expression): HashedBagOfTokens =
    copy(child = newChild)
}

object HashedBagOfTokens {
  def compute(arr: ArrayData, d: Int): ArrayData = {
    val counts = new Array[Long](d + 1)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        // numBytes gate BEFORE toString: empty tokens (the common split()
        // artifact) skip the per-token UTF-8 decode + String allocation
        if (u.numBytes() > 0) {
          val s = u.toString
          // iterate CODE POINTS, not UTF-16 units: the SQL form this
          // kernel replaced (`ascii(substring(w, i, 1))` over `length(w)`)
          // and the DuckDB oracle (`ascii(w[i])` over `len(w)`) both count
          // per code point, so a supplementary character must be ONE
          // position with its full code-point value — charAt/length would
          // silently diverge from the oracle on non-BMP text
          var h = 0L
          var j = 0
          var pos = 1
          while (j < s.length) {
            val cp = s.codePointAt(j)
            h += pos.toLong * cp
            j += Character.charCount(cp)
            pos += 1
          }
          // floorMod, not %: h accumulates pos·codePoint unguarded, so a
          // pathological multi-million-char token can overflow Long into
          // the negatives; % would then index negative and crash the task
          // (where the SQL HOF form it replaced merely degraded silently).
          // In the non-overflow regime floorMod ≡ % on a non-negative h,
          // so the bucket only differs where the two forms already diverge.
          counts(java.lang.Math.floorMod(h, d)) += 1L
        }
      }
      i += 1
    }
    counts(d) = 1L // bias feature
    new GenericArrayData(counts)
  }
}

/** Allocation-free byte-hamming kernel shared by the interpreted and
  * generated paths of `HammingDistanceAscii` (the SphereMath convention:
  * one static helper, bit-identical from both entry points).
  */
object HammingOps {
  def hammingAscii(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = a.numBytes()
    if (n != b.numBytes())
      throw new IllegalArgumentException(
        s"hamming_ascii needs equal-length keys, got $n vs ${b.numBytes()} bytes")
    var i = 0
    var d = 0L
    while (i < n) {
      if (a.getByte(i) != b.getByte(i)) d += 1L
      i += 1
    }
    d
  }
}

/** Per-character hamming distance of two equal-length ASCII keys (hex
  * fingerprints, digit strings) as ONE codegen'd call.
  *
  * Why an expression and not the SQL HOF
  * `size(filter(sequence(1, n), i -> substring(a,i,1) <> substring(b,i,1)))`
  * it replaced: higher-order functions run INTERPRETED (a lambda eval +
  * two UTF8String allocations per character per row) — measured 5.4 s
  * for the refine over m10's 308k candidate rows at sf0.1 vs 0.4 s for
  * the candidate join itself. This node is an allocation-free byte loop
  * inside whole-stage codegen. Byte-hamming equals the HOF's
  * char-hamming exactly on the ASCII keys the blocked-join contract
  * supplies (hex/digit fingerprints); non-ASCII input would diverge, so
  * callers own that contract. Unequal lengths throw rather than guess.
  */
case class HammingDistanceAscii(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "hamming_ascii"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_ascii expects (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingOps.hammingAscii(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingOps.hammingAscii($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingDistanceAscii =
    copy(left = newLeft, right = newRight)
}

object HashFunctions {
  /** D hashed bag-of-tokens bucket counts + bias (i47). */
  def hashedBagOfTokens(tokens: Column, d: Int): Column =
    Bridge.column(HashedBagOfTokens(Bridge.expression(tokens), d))
  def minhashSignature(hashedElems: Column): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashedElems)))
  def simhash64(hashedTokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashedTokens)))
  /** Sorted distinct consecutive-pair shingle hashes from a token array. */
  def shingleHashSet(tokens: Column): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(tokens)))
  /** [distinct-token count, max bigram frequency] from a token array. */
  def tokenRepetitionStats(tokens: Column): Column =
    Bridge.column(TokenRepetitionStats(Bridge.expression(tokens)))
  /** Distinct (tok, tf) pairs from a token array, sorted by token. */
  def tokenTermFreq(tokens: Column): Column =
    Bridge.column(TokenTermFreq(Bridge.expression(tokens)))
  /** Per-char hamming of two equal-length ASCII keys (d14/m9/m10 refine). */
  def hammingAscii(a: Column, b: Column): Column =
    Bridge.column(HammingDistanceAscii(Bridge.expression(a), Bridge.expression(b)))
}
