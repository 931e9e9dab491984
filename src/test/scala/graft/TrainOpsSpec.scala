package graft

import graft.ops.TrainOps
import org.apache.spark.sql.functions._

/** Semantic properties of the training-data assembly ops — the guarantees
  * the oracle hash cannot express: split stability under dataset growth,
  * dense per-shard ordinals, packing arithmetic against a driver-side
  * recomputation.
  */
class TrainOpsSpec extends SparkTestBase {

  test("i20 split assignments are per-document stable under dataset growth") {
    // the whole point of hash splits: recompute on a SUBSET of the corpus
    // and every surviving document keeps its assignment (position- or
    // rand()-based sampling would reshuffle)
    val full = TrainOps.i20_train_split.fn(spark, sfDir)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subsetDocs = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0)
    val subset = TrainOps.i20_train_split.fn(spark, sfDir) // same op...
    // ...applied to the subset via the same expressions
    val sub = subsetDocs
      .select(col("doc_id"),
        when((col("doc_id") * 2654435761L) % 1000 < 800, "train")
          .when((col("doc_id") * 2654435761L) % 1000 < 900, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(sub.nonEmpty)
    sub.foreach { case (id, s) => assert(full(id) == s,
      s"doc $id moved from ${full(id)} to $s when the corpus shrank") }
    // and the fractions land near 80/10/10 (hash uniformity sanity)
    val n = full.size.toDouble
    val train = full.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    assert(subset.columns.contains("split")) // op surface unchanged
  }

  test("i21 shard positions are dense 1..count within every shard") {
    val out = TrainOps.i21_shard_assign.fn(spark, sfDir)
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .collect()
    assert(byShard.nonEmpty)
    byShard.foreach { r =>
      val (n, lo, hi, distinct) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 1L && hi == n && distinct == n,
        s"shard ${r.getInt(0)}: positions not dense 1..$n (lo=$lo hi=$hi distinct=$distinct)")
    }
    // (shard, pos) is a unique address for every document
    assert(out.select("shard", "pos").distinct().count() == out.count())
  }

  test("i20 plans as a pure narrow map: no Exchange before the final sort") {
    // the split itself must never shuffle — only the dump's ORDER BY may
    val plan = TrainOps.i20_train_split.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the final-sort Exchange:\n$plan")
  }

  test("i22 windows are stream-keyed, never global") {
    // an empty partitionBy would serialize the whole corpus through one
    // task at scale — the b8 lesson, asserted here for the packing window
    val plan = TrainOps.i22_seq_pack.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition") ||
      !plan.split("\n").exists(l => l.contains("Window") && l.contains("SinglePartition")),
      s"global (un-partitioned) window in plan:\n$plan")
  }

  test("i22 packing matches a driver-side recomputation of one stream") {
    val out = TrainOps.i22_seq_pack.fn(spark, sfDir)
      .filter(col("lang") === "en")
    val streams = out.select("source").distinct().collect().map(_.getString(0))
    assert(streams.nonEmpty)
    val src = streams.min
    val rows = out.filter(col("source") === src)
      .select("doc_id", "n_tok", "seq_bin", "seq_offset")
      .orderBy("doc_id").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum / 512, s"doc ${r.getLong(0)} bin")
      assert(r.getLong(3) == cum % 512, s"doc ${r.getLong(0)} offset")
      cum += r.getLong(1)
    }
    // offsets stay inside sequence capacity by construction
    assert(rows.forall(_.getLong(3) < 512))
  }

  test("i26 takes exactly the k hash-smallest docs per stratum, ranks dense") {
    val k = 50
    val out = TrainOps.i26_sample_stratified.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val all = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), (r.getLong(0) * 1099087573L) % 1000000007L))
    all.groupBy(_._2).foreach { case (lang, docs) =>
      val expect = docs.sortBy(d => (d._3, d._1)).take(k).map(_._1).toSeq
      val got = out.filter(_._2 == lang).sortBy(_._4)
      assert(got.map(_._1).toSeq == expect,
        s"$lang: sample is not the $k hash-smallest docs")
      assert(got.map(_._4).toSeq == (1L to got.size.toLong),
        s"$lang: ranks not dense 1..k")
    }
    // determinism: a second run is bit-identical (nothing random at run time)
    val again = TrainOps.i26_sample_stratified.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("i48 plans with one lang-window Exchange and a broadcast target join") {
    // the corpus-sized side must shuffle only for the per-lang window;
    // the vocabulary-sized target table must arrive by broadcast, and
    // nothing may degenerate to an all-pairs join
    val plan = TrainOps.i48_mix_apply.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"i48 lost its broadcast target join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"i48 degenerated to an all-pairs join:\n$plan")
    // exactly one BroadcastNestedLoopJoin is EXPECTED: the sanctioned
    // 1-row crossJoin(broadcast(totals)) scalar-attach idiom (the i28/j4
    // shape) — anything more means a real join degenerated
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj == 1 && plan.contains("BuildRight, Cross"),
      s"expected exactly the 1-row totals scalar-attach BNLJ, got $bnlj:\n$plan")
    // document-side DATA shuffles are the lang window and the final dump
    // sort; everything else operates on vocabulary-sized aggregates or
    // broadcasts (the count includes BroadcastExchange rows and the tiny
    // byLang/totals aggregate exchanges, hence the loose total bound —
    // a corpus-keyed join sneaking in would blow past it)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 8, s"unexpected shuffle count $exchanges:\n$plan")
  }

  test("i48 lands every lang EXACTLY on the i28 mixture target") {
    val docs = Tables.t(spark, sfDir, "documents")
    val total = docs.count()
    val nLangs = docs.select("lang").distinct().count()
    val share = total / nLangs
    val byLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = TrainOps.i48_mix_apply.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    // the integer-exact form of "matches the i28 targets": per lang,
    // effective (copy-weighted) count == least(share, 3 * n_docs) — i28's
    // n_docs * min(3, share/n_docs) with the fractional part resolved by
    // remainder instead of a float round; and vs the FLOAT i28 weight the
    // effective count sits within 1 doc (the integer-division slack)
    val eff = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    byLang.foreach { case (lang, n) =>
      val want = math.min(share, 3 * n)
      assert(eff.getOrElse(lang, 0L) == want,
        s"$lang: effective ${eff.getOrElse(lang, 0L)} != target $want")
      val w = math.min(total.toDouble / nLangs / n, 3.0) // i28's weight
      assert(math.abs(eff(lang) - n * w) <= 1.0 + 1e-9,
        s"$lang: effective ${eff(lang)} vs float target ${n * w}")
    }
    // over-represented langs downsample (copies = 1), under-represented
    // upsample with copies in [1, 3]; the fixture must exercise both
    assert(out.forall(r => r._3 >= 1 && r._3 <= 3))
    val downsampled = byLang.filter(_._2 > share).keySet
    assert(out.filter(r => downsampled(r._2)).forall(_._3 == 1L))
    // membership is hash-determined: re-run is bit-identical
    val again = TrainOps.i48_mix_apply.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("i51 two-pass shuffle order matches a reference sort and is a permutation") {
    val out = TrainOps.i51_global_shuffle.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length.toLong
    assert(n > 0)
    // the two-pass rank (range partition + prefix offsets) against an
    // independent in-memory sort of the same keys
    val rankOf = out.map { case (id, _, _) => id -> (id * 741103597L) % 1000000007L }
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, skey, pos) =>
      assert(skey == (id * 741103597L) % 1000000007L, s"doc $id skey")
      assert(pos == rankOf(id), s"doc $id two-pass rank vs reference sort")
    }
    // train_pos is a permutation of 1..n — no gap, no collision
    val positions = out.map(_._3)
    assert(positions.distinct.length == n.toInt)
    assert(positions.min == 1L && positions.max == n)
    // and it genuinely SHUFFLES: consecutive doc_ids land far apart (the
    // anti-locality property that is the op's whole point)
    val posById = out.map { case (id, _, p) => id -> p }.toMap
    val adjacentClose = out.map(_._1).sorted.sliding(2).count {
      case Array(a, b) => posById.contains(b) && math.abs(posById(a) - posById(b)) < n / 100
      case _ => false
    }
    assert(adjacentClose < n / 10,
      s"$adjacentClose of $n adjacent doc_id pairs stayed near-neighbors in training order")
  }

  test("i57 SFT packing: extents tile each conversation, loss mask alternates") {
    val out = TrainOps.i57_sft_pack.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(out.nonEmpty)
    out.groupBy(t => (t._1, t._2)).foreach { case ((src, conv), turns) =>
      val sorted = turns.sortBy(_._3) // doc_id order = turn order
      // turn numbers dense 1..n; roles alternate user/assistant; loss on
      // assistant turns only
      sorted.zipWithIndex.foreach { case ((_, _, _, turnNo, role, nTok, s0, e0, loss), i) =>
        assert(turnNo == i + 1L, s"($src,$conv) turn numbering")
        assert(role == (if ((i + 1) % 2 == 1) "user" else "assistant"))
        assert(loss == (role == "assistant"), "loss mask must cover assistant turns")
        assert(e0 == s0 + nTok, s"($src,$conv) turn ${i + 1} extent")
      }
      // extents tile the packed conversation: each turn starts where the
      // previous ended, from offset 0
      sorted.foldLeft(0L) { case (expected, (_, _, _, _, _, nTok, s0, _, _)) =>
        assert(s0 == expected, s"($src,$conv) gap/overlap at offset $s0")
        expected + nTok
      }
      // conversations genuinely multi-turn (the fixture must exercise
      // the mask's both values)
      ()
    }
    assert(out.exists(_._9) && out.exists(!_._9),
      "fixture must exercise both mask values")
  }

  test("i51 plans no global (un-partitioned) window") {
    // the b8/i49 lesson enforced here too: the global order must come from
    // the range-partitioned two-pass shape, not a single-task row_number
    import org.apache.spark.sql.catalyst.plans.logical.{Window => WindowNode}
    val out = TrainOps.i51_global_shuffle.fn(spark, sfDir)
    val globalWindows = out.queryExecution.optimizedPlan.collect {
      case w: WindowNode if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"un-partitioned window in plan: ${globalWindows.mkString("; ")}")
  }
}
