package graft

import graft.ops.{CorpusOps, EtlOps}
import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-preparation ops beyond the oracle
  * hash: actual redaction completeness (no pattern survives), exact score
  * recomputation, vocabulary accounting identities, and merge semantics
  * per changeset class.
  */
class CorpusOpsSpec extends SparkTestBase {

  test("i30 leaves no redactable pattern and counts what it removed") {
    val out = CorpusOps.i30_pii_redact.fn(spark, sfDir).collect()
    assert(out.length == Tables.t(spark, sfDir, "documents").count())
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phone = "\\+1-555-[0-9]{4}".r
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
    out.foreach { r =>
      val red = r.getString(4)
      assert(email.findFirstIn(red).isEmpty, s"email survived in doc ${r.getLong(0)}")
      assert(phone.findFirstIn(red).isEmpty, s"phone survived in doc ${r.getLong(0)}")
      assert(ip.findFirstIn(red).isEmpty, s"ip survived in doc ${r.getLong(0)}")
    }
    // count audit per planting rule: emails = (%3>0) + (%5==0), phone = (%2==0),
    // ip = (%4==1); the base corpus carries no '@' or digits (probed in-test)
    val base = Tables.t(spark, sfDir, "documents")
      .filter(col("text").rlike("[@0-9]")).count()
    assert(base == 0L, "fixture assumption broken: base text carries PII-like chars")
    out.foreach { r =>
      val id = r.getLong(0)
      val wantEmail = (if (id % 3 > 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(r.getLong(1) == wantEmail, s"doc $id n_email")
      assert(r.getLong(2) == (if (id % 2 == 0) 1L else 0L), s"doc $id n_phone")
      assert(r.getLong(3) == (if (id % 4 == 1) 1L else 0L), s"doc $id n_ip")
      // placeholders appear exactly count-many times
      assert("<EMAIL>".r.findAllIn(r.getString(4)).size == wantEmail)
    }
    // count variety: the fixture must exercise 0, 1 and 2 emails
    assert(out.map(_.getLong(1)).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("i33 vocabulary accounting: cf sums to token count, ranks dense") {
    val out = CorpusOps.i33_vocab_df.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    val totalToks = Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    assert(out.map(_.getLong(1)).sum == totalToks, "sum(cf) != corpus token count")
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    out.foreach { r =>
      assert(r.getLong(2) <= nDocs && r.getLong(2) >= 1, s"df out of range for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1), "df > cf is impossible")
    }
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq, "ranks not dense")
    // cf non-increasing along the rank order
    assert(out.map(_.getLong(1)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("i31 scores are the exact integer tf*1e6 div df, top-3 per doc") {
    val out = CorpusOps.i31_tfidf_topterms.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(3),
        s"score mismatch for doc ${r.getLong(0)} tok ${r.getString(1)}")
      assert(r.getLong(5) >= 1 && r.getLong(5) <= 3)
    }
    // driver-side recompute for one document: same top-3 under
    // (score desc, tok asc)
    val docId = out.head.getLong(0)
    val text = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") === docId).select("text").head().getString(0)
    val toks = text.split(" ").filter(_.nonEmpty)
    val tf = toks.groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val dfMap = CorpusOps.i33_vocab_df.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val expect = tf.toSeq
      .map { case (t, f) => (t, f * 1000000L / dfMap(t)) }
      .sortBy { case (t, sc) => (-sc, t) }.take(3).map(_._1)
    val got = out.filter(_.getLong(0) == docId).sortBy(_.getLong(5)).map(_.getString(1)).toSeq
    assert(got == expect, s"doc $docId top terms: got $got want $expect")
  }

  test("i31 df side broadcasts (no cartesian / nested-loop anywhere)") {
    val plan = CorpusOps.i31_tfidf_topterms.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "df join should broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("b12 merge applies deletes, updates, inserts exactly once") {
    val out = EtlOps.b12_merge_upsert.fn(spark, sfDir).collect()
    val snap = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val nDel = snap.keys.count(_ % 13 == 0)
    val nIns = snap.keys.count(_ % 17 == 0)
    assert(out.length == snap.size - nDel + nIns)
    val byKey = out.map(r => r.getLong(0) -> r).toMap
    snap.keys.foreach { k =>
      if (k % 13 == 0) assert(!byKey.contains(k), s"deleted key $k survived")
      else if (k % 7 == 0) {
        val r = byKey(k)
        assert(r.getString(2) == "X" && r.getString(5) == "9-RECLASS"
          && r.getString(6) == "update", s"update not applied to $k")
      } else {
        val r = byKey(k)
        assert((r.getString(2), r.getString(5)) == snap(k) && r.getString(6) == "keep",
          s"untouched row $k changed")
      }
    }
    snap.keys.filter(_ % 17 == 0).foreach { k =>
      val r = byKey(k + 1000000000L)
      assert(r.getString(2) == "N" && r.getString(6) == "insert", s"insert $k missing")
    }
  }

  test("TokenTermFreq matches a naive recompute on random token arrays") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.functions._
    val tokGen = Gen.oneOf(Gen.oneOf("a", "b", "c", "día", "łang"),
      Gen.const(""), Gen.alphaNumStr.map(_.take(6)))
    val arrGen = Gen.listOf(tokGen)
    val prop = Prop.forAll(arrGen) { toks =>
      import spark.implicits._
      val got = Seq(toks).toDF("toks")
        .select(graft.functions.HashFunctions.tokenTermFreq(col("toks")).as("p"))
        .selectExpr("inline(p)").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      val want = toks.filter(_.nonEmpty).groupBy(identity)
        .map { case (t, a) => t -> a.length.toLong }.toSeq.sortBy(_._1)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("a13 JSONL round-trip is lossless and written in parallel parts") {
    val out = graft.ops.ScanOps.a13_jsonl_source.fn(spark, sfDir)
    val src = Tables.t(spark, sfDir, "documents")
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    assert(out.count() == src.count())
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
    val parts = new java.io.File(Util.scratch("a13_documents_jsonl"))
      .listFiles().count(_.getName.startsWith("part-"))
    assert(parts >= 1)
  }

  test("b12 changeset joins broadcast against the snapshot") {
    val plan = EtlOps.b12_merge_upsert.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("i32 bigram counts recompute exactly and conditionals are consistent") {
    val out = CorpusOps.i32_bigram_lm.fn(spark, sfDir).collect()
    assert(out.length == 50)
    // (w1, w2) keys unique; c12 non-increasing down the ranking
    val keys = out.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(out.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    out.foreach { r =>
      val (c12, c1, p) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c12 >= 1 && c12 <= c1, s"c12 out of range for ${keys.toSeq}")
      assert(p == c12 * 1000000L / c1, "p_micro is not the exact integer div")
    }
    // independent recount of the TOP bigram straight off the corpus
    val (w1, w2, c12) = (out(0).getString(0), out(0).getString(1), out(0).getLong(2))
    val direct = Tables.t(spark, sfDir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .selectExpr("explode(transform(sequence(1, size(toks) - 1), " +
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS p")
      .filter(col("p.w1") === w1 && col("p.w2") === w2)
      .count()
    assert(direct == c12, s"top bigram ($w1,$w2) recount mismatch")
  }

  test("i34 k-means partitions all points; norms sum to the corpus total") {
    val out = CorpusOps.i34_kmeans_lloyd.fn(spark, sfDir).collect()
    val emb = Tables.t(spark, sfDir, "embeddings")
    // every point lands in exactly one cluster (assignment is a partition)
    assert(out.map(_.getLong(1)).sum == emb.count())
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).toSeq.sorted)
    assert(out.length >= 2 && out.length <= 4, "k=4 clustering degenerated")
    // sum of per-cluster member norms is assignment-invariant: it must
    // equal the total quantized squared norm computed independently
    val totalNorm = emb.selectExpr(
      "aggregate(transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)), " +
        "0L, (a, v) -> a + v * v) AS n")
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum == totalNorm, "member norms lost mass")
    // deterministic: a second run yields byte-identical rows
    val again = CorpusOps.i34_kmeans_lloyd.fn(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("lloydModel: a k-means collapse sheds the empty cell instead of leaving a dead centroid") {
    import spark.implicits._
    // two tight clusters, three seeds: the two hash-smallest seed
    // vectors are IDENTICAL (both in cluster A), so after the first
    // mean update their centroids coincide and the cid-tiebreak drains
    // one cell — the degenerate case the r10 verdict's #7 asks the
    // policy for. Policy: centroids derive from the FINAL assignment,
    // so a collapsed cell has no centroid row and no codes partition —
    // the artifacts stay consistent and no nprobe slot is wasted on an
    // empty cell (the build-side require in sq8WriteIndexKmeans guards
    // the same invariant on disk).
    val a = Array.fill(4)(0.1f)
    val b = Array.fill(4)(10.0f)
    val emb = Seq(
      (0L, a), (1L, a),                       // the two coinciding seeds
      (2L, b),                                // seed in cluster B
      (3L, a), (4L, a.map(_ + 0.001f)),       // more of cluster A
      (5L, b), (6L, b.map(_ + 0.001f))        // more of cluster B
    ).toDF("vec_id", "embedding")
    val (cells, centPos) = CorpusOps.lloydModel(emb, 3)
    val cellIds = cells.select("cid").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(cellIds.size == 2, s"expected a collapse to 2 live cells: $cellIds")
    // every point still lands in exactly one live cell
    assert(cells.count() == 7)
    // the centroid table covers EXACTLY the live cells (the consistency
    // invariant the index build requires)
    val centIds = centPos.join(cells.select("cid").distinct(), "cid")
      .select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(centIds == cellIds)
  }

  test("i36 lift scores recompute exactly; support floor and order hold") {
    val out = CorpusOps.i36_collocation_lift.fn(spark, sfDir).collect()
    assert(out.length == 30)
    out.foreach { r =>
      assert(r.getLong(2) >= 5, "support floor violated")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4))
    }
    // lift non-increasing down the ranking
    assert(out.map(_.getDouble(5)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // recompute the formula from the row's own counts and the corpus
    // total, with Spark round()'s exact semantics (HALF_UP on BigDecimal)
    val nb = Tables.t(spark, sfDir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .selectExpr("size(toks) - 1 AS n").agg(sum("n")).collect()(0).getLong(0)
    out.foreach { r =>
      val raw = (r.getLong(2).toDouble * nb.toDouble) /
        (r.getLong(3).toDouble * r.getLong(4).toDouble)
      val want = BigDecimal(raw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == want, s"lift drifted for (${r.getString(0)},${r.getString(1)})")
    }
  }

  test("i32/i34/i35 physical plans have the shapes the docs claim") {
    // i32: top-50 must be TakeOrderedAndProject (no global sort), and the
    // predecessor-totals join must broadcast
    val p32 = CorpusOps.i32_bigram_lm.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p32.contains("TakeOrderedAndProject"), "i32 lost its top-k plan")
    assert(p32.contains("BroadcastHashJoin"), "i32 predecessor join not broadcast")
    // i34/i35: centroid assignment must broadcast the centroids — a
    // sort-merge join against a 4-row side would be the wrong plan at any N
    val p34 = CorpusOps.i34_kmeans_lloyd.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p34.contains("BroadcastNestedLoopJoin") || p34.contains("BroadcastHashJoin"),
      "i34 centroids not broadcast")
    assert(!p34.contains("CartesianProduct"), "i34 fell back to a cartesian")
    val p35 = CorpusOps.i35_semdedup.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p35.contains("CartesianProduct"), "i35 pair join must stay cid-keyed")
  }

  test("i35 pair distances recompute exactly from the embeddings table") {
    val out = CorpusOps.i35_semdedup.fn(spark, sfDir).collect()
    assert(out.nonEmpty, "semdedup found no pairs at this SF")
    val keys = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(keys.distinct.length == keys.length)
    out.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "pair not canonically ordered")
      assert(r.getLong(3) <= 1150000L, "pair over threshold leaked through")
    }
    // recompute every returned pair's integer distance straight from the
    // source table (no Lloyd machinery) — must match bit-for-bit
    val quant = Tables.t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS qv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    out.foreach { r =>
      val (a, b) = (quant(r.getLong(1)), quant(r.getLong(2)))
      val d = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(d == r.getLong(3), s"pair (${r.getLong(1)},${r.getLong(2)}) distance drifted")
    }
  }

  test("i37/i38 plans: equi-joins only, small sides broadcast") {
    Seq("i37" -> CorpusOps.i37_dedup_lines, "i38" -> CorpusOps.i38_doc_logprob)
      .foreach { case (name, op) =>
        val plan = op.fn(spark, sfDir).queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"$name degenerated to an all-pairs join:\n$plan")
        // i37's boiler drop set / i38's LM table must attach map-side
        assert(plan.contains("BroadcastHashJoin"),
          s"$name lost its broadcast equi-join:\n$plan")
      }
  }

  test("i37 drops exactly the planted boilerplate and preserves line order") {
    val out = CorpusOps.i37_dedup_lines.fn(spark, sfDir).collect()
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    val hdr = "subscribe to our newsletter for daily updates"
    val ftr = "copyright twenty twenty four example corp all rights reserved"
    out.foreach { r =>
      val id = r.getLong(0)
      val chunks = docs(id).split(" ").grouped(8).map(_.mkString(" ")).toSeq
      val planted = (if (id % 2 == 0) 1 else 0) + (if (id % 3 == 0) 1 else 0)
      assert(r.getLong(1) == chunks.length + planted, s"doc $id line count")
      // at this SF no NATURAL chunk crosses the >10-doc frequency line
      // (the oracle would still agree if one did — this pins the fixture)
      assert(r.getLong(2) == planted, s"doc $id dropped ${r.getLong(2)} != $planted")
      val clean = r.getString(3)
      assert(!clean.contains(hdr) && !clean.contains(ftr),
        s"doc $id kept a boilerplate line")
      // reassembly preserves the original chunk sequence exactly
      assert(clean == chunks.mkString("\n"), s"doc $id lines reordered/mangled")
    }
  }

  test("i37 agrees with a plain-Scala reference on a random corpus") {
    // randomized robustness beyond the fixture: short docs (< 8 tokens),
    // docs sharing natural chunks (so NATURAL lines can cross the >10-doc
    // frequency threshold, not just the planted boiler), variable lengths
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    // a fixed 8-token opening shared by 15 docs forms an identical first
    // CHUNK — a natural line that must cross the >10-doc frequency bar
    val shared = Seq.fill(8)("omega")
    val docs = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(20)
      val toks = (if (id % 4 == 1) shared else Nil) ++
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "), "en", s"src${id % 3}", 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_i37_rand").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.i37_dedup_lines.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // plain-Scala reference of the whole operator (planting + frequency +
    // drop + ordered reassembly)
    val hdr = "subscribe to our newsletter for daily updates"
    val ftr = "copyright twenty twenty four example corp all rights reserved"
    val lines = docs.map { case (id, text, _, _, _) =>
      val chunks = text.split(" ").grouped(8).map(_.mkString(" ")).toSeq
      id -> ((if (id % 2 == 0) Seq(hdr) else Nil) ++ chunks ++
        (if (id % 3 == 0) Seq(ftr) else Nil))
    }.toMap
    val docFreq = lines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val boiler = docFreq.filter(_._2 > 10).keySet
    assert(boiler.exists(l => l != hdr && l != ftr),
      "random corpus must push a NATURAL line over the frequency bar")
    docs.foreach { case (id, _, _, _, _) =>
      val ls = lines(id)
      val keptLines = ls.filterNot(boiler)
      val (nl, nd, txt) = out(id)
      assert(nl == ls.length, s"doc $id line count")
      assert(nd == (ls.length - keptLines.length), s"doc $id dropped count")
      assert(txt == keptLines.mkString("\n"), s"doc $id reassembly")
    }
  }

  /** Plain-Scala reference of the whole i41 operator (planting + span
    * frequency + coverage + ordered excision) for both i41 tests.
    */
  private def refSubstringDedup(docs: Map[Long, String])
  : Map[Long, (Long, Long, String)] = {
    val plant = "abcdefghijkl".map(c => s"dupseg$c$c")
    val toks = docs.map { case (id, text) =>
      val t0 = text.split(" ").toSeq
      id -> (if (id % 7 == 0) t0.take(5) ++ plant ++ t0.drop(5) else t0)
    }
    val spanDocs = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(8).filter(_.length == 8).map(_.mkString(" ")).distinct.map(_ -> id) }
    val dup = spanDocs.groupBy(_._1)
      .collect { case (s, xs) if xs.map(_._2).distinct.size >= 2 => s }.toSet
    toks.map { case (id, ts) =>
      val covered = ts.sliding(8).zipWithIndex
        .filter { case (w, _) => w.length == 8 && dup(w.mkString(" ")) }
        .flatMap { case (_, i) => i until i + 8 }.toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((ts.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }
  }

  test("i41 plan: equi-joins only, no all-pairs fallback") {
    val plan = CorpusOps.i41_dedup_substring.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"i41 degenerated to an all-pairs join:\n$plan")
  }

  test("i41 removes every planted span occurrence and matches the reference") {
    val out = CorpusOps.i41_dedup_substring.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == docs.size)
    val expected = refSubstringDedup(docs)
    docs.keys.foreach { id =>
      assert(out(id) == expected(id), s"doc $id diverged from reference")
    }
    // the sentinel passage is removed EVERYWHERE it was planted, and the
    // fixture exercises both classes (planted docs, untouched docs)
    out.values.foreach { case (_, _, kept) =>
      assert(!kept.contains("dupseg"), "a planted span survived dedup") }
    assert(docs.keys.exists(id => id % 7 == 0 && out(id)._2 >= 12))
    assert(out.exists { case (id, (n, nd, _)) => nd == 0 && n > 0 && id % 7 != 0 })
  }

  test("i41 agrees with the reference on a random corpus with short docs") {
    // beyond the fixture: docs shorter than the span width (zero spans),
    // natural cross-doc repeats from a 3-word vocabulary, and docs that
    // end up fully covered (text_kept == "")
    val rnd = new scala.util.Random(17)
    import spark.implicits._
    val vocab = Vector("ax", "bx", "cx")
    val shared = Seq.tabulate(10)(i => vocab(i % 3))
    val docs = (0L until 80L).map { id =>
      val n = 1 + rnd.nextInt(18)
      val toks =
        if (id % 5 == 2) shared // whole doc = the shared passage
        else Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "), "en", s"src${id % 3}", 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_i41_rand").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.i41_dedup_substring.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val expected = refSubstringDedup(docs.map(d => d._1 -> d._2).toMap)
    assert(out.size == expected.size)
    expected.foreach { case (id, want) =>
      assert(out(id) == want, s"doc $id diverged from reference")
    }
    // the regime assertions: a fully covered doc and a zero-span doc exist
    assert(out.values.exists { case (n, nd, txt) => n == nd && txt == "" },
      "random corpus must produce a fully-covered doc")
    assert(out.exists { case (id, (n, nd, _)) => n < 8 && nd == 0 },
      "random corpus must include short zero-span docs")
  }

  test("i42 encode matches a plain-Scala vocab build and is losslessly decodable") {
    val out = CorpusOps.i42_vocab_encode.fn(spark, sfDir).collect()
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent vocab: top-16 by (count desc, token asc)
    val cf = docs.values.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.size).toMap
    val rank = cf.toSeq.sortBy { case (t, c) => (-c, t) }.take(16)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    assert(out.length == docs.size)
    out.foreach { r =>
      val (id, nTok, nOov, ids) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val toks = docs(id).split(" ").toSeq
      val want = toks.map(t => rank.getOrElse(t, 0L))
      assert(nTok == toks.length, s"doc $id n_tok")
      assert(nOov == want.count(_ == 0L), s"doc $id n_oov")
      assert(ids == want.mkString(" "), s"doc $id ids")
    }
    // both regimes are populated: in-vocab ids and OOV zeros
    assert(out.exists(_.getLong(2) > 0), "no OOV token in the fixture")
    assert(out.exists(r => r.getLong(2) < r.getLong(1)), "no in-vocab token")
  }

  test("i42 encode is a narrow map: no shuffle between the scan and the ids") {
    // the corpus side must not shuffle to encode — only the vocab aggregate
    // (Heaps-bounded) and the final dump sort may exchange
    val plan = CorpusOps.i42_vocab_encode.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"vocab attach fell off the broadcast path:\n$plan")
    // corpus rows reach the project through a broadcast attach, never a
    // corpus-keyed repartition: no HashAggregate keyed by doc_id and no
    // Exchange hashpartitioning(doc_id...) may appear
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"encode shuffled the corpus:\n$plan")
  }

  test("i43 host stats partition the corpus across the planted domains") {
    val out = CorpusOps.i43_url_host_stats.fn(spark, sfDir).collect()
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // 20 planted hosts; stats recompute from the planting rule
    assert(out.length == 20)
    assert(out.map(_.getLong(1)).sum == docs.length)
    out.foreach { r =>
      val host = r.getString(0)
      val k = host.stripPrefix("host").stripSuffix(".example.com").toLong
      val mine = docs.filter(_._1 % 20 == k)
      assert(r.getLong(1) == mine.length, s"$host n_docs")
      assert(r.getLong(2) == mine.map(_._3).sum, s"$host sum_chars")
      assert(r.getLong(3) == mine.map(_._2).distinct.length, s"$host n_langs")
    }
  }

  test("i44 caps each domain at 20 by the deterministic hash order") {
    val out = CorpusOps.i44_domain_cap.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3), r.getBoolean(4))))
      .toMap
    val ids = Tables.t(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.size == ids.length)
    // plain-Scala reference: per-host (hash, id) order, cap 20
    val byHost = ids.groupBy(id => s"host${id % 20}.example.com")
    byHost.foreach { case (host, members) =>
      val ordered = members.sortBy(id => ((id * 2971215073L) % 1000000007L, id))
      ordered.zipWithIndex.foreach { case (id, i) =>
        val (h, rk, kept) = out(id)
        assert(h == host && rk == i + 1 && kept == (i < 20), s"doc $id")
      }
    }
    // the cap bites at this SF (hosts hold > 20 docs) and keeps exactly 20
    assert(byHost.values.exists(_.length > 20), "fixture never exceeds the cap")
    byHost.filter(_._2.length > 20).foreach { case (host, members) =>
      assert(members.count(id => out(id)._3) == 20, s"$host kept != 20")
    }
  }

  test("i38 scores recompute from a locally built bigram LM") {
    val out = CorpusOps.i38_doc_logprob.fn(spark, sfDir).collect()
    // build the corpus LM in plain Scala (independent of the Spark path)
    val docToks = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val occ = docToks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))) }
    val c12 = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = occ.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val lp = c12.map { case (bg, c) =>
      bg -> math.floor(math.log(c.toDouble / c1(bg._1).toDouble) * 1e6).toLong }
    val expected = occ.groupBy(_._1).view.mapValues { os =>
      val sum = os.map(o => lp(o._2)).sum
      (os.size.toLong, sum, sum / os.size)  // Java / truncates like DIV
    }.toMap
    assert(out.length == expected.size, "docs with >= 2 tokens must all score")
    out.foreach { r =>
      val (n, sum, mean) = expected(r.getLong(0))
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)} bigram count")
      assert(r.getLong(2) == sum, s"doc ${r.getLong(0)} sum drifted")
      assert(r.getLong(3) == mean, s"doc ${r.getLong(0)} mean drifted")
      assert(r.getBoolean(4) == (mean < -3400000L), s"doc ${r.getLong(0)} flag")
    }
    // both flag classes populated — the threshold sits inside the
    // distribution, not at an edge
    assert(out.exists(_.getBoolean(4)) && out.exists(!_.getBoolean(4)),
      "flag_low threshold degenerated to a constant")
  }

  test("i49 rank, buckets and keep match a reference ranking of i38 scores") {
    // i38's scores are themselves pinned to the plain-Scala LM reference
    // above, so ranking them here checks i49's two-pass rank (range
    // partition + prefix offsets) against an independent in-memory sort
    val scores = CorpusOps.i38_doc_logprob.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val out = CorpusOps.i49_perplexity_buckets.fn(spark, sfDir).collect()
    assert(out.length == scores.size, "every scoreable doc must be ranked")
    val order = scores.toSeq.sortBy { case (id, m) => (-m, id) }.map(_._1)
    val rankOf = order.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val n = order.size.toLong
    val (headCut, midCut) = (n / 3, 2 * (n / 3))
    out.foreach { r =>
      val (id, mean, prank) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (bucket, keep) = (r.getString(3), r.getBoolean(4))
      assert(mean == scores(id), s"doc $id score disagrees with i38")
      assert(prank == rankOf(id), s"doc $id rank (two-pass vs reference sort)")
      val expBucket =
        if (prank <= headCut) "head"
        else if (prank <= midCut) "middle"
        else "tail"
      assert(bucket == expBucket, s"doc $id bucket")
      val expKeep = expBucket match {
        case "head" => true
        case "middle" => (id * 2654435761L) % 1000 < 500
        case _ => false
      }
      assert(keep == expKeep, s"doc $id keep policy")
    }
    // every bucket populated, and the middle genuinely sampled (both keep
    // verdicts occur there) — the policy can't degenerate silently
    Seq("head", "middle", "tail").foreach { b =>
      assert(out.exists(_.getString(3) == b), s"bucket $b empty")
    }
    val mid = out.filter(_.getString(3) == "middle")
    assert(mid.exists(_.getBoolean(4)) && mid.exists(!_.getBoolean(4)),
      "middle sampling degenerated to a constant")
  }

  test("i49 plans no global (un-partitioned) window") {
    // the b8 lesson enforced on the ranking consumer: the rank must come
    // from the two-pass range-partition shape, not a global row_number
    import org.apache.spark.sql.catalyst.plans.logical.{Window => WindowNode}
    val out = CorpusOps.i49_perplexity_buckets.fn(spark, sfDir)
    val globalWindows = out.queryExecution.optimizedPlan.collect {
      case w: WindowNode if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"un-partitioned window in plan: ${globalWindows.mkString("; ")}")
  }

  // ---- i46: independent BPE reference (functional, list-based — written
  // separately from CorpusOps' imperative learner so a defect in either
  // cannot cancel out) ----

  private def refBpeMergeWord(syms: List[String], a: String,
      b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: refBpeMergeWord(rest, a, b)
    case x :: rest => x :: refBpeMergeWord(rest, a, b)
    case Nil => Nil
  }

  private def refBpeLearn(wordFreq: Seq[(String, Long)],
      k: Int): List[(String, String)] = {
    var state = wordFreq.toList.map { case (w, f) => (w.toList.map(_.toString), f) }
    (1 to k).toList.map { _ =>
      val pairCnt = state
        .flatMap { case (syms, f) => syms.zip(syms.drop(1)).map(p => (p, f)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toList
      val ((a, b), _) = pairCnt.sortBy { case ((x, y), c) => (-c, x, y) }.head
      state = state.map { case (syms, f) => (refBpeMergeWord(syms, a, b), f) }
      (a, b)
    }
  }

  test("i46 agrees with an independent BPE reference on a random corpus") {
    // random words over a small alphabet (so merges fire), plus non-alpha
    // tokens (digits, uppercase, punctuation) that both sides must drop,
    // and docs with NO alpha tokens that must vanish from the output
    val rnd = new scala.util.Random(46)
    import spark.implicits._
    val lexicon = Vector.fill(60)(
      (1 + rnd.nextInt(7)).until(0, -1).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
    val junk = Vector("x9y", "Hello", "a-b", "42", "Z")
    val docs = (0L until 80L).map { id =>
      val n = rnd.nextInt(25)
      val toks = Seq.fill(n)(
        if (rnd.nextInt(5) == 0) junk(rnd.nextInt(junk.size))
        else lexicon(rnd.nextInt(lexicon.size)))
      (id, toks.mkString(" "), "en", s"src${id % 3}", 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_i46_rand").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.i46_bpe_encode.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // reference: learn on the full word-frequency table (corpus is far
    // below the BpeV cap), then encode per doc
    val alpha = docs.map { case (id, text, _, _, _) =>
      id -> text.split(" ").toSeq.filter(_.matches("^[a-z]+$"))
    }.toMap
    val wf = alpha.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy { case (w, c) => (-c, w) }
    val merges = refBpeLearn(wf, CorpusOps.BpeK)
    def encodeWord(w: String): List[String] =
      merges.foldLeft(w.toList.map(_.toString)) { case (syms, (a, b)) =>
        refBpeMergeWord(syms, a, b)
      }
    var merged = 0
    docs.foreach { case (id, _, _, _, _) =>
      val ws = alpha(id)
      if (ws.isEmpty) assert(!out.contains(id), s"doc $id should be absent")
      else {
        val pieces = ws.flatMap(encodeWord)
        val (np, ps) = out(id)
        assert(np == pieces.length, s"doc $id piece count")
        assert(ps == pieces.mkString(" "), s"doc $id piece sequence")
        if (pieces.length < ws.map(_.length).sum) merged += 1
      }
    }
    assert(merged > 0, "no merge ever fired — the corpus degenerated")
    assert(docs.exists { case (id, _, _, _, _) => alpha(id).isEmpty },
      "fixture must exercise the no-alpha-token exclusion")
  }

  test("i46 encode is a narrow map: learned merges are plan literals") {
    // after the (Heaps-bounded, driver-collected) vocab aggregate, the
    // encode itself must be a pure narrow map over the corpus: the merge
    // table is baked into the plan as literal replace() calls, so no
    // corpus-keyed exchange and no join machinery may appear
    val plan = CorpusOps.i46_bpe_encode.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"encode shuffled the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"encode joined instead of inlining the merge table:\n$plan")
  }

  // ---- i47: independent perceptron reference (functional — written
  // separately from CorpusOps' epoch loop) ----

  private def refQcHash(w: String, D: Int): Int =
    w.zipWithIndex.map { case (c, i) => (i + 1) * c.toInt }.sum % D

  private def refQcFeatures(text: String, D: Int): Vector[Long] = {
    val counts = text.split(" ").toSeq.filter(_.nonEmpty)
      .groupBy(refQcHash(_, D)).view.mapValues(_.size.toLong).toMap
    Vector.tabulate(D)(j => counts.getOrElse(j, 0L)) :+ 1L
  }

  private def refQcTrain(samples: Seq[(Vector[Long], Long)], epochs: Int,
      D: Int): Vector[Long] =
    (1 to epochs).foldLeft(Vector.fill(D + 1)(0L)) { (w, _) =>
      val upd = samples.foldLeft(Vector.fill(D + 1)(0L)) { case (u, (f, y)) =>
        val m = f.zip(w).map { case (a, b) => a * b }.sum
        if (y * m <= 0) u.zip(f).map { case (a, c) => a + y * c } else u
      }
      w.zip(upd).map { case (a, b) => a + b }
    }

  test("i47 separates planted classes on held-out docs and matches the reference") {
    // two disjoint lexicons drive the classes apart; `src0` docs are the
    // UNLABELED holdout drawn from the same two distributions — the
    // trained model must flag them by their true class, which is the
    // separation claim (weak labels train, held-out docs generalize)
    val rnd = new scala.util.Random(47)
    import spark.implicits._
    val lexPos = Vector("aurora", "basalt", "cedar", "delta", "ember", "fjord")
    val lexNeg = Vector("quartz", "rubble", "sludge", "tundra", "umbra", "vortex")
    def mk(lex: Vector[String], n: Int) =
      Seq.fill(n)(lex(rnd.nextInt(lex.size))).mkString(" ")
    val docs = (0L until 120L).map { id =>
      val n = 8 + rnd.nextInt(12)
      val positive = id % 2 == 0
      val text = mk(if (positive) lexPos else lexNeg, n)
      // ids 0..23 are the held-out unlabeled split (source 'src0');
      // the rest carry weak labels via the 4-vs-5-char source rule
      val source = if (id < 24) "src0" else if (positive) "srcp" else "srcn9"
      (id, text, "en", source, 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_i47_rand").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.i47_quality_classifier.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // independent reference: same features, same batch-perceptron schedule
    val D = CorpusOps.QcD
    val feats = docs.map { case (id, text, _, _, _) =>
      id -> refQcFeatures(text, D) }.toMap
    val train = docs.collect { case (id, _, _, src, _) if src != "src0" =>
      (feats(id), if (src.length == 4) 1L else -1L) }
    val w = refQcTrain(train, CorpusOps.QcE, D)
    docs.foreach { case (id, _, _, src, _) =>
      val score = feats(id).zip(w).map { case (a, b) => a * b }.sum
      val expY = if (src == "src0") 0L else if (src.length == 4) 1L else -1L
      val (y, sc, flag) = out(id)
      assert(y == expY && sc == score && flag == (score > 0),
        s"doc $id: got ($y, $sc, $flag) want ($expY, $score, ${score > 0})")
    }
    // the separation claim, on the UNLABELED holdout only
    (0L until 24L).foreach { id =>
      val (_, _, flag) = out(id)
      assert(flag == (id % 2 == 0),
        s"held-out doc $id misclassified — planted classes did not separate")
    }
  }

  test("i53 histogram matches a driver-side recompute and its own invariants") {
    val out = CorpusOps.i53_token_histogram.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    // independent recompute from the raw text
    val toks = Tables.t(spark, sfDir, "documents")
      .select("text").collect().flatMap(r => Option(r.getString(0)))
      .map(_.split(" ", -1).length.toLong)
    val ref = toks.groupBy(n => math.min(n / 16, 31L)).view
      .mapValues(v => (v.length.toLong, v.sum)).toMap
    assert(out.map(_._1).toSet == ref.keySet)
    out.foreach { case (b, nd, nt, _, _, _, _) =>
      assert((nd, nt) == ref(b), s"bucket $b docs/tokens")
    }
    // cumulative columns close over the corpus; shares sum to ~1
    assert(out.last._4 == toks.length.toLong, "cum_docs must close")
    assert(out.last._5 == toks.sum, "cum_tokens must close")
    assert(math.abs(out.map(_._6).sum - 1.0) < 1e-4, "doc_share sum")
    assert(math.abs(out.map(_._7).sum - 1.0) < 1e-4, "token_share sum")
    // monotone cumulatives (ordering defect would break this silently)
    out.sliding(2).foreach {
      case Array(a, c) => assert(a._4 <= c._4 && a._5 <= c._5)
      case _ =>
    }
  }

  test("i55 curriculum order: buckets stay contiguous, shuffled within, no global window") {
    val out = CorpusOps.i55_curriculum_order.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val n = out.length.toLong
    // cur_pos is a permutation of 1..n
    val pos = out.map(_._4)
    assert(pos.distinct.length.toLong == n && pos.min == 1L && pos.max == n)
    // bucket ranges are contiguous and ordered head < middle < tail
    def range(b: String) = {
      val ps = out.filter(_._2 == b).map(_._4)
      assert(ps.nonEmpty, s"bucket $b empty"); (ps.min, ps.max, ps.length)
    }
    val (h1, h2, hn) = range("head")
    val (m1, m2, mn) = range("middle")
    val (t1, t2, tn) = range("tail")
    assert(h1 == 1L && h2 == hn.toLong, "head must occupy the first block")
    assert(m1 == h2 + 1 && m2 == (hn + mn).toLong, "middle must follow head")
    assert(t1 == m2 + 1 && t2 == n, "tail must close the order")
    // within each bucket the order is exactly the (skey, doc_id) shuffle
    Seq("head", "middle", "tail").foreach { b =>
      val rows = out.filter(_._2 == b).sortBy(_._4)
      val resorted = rows.sortBy { case (id, _, sk, _) => (sk, id) }
      assert(rows.map(_._1).toSeq == resorted.map(_._1).toSeq,
        s"bucket $b not in (skey, doc_id) order")
      rows.foreach { case (id, _, sk, _) =>
        assert(sk == (id * 968665207L) % 1000000007L, s"doc $id skey")
      }
    }
    // the b8/i49/i51 rule: no un-partitioned window anywhere in the plan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => WindowNode}
    val globalWindows = CorpusOps.i55_curriculum_order.fn(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: WindowNode if w.partitionSpec.isEmpty => w
      }
    assert(globalWindows.isEmpty, s"un-partitioned window: $globalWindows")
  }

  test("i58 chunks match a plain-Scala reference; coverage and overlap hold") {
    val (w, s) = (CorpusOps.ChunkW, CorpusOps.ChunkS)
    val docs = Tables.t(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select("doc_id", "text").collect()
      // limit -1: keep trailing empty tokens, matching Spark SQL split
      // (the LlmOpsSpec split convention)
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val got = CorpusOps.i58_chunk_overlap.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // independent reference: sliding windows via plain Scala collections
    val exp = docs.flatMap { case (id, toks) =>
      val chunks = Iterator.from(0).map(i => i * s)
        .takeWhile(st => st == 0 || st < toks.length)
        .map(st => toks.slice(st, st + w)).toSeq
      val trimmed = // ref formula: 1 + ceil((n-w)/s) chunks, never trailing empties
        if (toks.length <= w) chunks.take(1)
        else chunks.take(1 + (toks.length - w + s - 1) / s)
      trimmed.zipWithIndex.map { case (c, i) =>
        (id, i.toLong) -> ((i * s + 1).toLong, c.length.toLong, c.mkString(" "))
      }
    }
    assert(got == exp, s"chunk mismatch: got=${got.size} exp=${exp.size}")
    // properties: every token position covered; full chunks overlap by w-s
    docs.foreach { case (id, toks) =>
      val spans = got.collect { case ((i, _), (st, n, _)) if i == id =>
        (st, st + n - 1) }.toSeq.sorted
      assert(spans.head._1 == 1 && spans.last._2 == toks.length.max(1),
        s"doc $id not covered end-to-end: $spans")
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 <= e1 + 1, s"doc $id gap between chunks: $spans")
        case _ =>
      }
    }
    assert(got.keys.exists(_._2 > 0), "no multi-chunk docs — overlap untested")
  }

  test("i47 plans: feature build and scoring are narrow; epochs aggregate") {
    val plan = CorpusOps.i47_quality_classifier.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    // learned weights are plan literals: no join machinery, no corpus
    // shuffle — only the dump sort exchanges
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"scoring shuffled the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"scoring joined instead of inlining weights:\n$plan")
  }
  test("i60 byte BPE: replace-chain equals array-form reference; lossless on random unicode") {
    import spark.implicits._
    import graft.ops.CorpusOps
    // alphabet spans single-byte ASCII, marker characters themselves,
    // 2- and 3-byte UTF-8 and a supplementary (4-byte) emoji; kept small
    // enough that distinct words stay under BpeV, so the top-V cut never
    // truncates and vocabulary SET equality is exact by construction
    val alphabet = Seq("a", "b", "z", "\u00df", "\u00e9", "\u4e2d",
      new String(Character.toChars(0x1F642)), "<", ">", "x", "3", "_", ".")
    val rnd = new scala.util.Random(60L)
    def word() = (1 to 1 + rnd.nextInt(4))
      .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    val docs = (1 to 120).map { i =>
      (i.toLong, (1 to 1 + rnd.nextInt(8)).map(_ => word()).mkString(" "))
    }
    val out = CorpusOps.bpeBytesEncode(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def hexOf(w: String): Array[String] =
      w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")
    val words = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
    val vocab = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      .toSeq.sortBy { case (w, f) => (-f, w) }
    assert(vocab.size <= CorpusOps.BpeV, "fixture vocabulary exceeds the top-V cut")
    val merges = CorpusOps.learnBpeMergesSym(
      vocab.map { case (w, f) => (hexOf(w), f) }, CorpusOps.BpeK)
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val pieces = ws.map { w =>
        merges.foldLeft(hexOf(w)) { case (syms, (a, b)) =>
          CorpusOps.applyBpeMerge(syms, a, b)
        }
      }
      val (nPieces, got) = out(id)
      assert(got == pieces.map(_.mkString(" ")).mkString(" "),
        s"doc $id pieces diverge from the array-form reference")
      assert(nPieces == pieces.map(_.length).sum.toLong, s"doc $id piece count")
      // OOV-free losslessness: concatenated pieces restore every byte
      assert(got.replace(" ", "") == ws.flatMap(hexOf).mkString,
        s"doc $id encode is not lossless")
    }
    assert(docs.exists(_._2.exists(_ > 127)), "no multi-byte char in fixture")
    assert(docs.exists(_._2.contains("<")), "no marker char in fixture")
    assert(merges.nonEmpty && merges.exists(m => (m._1 + m._2).length > 4),
      "no multi-byte merge learned -- merges never crossed a byte boundary")
  }
}
