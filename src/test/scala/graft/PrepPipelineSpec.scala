package graft

import graft.corpus.PrepMain
import graft.ops.LlmOps
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics: the composed stages must agree with the
  * individual gated operators they are built from, and the output layout
  * must be a valid operator input itself.
  */
class PrepPipelineSpec extends SparkTestBase {

  private lazy val outDir = Util.scratch("prep_out")
  private lazy val manifest =
    PrepMain.run(spark, PrepMain.Opts(sfDir, outDir, "minhash"))

  /** Every test forces this first: with only test 1 touching the lazy
    * `manifest`, running a later test in isolation (testOnly -z) would
    * read an output dir the pipeline never wrote.
    */
  private def pipelineRan(): Unit = assert(manifest.nonEmpty)

  test("manifest counts are internally consistent") {
    assert(manifest("n_input") > 0)
    assert(manifest("n_quality_kept") <= manifest("n_input"))
    assert(manifest("n_final") <= manifest("n_quality_kept"))
    // the stage counts must reconcile exactly (no --mix here, so the
    // mix term is absent; the --mix test reconciles its own run)
    assert(manifest("n_quality_kept") - manifest("n_dedup_dropped") -
      manifest("n_decontam_dropped") -
      manifest.getOrElse("n_mix_dropped", 0L) ==
      manifest("n_final"), "stage arithmetic doesn't reconcile")
    assert(manifest("n_dedup_dropped") <= manifest("n_dup_members_corpus"),
      "stage can't drop more than the corpus-wide pair-member set")
    assert(manifest("n_decontam_dropped") == 0 &&
      manifest("n_contaminated_corpus") == 0,
      "no --decontam was given, so the decontam stage must be a no-op")
    // verdict histogram partitions the input
    val verdictTotal = manifest.collect {
      case (k, v) if k.startsWith("verdict_") => v
    }.sum
    assert(verdictTotal == manifest("n_input"), "verdicts don't partition input")
    // split histogram partitions the output
    val splitTotal = manifest.collect {
      case (k, v) if k.startsWith("split_") => v
    }.sum
    assert(splitTotal == manifest("n_final"), "splits don't partition output")
  }

  test("output dir is a valid operator input and the kept set is pair-free") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    assert(written.columns.contains("split") && written.columns.contains("shard"))
    // re-run the SAME gated dedup operator ON the output: every detected
    // pair had its right member dropped, so the kept set must be pair-free
    val residual = LlmOps.i10_dedup_minhash_lsh.fn(spark, outDir).count()
    assert(residual == 0, s"$residual duplicate pairs survived the pipeline")
  }

  test("every kept doc has verdict keep and is not a dropped pair member") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    val verdicts = LlmOps.i29_quality_filter.fn(spark, sfDir)
      .select(col("doc_id"), col("verdict"))
    val nonKeep = written.join(verdicts, "doc_id")
      .filter(col("verdict") =!= "keep").count()
    assert(nonKeep == 0, "a non-keep doc leaked into the output")
    val drops = LlmOps.i10_dedup_minhash_lsh.fn(spark, sfDir)
      .select(col("b_id").as("doc_id")).distinct()
    assert(written.join(drops, "doc_id").count() == 0, "a dropped dup leaked")
  }

  test("per-shard positions are dense 1..n over the kept set") {
    pipelineRan()
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    val bad = written.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
      .count()
    assert(bad == 0, "shard positions not dense")
  }

  test("manifest.json exists and parses as flat key:number pairs") {
    pipelineRan()
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/manifest.json")))
    assert(txt.startsWith("{") && txt.trim.endsWith("}"))
    val pairs = txt.linesIterator.filter(_.contains(":")).toSeq
    assert(pairs.nonEmpty)
    pairs.foreach { l =>
      assert(l.matches("""\s*"[a-z_]+": \d+,?\s*"""), s"bad manifest line: $l")
    }
  }

  test("--decontam drops every contaminated doc; output is bench-overlap-free") {
    // benchmark = the corpus's src0 docs, written out as an EXTERNAL
    // documents table (the real shape: an eval suite dir next to the lake)
    val benchDir = Util.scratch("prep_bench")
    val decontamOut = Util.scratch("prep_out_decontam")
    Tables.t(spark, sfDir, "documents").filter(col("source") === "src0")
      .write.mode("overwrite").parquet(s"$benchDir/documents.parquet")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, decontamOut, "minhash",
      decontam = Some(benchDir)))
    // the bench docs themselves live in this corpus, so the stage must
    // have dropped at least them (containment 1.0 self-matches)
    assert(m("n_contaminated_corpus") > 0, "no contamination flagged (vacuous)")
    assert(m("n_quality_kept") - m("n_dedup_dropped") - m("n_decontam_dropped")
      == m("n_final"), "stage arithmetic doesn't reconcile with decontam")
    // prove bench-overlap-freedom by re-running the containment core
    // between the PIPELINE OUTPUT and the bench table — with the SAME
    // cap the pipeline ran under (the default): checking with a
    // different metric than the stage used would let the two disagree
    // exactly when the cap binds
    val out = spark.read.parquet(s"$decontamOut/documents.parquet")
    val bench = spark.read.parquet(s"$benchDir/documents.parquet")
    val residual = LlmOps.containmentFlags(out, bench, 0.8,
      cap = PrepMain.Opts(sfDir, decontamOut, "minhash").decontamCap).count()
    assert(residual == 0, s"$residual contaminated docs survived --decontam")
    // and on THIS bench (a KB-sized eval suite) the default cap must not
    // change the exact metric's verdict: the uncapped residual is zero
    // too, so defaulting to the capped index loses nothing here — the
    // regime where they diverge is the corpus-sized bench the capped
    // test below exercises
    assert(LlmOps.containmentFlags(out, bench, 0.8).count() == 0,
      "exact-metric contamination survived that the capped default missed")
  }

  test("--decontam-cap keeps a corpus-sized bench dir in the bounded-index regime") {
    // The adversarial regime the r4 scale ladder measured: the benchmark
    // side IS the corpus itself. The default-capped CLI path must (a)
    // bound every retained index shingle's bench multiplicity by the cap
    // — the property that keeps the inverted-index join output linear in
    // the corpus — with the cap actually BINDING here (not vacuous), and
    // (b) produce exactly the unified core's capped drop set.
    val benchDir = Util.scratch("prep_bench_big")
    val out3 = Util.scratch("prep_out_capped")
    Tables.t(spark, sfDir, "documents")
      .write.mode("overwrite").parquet(s"$benchDir/documents.parquet")
    val cap = 5
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, out3, "none",
      decontam = Some(benchDir), decontamCap = Some(cap)))
    // self-containment (every corpus doc contains itself at 1.0 over its
    // retained shingles) must flag the docs that retain rare shingles
    assert(m("n_contaminated_corpus") > 0, "no contamination flagged (vacuous)")
    // (a) the bounded-index property, recomputed on the same lineage
    import graft.functions.HashFunctions.shingleHashSet
    val be = spark.read.parquet(s"$benchDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), shingleHashSet(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("h"))
    val dfb = be.groupBy("h").agg(countDistinct("bench_id").as("dfb"))
    assert(dfb.filter(col("dfb") > cap).count() > 0,
      "cap never binds against a corpus-sized bench — test is vacuous")
    val keptIndexMax = be.join(dfb.filter(col("dfb") > cap).select("h"),
        Seq("h"), "left_anti")
      .groupBy("h").agg(countDistinct("bench_id").as("mult"))
      .agg(max("mult")).head().getLong(0)
    assert(keptIndexMax <= cap,
      s"retained index shingle with bench multiplicity $keptIndexMax > $cap")
    // (b) CLI drop count == the unified core's capped flags, same inputs
    val expect = LlmOps.containmentFlags(
      Tables.t(spark, sfDir, "documents"),
      spark.read.parquet(s"$benchDir/documents.parquet"), 0.8,
      broadcastBench = false, cap = Some(cap))
      .select("train_id").distinct().count()
    assert(m("n_contaminated_corpus") == expect,
      s"CLI dropped ${m("n_contaminated_corpus")}, capped core flags $expect")
  }

  test("--mix uniform lands the kept set exactly on the equal-share mixture") {
    pipelineRan() // the no-mix output IS this run's stage input (stages
    // before mix are identical and deterministic), so it supplies the
    // expected lang histogram without re-deriving the earlier stages
    val preMix = spark.read.parquet(s"$outDir/documents.parquet")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = preMix.values.sum
    val share = total / preMix.size
    val outM = Util.scratch("prep_out_mix")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outM, "minhash",
      mix = "uniform"))
    val written = spark.read.parquet(s"$outM/documents.parquet")
    assert(written.columns.contains("n_copies"))
    val byLang = written.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_copies").as("eff"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang.keySet == preMix.keySet)
    preMix.foreach { case (lang, n) =>
      val (kept, eff) = byLang(lang)
      assert(kept == math.min(share, n),
        s"$lang: kept $kept docs, expected ${math.min(share, n)}")
      assert(eff == math.min(share, 3 * n),
        s"$lang: effective $eff, expected ${math.min(share, 3 * n)}")
    }
    // manifest arithmetic extends through the new stage
    assert(m("n_mix_dropped") == total - byLang.values.map(_._1).sum)
    assert(m("mix_effective_total") == byLang.values.map(_._2).sum)
    assert(m("n_quality_kept") - m("n_dedup_dropped") - m("n_decontam_dropped")
      - m("n_mix_dropped") == m("n_final"))
  }

  test("--ppl ccnet drops exactly the tail and the hash-dropped middle half") {
    pipelineRan() // the no-ppl output IS this run's stage input (stages
    // before ppl are identical and deterministic), so recomputing the
    // policy over it in plain Scala yields the exact expected kept set
    val base = spark.read.parquet(s"$outDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val toks = base.toSeq.collect { case (id, Some(t)) => id -> t.split(" ").toSeq }
      .filter(_._2.length >= 2)
    val occ = toks.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1)))) }
    val c12 = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = occ.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val lp = c12.map { case (bg, c) =>
      bg -> math.floor(math.log(c.toDouble / c1(bg._1).toDouble) * 1e6).toLong }
    val mean = occ.groupBy(_._1).view.mapValues { os =>
      os.map(o => lp(o._2)).sum / os.size }.toMap
    val order = mean.toSeq.sortBy { case (id, m) => (-m, id) }.map(_._1)
    val n = order.size
    val drops = order.zipWithIndex.collect {
      case (id, i) if i + 1 > 2 * (n / 3) => id // tail
      case (id, i) if i + 1 > n / 3 &&
        (id * 2654435761L) % 1000 >= 500 => id // hash-dropped middle half
    }.toSet
    val expectedKept = base.keySet -- drops
    val outP = Util.scratch("prep_out_ppl")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outP, "minhash",
      ppl = "ccnet"))
    val written = spark.read.parquet(s"$outP/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(written == expectedKept,
      s"ppl stage kept ${written.size}, reference keeps ${expectedKept.size}; " +
        s"extra=${(written -- expectedKept).take(3)} missing=${(expectedKept -- written).take(3)}")
    // manifest arithmetic extends through the new stage, and the bucket
    // histogram covers exactly the scoreable set
    assert(m("n_quality_kept") - m("n_dedup_dropped") - m("n_decontam_dropped")
      - m("n_ppl_dropped") == m("n_final"))
    assert(m("ppl_head") + m("ppl_middle") + m("ppl_tail") == n.toLong,
      "bucket histogram must partition the scoreable set")
    assert(m("n_ppl_dropped") == (base.size - expectedKept.size).toLong)
    assert(m("n_ppl_dropped") > 0, "fixture must exercise real ppl drops")
  }

  test("--dedup keepbest keeps each cluster's longest member; output still pair-free") {
    val out2 = Util.scratch("prep_out_keepbest")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, out2, "keepbest"))
    // pair-free: pairs cluster into components and only one member
    // survives, so re-running the gated i10 on the output finds nothing
    val residual = LlmOps.i10_dedup_minhash_lsh.fn(spark, out2).count()
    assert(residual == 0, s"$residual duplicate pairs survived keepbest")
    // the survivor of every cluster is i40's keeper (when quality kept it)
    val written = spark.read.parquet(s"$out2/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val i40 = LlmOps.i40_dedup_keep_best.fn(spark, sfDir).collect()
    i40.filter(r => !r.getBoolean(2)).foreach { r =>
      assert(!written.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} is not its cluster's keeper but survived")
    }
    assert(m("n_dedup_dropped") <= m("n_dup_members_corpus"))
    // keepbest must actually diverge from the pair policy somewhere: some
    // kept doc is a cluster keeper that the b_id rule would have dropped
    val bIds = LlmOps.i10_dedup_minhash_lsh.fn(spark, sfDir)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(i40.exists(r => r.getBoolean(2) && bIds.contains(r.getLong(0))),
      "fixture never distinguishes keepbest from the b_id rule")
  }

  test("--scrub substring excises exactly the cross-doc duplicated spans") {
    pipelineRan()
    val scrubOut = Util.scratch("prep_out_scrub")
    // --dedup none: the minhash drop removes exactly the docs that SHARE
    // spans, which would leave the scrub stage nothing to excise at this
    // SF — without doc-level dedup the near-dup survivors carry genuine
    // cross-document spans into the stage
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, scrubOut, "none",
      scrub = "substring"))
    // scrub rewrites text; it never drops documents
    assert(m("n_final") == m("n_quality_kept"), "scrub must not drop documents")
    val written = spark.read.parquet(s"$scrubOut/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // plain-Scala reference over the same kept set, pre-scrub text from
    // the INPUT corpus
    val toks = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(r => written.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val spanDocs = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(8).filter(_.length == 8).map(_.mkString(" ")).distinct.map(_ -> id) }
    val dup = spanDocs.groupBy(_._1)
      .collect { case (sp, xs) if xs.map(_._2).distinct.size >= 2 => sp }.toSet
    val expected = toks.map { case (id, ts) =>
      val covered = ts.sliding(8).zipWithIndex
        .filter { case (w, _) => w.length == 8 && dup(w.mkString(" ")) }
        .flatMap { case (_, i) => i until i + 8 }.toSet
      val keptTxt = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((keptTxt.mkString(" "), covered.size.toLong))
    }
    assert(written.keySet == expected.keySet)
    expected.foreach { case (id, (txt, _)) =>
      assert(written(id)._1 == txt, s"doc $id scrubbed text diverges")
      assert(written(id)._2 == txt.length.toLong, s"doc $id n_chars stale")
    }
    assert(m("n_scrub_tokens_dropped") == expected.values.map(_._2).sum)
    assert(m("n_scrub_docs_touched") == expected.values.count(_._2 > 0).toLong)
    assert(m("n_scrub_tokens_dropped") > 0,
      "fixture kept set has no duplicated spans (vacuous scrub test)")
  }

  test("--profile write certifies the written corpus with the b19 sketch core") {
    val outP = Util.scratch("prep_out_profile")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outP, "minhash",
      profile = "write"))
    assert(m("n_profile_cols") == 4L)
    val pr = spark.read.parquet(s"$outP/profile.parquet")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(pr.keySet == Set("doc_id", "lang", "source", "n_chars"))
    // every row profiles the WRITTEN corpus and is sketch-healthy
    val written = spark.read.parquet(s"$outP/documents.parquet")
    val n = written.count()
    pr.foreach { case (c, r) =>
      assert(r.getLong(1) == n, s"$c n_rows != written corpus size")
      assert(r.getBoolean(4), s"$c sketch outside the 5% envelope")
      val truth = written.agg(
        org.apache.spark.sql.functions.countDistinct(col(c))).head().getLong(0)
      assert(r.getLong(3) == truth, s"$c exact anchor diverges")
    }
    // doc_id is the kept set's key: distinct == rows, nulls == 0
    assert(pr("doc_id").getLong(3) == n && pr("doc_id").getLong(2) == 0L)
  }

  test("--ann write persists the servable IVF/SQ8 index over exactly the kept corpus") {
    import org.apache.spark.sql.expressions.Window
    val outA = Util.scratch("prep_out_ann")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outA, "minhash",
      ann = "write"))
    val written = spark.read.parquet(s"$outA/documents.parquet")
    val codes = spark.read.parquet(s"$outA/ann_index.parquet")
    val cent = spark.read.parquet(s"$outA/ann_centroids.parquet")
    // the index covers EXACTLY the kept corpus (vec_id = doc_id 1:1),
    // codes-only on disk (no float column), centroid table is k×64
    assert(codes.schema.fieldNames.sorted.toSeq ==
      Seq("cell", "maxabs", "qarr", "vec_id"))
    val keptIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
    val idxIds = codes.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(idxIds.subsetOf(keptIds), "index contains a dropped doc")
    assert(m("n_ann_vectors") == idxIds.size.toLong)
    assert(m("n_ann_cells") == codes.select("cell").distinct().count())
    assert(cent.count() == m("n_ann_cells") * 64)
    assert(m("ann_maxabs_max_micro") >= m("ann_maxabs_min_micro") &&
      m("ann_maxabs_min_micro") > 0L)
    // probe the WRITTEN index with i63's two-stage chain against a
    // planted query (the smallest indexed vector) and compare to the
    // same chain computed inline from the kept float vectors — the
    // persisted round-trip must be lossless (i63's oracle trick)
    val e = Tables.t(spark, sfDir, "embeddings")
      .join(written.select(col("doc_id").as("vec_id")), "vec_id")
    val qid = idxIds.min
    val qvecRow = e.filter(col("vec_id") === qid).select("embedding")
      .collect().head.getSeq[Float](0)
    val qvec = typedLit(qvecRow)
    def twoStage(cds: org.apache.spark.sql.DataFrame) = cds
      .filter(col("vec_id") =!= qid)
      .withColumn("approx_sim", col("maxabs") / lit(127.0) *
        aggregate(zip_with(col("qarr"), qvec,
          (q, v) => q * v.cast("double")), lit(0.0), (a, x) => a + x))
      .orderBy(desc("approx_sim"), asc("vec_id")).limit(50)
      .select("vec_id")
      .join(e, "vec_id")
      .withColumn("sim", round(graft.functions.VectorFunctions.dot(
        col("embedding"), qvec), 6))
      .select("vec_id", "sim")
      .orderBy(desc("sim"), asc("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromArtifact = twoStage(codes)
    val inline = twoStage(e
      .withColumn("maxabs", LlmOps.sqMaxAbs).filter(col("maxabs") > 0)
      .withColumn("qarr", LlmOps.sqCodes)
      .select("vec_id", "maxabs", "qarr"))
    assert(fromArtifact.nonEmpty && fromArtifact == inline,
      s"persisted probe diverges from inline: $fromArtifact vs $inline")
    // the centroid artifact equals the LEARNED Lloyd model recomputed
    // from the kept corpus (r11: cells are k-means Voronoi regions, not
    // a metadata column; the model is integer-exact, so equality is
    // exact, and the cells on disk must match the recomputed assignment)
    val kept2 = e.withColumn("maxabs", LlmOps.sqMaxAbs)
      .filter(col("maxabs") > 0)
    // the pipeline auto-sizes k from the kept corpus (√N — ivfAutoK);
    // the recompute mirrors the same rule
    val (cells2, centPos2) = graft.ops.CorpusOps.lloydModel(kept2,
      LlmOps.ivfAutoK(kept2.count()))
    val truth = centPos2.join(cells2.select("cid").distinct(), "cid")
      .select(col("cid").cast("int").as("cell"), col("pos"),
        (col("cv_i").cast("double") / lit(1000.0)).as("c2"))
    assert(cent.count() == truth.count(), "centroid table size drifts")
    val maxDiff = cent.join(truth, Seq("cell", "pos"))
      .agg(max(abs(col("c") - col("c2")))).head().getDouble(0)
    assert(maxDiff == 0.0, s"centroid artifact drifts: $maxDiff")
    val cellTruth = cells2.select(col("vec_id"), col("cid").cast("int").as("l2"))
    assert(codes.join(cellTruth, "vec_id")
      .filter(col("cell") =!= col("l2")).count() == 0,
      "on-disk cell assignment diverges from the recomputed model")
    // the sweep artifact: the (nprobe, recall) curve beside the index,
    // its manifest fields matching the parquet rows exactly, and the
    // certified np=2 point consistent with annCertify's triple
    val sweep = spark.read.parquet(s"$outA/ann_sweep.parquet")
      .orderBy("np").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(sweep.map(_._1).toSeq == Seq(1L, 2L, 4L))
    sweep.foreach { case (np, nq2, nExact, nHit, micro) =>
      assert(nq2 == m("ann_recall_n_queries"), s"np=$np sample drifts")
      assert(nHit <= nExact && micro == math.floor(nHit * 1e6 / nExact).toLong)
      assert(m(s"ann_sweep_np${np}_recall_micro") == micro)
    }
    assert(sweep(1)._4 == m("ann_recall_hits"),
      "sweep np=2 rung diverges from the certified operating point")
    // the shipped OPERATING POINT (i80's inversion): smallest rung
    // meeting the target, or -1 = re-cluster with the curve's ceiling
    assert(m("ann_op_target_micro") == 500000L)
    val qualifying = sweep.filter(_._5 >= m("ann_op_target_micro"))
    if (qualifying.nonEmpty) {
      assert(m("ann_op_nprobe") == qualifying.map(_._1).min,
        "manifest operating point is not the smallest qualifying rung")
      assert(m("ann_op_recall_micro") ==
        qualifying.minBy(_._1)._5, "operating-point recall drifts")
    } else {
      assert(m("ann_op_nprobe") == -1L,
        "no rung qualifies but the manifest did not signal re-cluster")
      assert(m("ann_op_recall_micro") == sweep.map(_._5).max)
    }
    // the manifest CERTIFIES the written index: a deterministic query
    // sample's recall@10, recomputable exactly from the same artifacts
    val nq = m("ann_recall_n_queries")
    assert(nq == math.min(32L, m("n_ann_vectors")), s"sample size: $nq")
    assert(m("ann_recall_hits") <= nq * 10)
    val micro = m("ann_recall_at10_micro")
    assert(micro >= 0 && micro <= 1000000L, s"recall micro: $micro")
    assert(micro > 0, "certified recall is zero — probe broken")
    val recomputed = LlmOps.annCertify(e,
      s"$outA/ann_index.parquet", s"$outA/ann_centroids.parquet")
    assert(recomputed == m.view.filterKeys(_.startsWith("ann_recall")).toMap,
      s"certification not reproducible: $recomputed")
    // the PQ rung beside the SQ8 index (r11): 8-code rows covering the
    // FULL kept embedding set (the ADC needs no maxabs guard), a
    // constant-size codebook, and a certification triple produced by
    // the SAME query-sample rule as the SQ8 one — the two
    // recall_at10_micro fields are the like-for-like compression cost
    val pqCodes = spark.read.parquet(s"$outA/ann_pq_codes.parquet")
    val pqCb = spark.read.parquet(s"$outA/ann_pq_codebook.parquet")
    assert(pqCodes.schema.fieldNames.sorted.toSeq == Seq("codes", "vec_id"))
    val pqIds = pqCodes.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pqIds == e.select("vec_id").collect().map(_.getLong(0)).toSet,
      "PQ codes do not cover exactly the kept corpus")
    assert(m("n_ann_pq_vectors") == pqIds.size.toLong)
    assert(m("n_ann_pq_codebook_rows") == pqCb.count() &&
      pqCb.count() <= LlmOps.PqM.toLong * LlmOps.PqK * LlmOps.PqDsub)
    assert(m("ann_pq_recall_n_queries") == m("ann_recall_n_queries"),
      "PQ and SQ8 certifications drifted to different query samples")
    assert(m("ann_pq_recall_hits") <= m("ann_pq_recall_n_queries") * 10)
    val pqMicro = m("ann_pq_recall_at10_micro")
    assert(pqMicro > 0 && pqMicro <= 1000000L, s"PQ recall micro: $pqMicro")
    // the RESIDUAL rung (r12): codes partitioned by the SAME cells the
    // SQ8 index serves (one quantizer pair), 256-codeword codebook,
    // certified on the same query sample — the manifest's three
    // recall_at10_micro fields price the full compression ladder
    val rCodes = spark.read.parquet(s"$outA/ann_rpq_codes.parquet")
    assert(rCodes.schema.fieldNames.sorted.toSeq ==
      Seq("cell", "codes", "vec_id"))
    val rIds = rCodes.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rIds == idxIds, "residual codes do not cover the cell model's corpus")
    assert(m("n_ann_rpq_vectors") == rIds.size.toLong)
    val cellPairs = rCodes.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sqCells = codes.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellPairs == sqCells, "residual cells drift from the SQ8 index cells")
    assert(m("ann_rpq_recall_n_queries") == m("ann_recall_n_queries"),
      "residual certification drifted to a different query sample")
    val rMicro = m("ann_rpq_recall_at10_micro")
    assert(rMicro > 0 && rMicro <= 1000000L, s"residual recall micro: $rMicro")
    // the residual chain's OWN curve + operating point (r14, closing r13
    // verdict #1's pipeline half): the served index carries the curve
    // its deployment decision reads — sweep rows consistent with the
    // manifest, np=2 rung = the certified triple, inversion = smallest
    // qualifying rung or -1
    val rSweep = spark.read.parquet(s"$outA/ann_rpq_sweep.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rSweep.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rSweep.foreach { case (np, nq2, _, _, micro) =>
      assert(m(s"ann_rpq_sweep_np${np}_recall_micro") == micro,
        s"residual sweep np=$np drifts from the manifest")
      assert(nq2 == m("ann_rpq_recall_n_queries"),
        s"residual sweep np=$np query sample drifts")
    }
    assert(rSweep(1)._4 == m("ann_rpq_recall_hits"),
      "np=2 sweep rung is not the certified residual triple")
    assert(m("ann_rpq_op_target_micro") == 500000L)
    val rQual = rSweep.filter(_._5 >= m("ann_rpq_op_target_micro"))
    if (rQual.nonEmpty) {
      assert(m("ann_rpq_op_nprobe") == rQual.map(_._1).min,
        "residual operating point is not the smallest qualifying rung")
      assert(m("ann_rpq_op_recall_micro") == rQual.minBy(_._1)._5)
    } else {
      assert(m("ann_rpq_op_nprobe") == -1L,
        "an unqualifying residual curve must signal re-cluster")
      assert(m("ann_rpq_op_recall_micro") == rSweep.map(_._5).max)
    }
  }

  test("--ann opq: the variance profile DECIDES — declined on the balanced fixture, applied+certified on skewed geometry") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val outO = Util.scratch("prep_out_annopq")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outO, "minhash",
      ann = "opq"))
    // the fixture corpus is variance-balanced (measured 1.04–1.08× at
    // every SF): the rung must DECLINE, record why, and write nothing
    assert(m("ann_opq_applied") == 0L)
    assert(m("ann_opq_skew_micro") >= 1000000L &&
      m("ann_opq_skew_micro") < m("ann_opq_skew_threshold_micro"),
      s"fixture skew ${m("ann_opq_skew_micro")} outside the declining band")
    assert(!new java.io.File(s"$outO/ann_opq_codes.parquet").exists(),
      "a declined rung must not write the rotated artifact")
    assert(!m.contains("ann_opq_recall_at10_micro"),
      "a declined rung must not fabricate a certification")
    // "opq" still ships the full write-rung ladder beside the decision
    assert(new java.io.File(s"$outO/ann_index.parquet").exists())
    assert(new java.io.File(s"$outO/ann_rpq_codes.parquet").exists())
    // the APPLIED branch, on i81's skewed geometry (8 hot dims carrying
    // ~100× the energy inside ONE natural slice): skew ≫ threshold →
    // rotated artifact written, permutation shipped, recall certified
    val n = 1200
    val vecs = (0 until n).map { v =>
      val arr = Array.tabulate(64) { dd =>
        val h = (((v * 2654435761L + dd * 40503L) % 1000003L) % 997L).toInt
        if (dd < 8) (h - 498) / 250.0f else (h - 498) / 25000.0f
      }
      (v.toLong, arr.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding").localCheckpoint()
    val idxDir = Util.scratch("opq_dec_idx")
    val centDir = Util.scratch("opq_dec_cent")
    emb.select(col("vec_id"), lit(0).as("cell"))
      .write.mode("overwrite").parquet(idxDir)
    Seq.tabulate(64)(p => (0, p, 0.0)).toDF("cell", "pos", "c")
      .write.mode("overwrite").parquet(centDir)
    val codesDir = Util.scratch("opq_dec_codes")
    val cbDir = Util.scratch("opq_dec_cb")
    val mo = LlmOps.opqDecideArtifact(emb, idxDir, centDir, codesDir, cbDir)
    assert(mo("ann_opq_applied") == 1L)
    assert(mo("ann_opq_skew_micro") >= mo("ann_opq_skew_threshold_micro"),
      s"skewed plant read balanced: ${mo("ann_opq_skew_micro")}")
    assert(mo("n_ann_opq_vectors") == n.toLong)
    assert(mo("ann_opq_recall_at10_micro") > 0L &&
      mo("ann_opq_recall_at10_micro") <= 1000000L)
    // the permutation ships beside the codes — a probe cannot build its
    // ADC grid without it
    assert(new java.io.File(codesDir + "_perm.json").exists())
  }

  test("--shuffle hash attaches the i51 training order: a dense shuffled permutation") {
    pipelineRan()
    val outS = Util.scratch("prep_out_shuffle")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outS, "minhash",
      shuffle = "hash"))
    val written = spark.read.parquet(s"$outS/documents.parquet")
    assert(written.columns.contains("train_pos"))
    val rows = written.select("doc_id", "train_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length.toLong == m("n_final"))
    // dense permutation 1..n_final over the KEPT set
    val positions = rows.map(_._2)
    assert(positions.distinct.length == rows.length)
    assert(positions.min == 1L && positions.max == rows.length.toLong)
    // and it is exactly the i51 order restricted to the kept set: rank by
    // (skey, doc_id) with the same multiplier
    val expected = rows.map { case (id, _) => id -> (id * 741103597L) % 1000000007L }
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    rows.foreach { case (id, pos) =>
      assert(pos == expected(id), s"doc $id train_pos $pos != i51 order ${expected(id)}")
    }
    // the default run stays shuffle-free (no train_pos column)
    assert(!spark.read.parquet(s"$outDir/documents.parquet")
      .columns.contains("train_pos"))
  }

  test("--shuffle curriculum orders kept docs easy->hard, unscoreable last") {
    pipelineRan()
    val outC = Util.scratch("prep_out_curr")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outC, "minhash",
      shuffle = "curriculum"))
    val written = spark.read.parquet(s"$outC/documents.parquet")
    val rows = written.select("doc_id", "train_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length.toLong == m("n_final"))
    // dense permutation over the kept set
    val positions = rows.map(_._2)
    assert(positions.distinct.length == rows.length)
    assert(positions.min == 1L && positions.max == rows.length.toLong)
    // the scored prefix is exactly the i55 core's order restricted to the
    // kept set (the gated op on the same kept frame)
    val keptIds = rows.map(_._1).toSet
    val ord = graft.ops.CorpusOps.curriculumOrder(
        written.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val posById = rows.toMap
    ord.foreach { case (id, p) =>
      assert(keptIds(id) && posById(id) == p,
        s"scored doc $id at ${posById(id)} != curriculum pos $p")
    }
    // unscoreable docs occupy the tail block
    val unscored = rows.filterNot { case (id, _) => ord.contains(id) }
    if (unscored.nonEmpty) {
      assert(unscored.map(_._2).min == ord.size.toLong + 1,
        "unscoreable docs must start right after the scored block")
    }
  }

  test("--media dedup leaves the kept set pair-free under both image hashes") {
    val outV = Util.scratch("prep_media")
    val m = PrepMain.run(spark,
      PrepMain.Opts(sfDir, outV, "minhash", media = "dedup"))
    assert(m("n_media_dropped") > 0, "fixture must exercise the media stage")
    assert(m("n_media_dropped") <= m("n_media_members_corpus"),
      "stage can't drop more than the corpus-wide member set")
    // stage arithmetic including the media term
    assert(m("n_quality_kept") - m("n_dedup_dropped") - m("n_media_dropped") -
      m("n_decontam_dropped") == m("n_final"),
      "stage arithmetic doesn't reconcile with the media stage")
    // re-run BOTH gated image ops ON the output (the i10 pair-free
    // convention): every exact fingerprint group must be a singleton and
    // no perceptual pair may survive — under the ops' own oracles
    val exact = graft.ops.MultimodalOps.m5_image_dedup.fn(spark, outV)
      .filter(!col("keep")).count()
    assert(exact == 0, s"$exact exact image dups survived the media stage")
    val near = graft.ops.MultimodalOps.m9_image_near_dup.fn(spark, outV).count()
    assert(near == 0, s"$near perceptual near-dup pairs survived")
  }

  test("--media dedup=image,audio,video leaves the kept set pair-free " +
      "under all four media hashes") {
    val outV = Util.scratch("prep_media_all")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outV, "minhash",
      media = "dedup=image,audio,video"))
    // per-modality manifest fields present and each bounded by the union
    Seq("image", "audio", "video").foreach { mod =>
      assert(m.contains(s"n_media_members_$mod"), s"missing $mod count")
      assert(m(s"n_media_members_$mod") <= m("n_media_members_corpus"),
        s"$mod members exceed the union")
    }
    assert(m("n_media_members_audio") > 0 && m("n_media_members_video") > 0,
      "fixture must exercise the audio and video drop sets")
    // the ADVICE-r8 total-loss counter exists whenever image is selected
    assert(m.contains("n_media_img_clusters_lost"))
    assert(m("n_quality_kept") - m("n_dedup_dropped") - m("n_media_dropped") -
      m("n_decontam_dropped") == m("n_final"),
      "stage arithmetic doesn't reconcile with the media stage")
    // re-run every composed gated op ON the output (the i10 pair-free
    // convention, under the ops' own oracles)
    val M = graft.ops.MultimodalOps
    assert(M.m5_image_dedup.fn(spark, outV).filter(!col("keep")).count() == 0,
      "exact image dups survived")
    assert(M.m9_image_near_dup.fn(spark, outV).count() == 0,
      "perceptual image pairs survived")
    assert(M.m10_audio_near_dup.fn(spark, outV).count() == 0,
      "acoustic near-dup pairs survived")
    assert(M.m11_video_near_dup.fn(spark, outV).count() == 0,
      "video keyframe near-dup pairs survived")
  }

  test("--media dedup=audio drops only the acoustic b-sides") {
    val outV = Util.scratch("prep_media_audio")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outV, "none",
      media = "dedup=audio"))
    assert(m.contains("n_media_members_audio"))
    assert(!m.contains("n_media_members_image") &&
      !m.contains("n_media_members_video") &&
      !m.contains("n_media_img_clusters_lost"),
      "unselected modalities must not appear in the manifest")
    assert(graft.ops.MultimodalOps.m10_audio_near_dup.fn(spark, outV)
      .count() == 0, "acoustic near-dup pairs survived")
  }

  test("argv parsing: flags map to opts, bad input rejected") {
    val o = PrepMain.parse(Array("--in", "a", "--out", "b", "--dedup", "none"))
    assert(o == PrepMain.Opts("a", "b", "none"))
    val o2 = PrepMain.parse(Array("--in", "a", "--out", "b",
      "--decontam", "bd", "--min-containment", "0.9", "--dedup-tau", "0.85",
      "--min-tokens", "30", "--max-dup-frac", "0.5", "--max-top-bigram", "0.2",
      "--min-quality", "0.3"))
    assert(o2 == PrepMain.Opts("a", "b", "minhash", dedupTau = 0.85,
      decontam = Some("bd"), minContainment = 0.9, minTokens = 30L,
      maxDupFrac = 0.5, maxTopBigram = 0.2, minQuality = 0.3))
    intercept[IllegalArgumentException](PrepMain.parse(Array("--in", "a")))
    intercept[IllegalArgumentException](PrepMain.parse(Array("--bogus", "x")))
    // dangling flag (value forgotten) must give the usage error, not AIOOBE
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out")))
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--dedup", "simhash")))
    // sub-0.8 dedup tau would silently lose LSH recall — refused loudly
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--dedup-tau", "0.5")))
    // scrub flags: valid values map through, degenerate ones are refused
    val o3 = PrepMain.parse(Array("--in", "a", "--out", "b",
      "--scrub", "substring", "--scrub-span", "12", "--scrub-min-docs", "3"))
    assert(o3.scrub == "substring" && o3.scrubSpan == 12 && o3.scrubMinDocs == 3)
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--scrub", "lines")))
    intercept[IllegalArgumentException](PrepMain.parse(Array("--in", "a",
      "--out", "b", "--scrub", "substring", "--scrub-span", "1")))
    // span/min-docs values only constrain an ENABLED scrub stage
    assert(PrepMain.parse(Array("--in", "a", "--out", "b",
      "--scrub-span", "1")).scrubSpan == 1)
    // shuffle flag: valid values map through, others refused
    assert(PrepMain.parse(Array("--in", "a", "--out", "b",
      "--shuffle", "hash")).shuffle == "hash")
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--shuffle", "rand")))
    assert(PrepMain.parse(Array("--in", "a", "--out", "b",
      "--chunks", "write")).chunks == "write")
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--chunks", "maybe")))
    // media flag: valid values map through, others refused
    assert(PrepMain.parse(Array("--in", "a", "--out", "b",
      "--media", "dedup")).media == "dedup")
    assert(PrepMain.parse(Array("--in", "a", "--out", "b",
      "--media", "dedup=audio,video")).media == "dedup=audio,video")
    assert(PrepMain.mediaModalities("dedup") ==
      Set("image", "audio", "video"))
    assert(PrepMain.mediaModalities("dedup=video") == Set("video"))
    intercept[IllegalArgumentException](
      PrepMain.parse(Array("--in", "a", "--out", "b", "--media", "m5")))
    intercept[IllegalArgumentException]( // unknown modality
      PrepMain.parse(Array("--in", "a", "--out", "b", "--media", "dedup=pdf")))
    intercept[IllegalArgumentException]( // empty subset
      PrepMain.parse(Array("--in", "a", "--out", "b", "--media", "dedup=")))
  }

  test("--chunks write emits a chunk table covering every kept doc end-to-end") {
    import org.apache.spark.sql.functions._
    val outC = Util.scratch("prep_out_chunks")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outC, "minhash",
      chunks = "write"))
    val kept = spark.read.parquet(s"$outC/documents.parquet")
    val ch = spark.read.parquet(s"$outC/chunks.parquet")
    assert(m("n_chunks") == ch.count() && m("n_chunks") > 0)
    assert(m("n_chunked_docs") ==
      kept.filter(col("text").isNotNull).count(),
      "every kept doc with text must be chunked")
    // geometry audit straight off the written artifact: the last chunk
    // ends exactly at n_tok, chunk ids are dense from 0, and the chunk
    // count matches the i58 integer formula
    val (w, st) = (graft.ops.CorpusOps.ChunkW, graft.ops.CorpusOps.ChunkS)
    val bad = ch.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_chunk_toks") - 1).as("covered"),
        max(col("n_tok")).as("n_tok"),
        count(lit(1)).as("nc"), max(col("chunk_id")).as("maxid"))
      .filter(col("covered") =!= col("n_tok") ||
        col("nc") =!= col("maxid") + 1 ||
        col("nc") =!= when(col("n_tok") <= w, lit(1L))
          .otherwise(expr(s"1 + (n_tok - $w + ${st - 1}) DIV $st")))
    // count once — an interpolated clue with bad.head(3) would re-run
    // the aggregation job on every PASSING execution (eager clue eval)
    val nBad = bad.count()
    assert(nBad == 0, s"chunk geometry broken for $nBad docs")
  }

  test("--tokenize bpe emits tokens whose piece-concatenation restores hex of every word") {
    import org.apache.spark.sql.functions._
    val outT = Util.scratch("prep_out_tokens")
    val m = PrepMain.run(spark, PrepMain.Opts(sfDir, outT, "none",
      tokenize = "bpe"))
    val kept = spark.read.parquet(s"$outT/documents.parquet")
    val tk = spark.read.parquet(s"$outT/tokens.parquet")
    assert(m("n_tokenized_docs") == tk.count() && m("n_tokenized_docs") > 0)
    // losslessness end-to-end on the written artifact: stripping the
    // piece separators restores the concatenated hex byte spelling of
    // the doc's tokens exactly — merges regroup byte symbols, they can
    // never alter or cross them (a cross-word merge would need the
    // literal '<a><b>' to span the '> <' gap, which it cannot)
    val joined = kept
      .filter(col("text").isNotNull &&
        size(expr("filter(split(text, ' '), w -> w <> '')")) > 0)
      .select(col("doc_id"),
        expr("array_join(transform(filter(split(text, ' '), w -> w <> ''), w -> hex(w)), '')")
          .as("want"))
      .join(tk, "doc_id")
    assert(joined.count() == tk.count(),
      "tokens.parquet keys diverge from the written corpus")
    val broken = joined
      .filter(replace(col("pieces"), lit(" "), lit("")) =!= col("want"))
      .count()
    assert(broken == 0, s"piece concatenation fails to restore hex for $broken docs")
    // the learned merge table must actually merge: pieces fewer than raw
    // byte symbols somewhere, never more anywhere
    val stats = joined
      .select(sum(when(col("n_pieces") * 2 > length(col("want")), 1L)
          .otherwise(0L)).as("over"),
        sum(when(col("n_pieces") * 2 < length(col("want")), 1L)
          .otherwise(0L)).as("merged"))
      .head()
    assert(stats.getLong(0) == 0, "a doc emitted more pieces than byte symbols")
    assert(stats.getLong(1) > 0, "no doc compressed — the merge table is dead")
  }
}
