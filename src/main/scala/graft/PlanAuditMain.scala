package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate,
  Join, LogicalPlan, Window => WindowNode}
import org.apache.spark.sql.functions.{col, xxhash64}

/** Count-pruned-plan audit (the r7 judge's #4): Bench times each key via
  * `.count()`, and Catalyst is ALLOWED to rewrite the counted plan — most
  * visibly eliminating a LEFT join whose right side is unique on the key
  * and contributes no surviving column (d20's best-match join, i52's
  * report join), and pruning window/generate/aggregate stages whose
  * output no column of a bare count references — so such BENCH rows time
  * a reduced plan while the VERIFY gate runs the real pipeline. That is
  * correct optimizer behavior and the totals stay comparable across
  * rounds, but per-key seconds must not be read as operator cost. This
  * audit makes the class EXHAUSTIVE instead of anecdotal: for every key
  * it compares the operator's own optimized plan against the optimized
  * plan of `df.groupBy().count()` (exactly the plan `Dataset.count()`
  * executes) and flags keys whose join/window/generate/aggregate count
  * DROPS under the count. The committed result lives in `Flagged`
  * (PlanAuditSpec re-runs the audit and fails on ANY drift, so the list
  * cannot silently rot), the honest timings live in the ladder's
  * `forced` family (`LadderMain forced` — every flagged key wrapped so
  * all output columns are referenced), and PERF.md carries the table.
  *
  * Streaming (j*) keys are exempt by construction: their work happens
  * inside the micro-batch harness when the frame is BUILT, so a count
  * over the result frame prunes nothing that was timed.
  */
object PlanAudit {

  /** joins, aggregates, windows, generates in an optimized plan. */
  def shape(p: LogicalPlan): (Int, Int, Int, Int) = {
    var joins = 0; var aggs = 0; var wins = 0; var gens = 0
    p.foreach {
      case _: Join => joins += 1
      case _: Aggregate => aggs += 1
      case _: WindowNode => wins += 1
      case _: Generate => gens += 1
      case _ =>
    }
    (joins, aggs, wins, gens)
  }

  /** Which operator stages vanish when `df` is counted — empty = honest
    * bench row. The counted side's Aggregate tally excludes the count's
    * own top-level Aggregate.
    */
  def drops(df: DataFrame): Seq[String] =
    dropsFromShapes(shape(df.queryExecution.optimizedPlan),
      shape(df.groupBy().count().queryExecution.optimizedPlan))

  /** The drop derivation from two precomputed shapes — for callers that
    * already optimized both plans (PlanAuditMain prints the raw tallies
    * too, and re-optimizing the counted plan per key is the expensive
    * part on the multi-join keys this audit exists for).
    */
  def dropsFromShapes(plain: (Int, Int, Int, Int),
      counted: (Int, Int, Int, Int)): Seq[String] = {
    val (j0, a0, w0, g0) = plain
    val (j1, a1, w1, g1) = counted
    Seq(
      if (j1 < j0) Some(s"joins $j0->$j1") else None,
      if (a1 - 1 < a0) Some(s"aggs $a0->${a1 - 1}") else None,
      if (w1 < w0) Some(s"windows $w0->$w1") else None,
      if (g1 < g0) Some(s"generates $g0->$g1") else None).flatten
  }

  /** Forces every output column into the counted plan: a row-count-
    * preserving filter on xxhash64 over the full row references every
    * column, so the count executes the real pipeline. The predicate is
    * `pmod(hash, p) >= 0` — always true (pmod is non-negative), but a
    * value-range tautology Catalyst does not prove, so it neither
    * constant-folds away (the first attempt used `hash IS NOT NULL`,
    * which null-intolerance folds to TRUE and the prune returns) nor
    * drops rows. The ladder's `forced` family and `_forced` rows use
    * this.
    */
  def force(df: DataFrame): DataFrame =
    df.where(org.apache.spark.sql.functions.pmod(
      xxhash64(df.columns.map(col): _*),
      org.apache.spark.sql.functions.lit(1000000007L)) >= 0)

  /** The committed audit result at sf0.001 (r8) — every non-streaming
    * key whose counted plan drops an operator stage. PlanAuditSpec
    * re-derives this set and fails on drift in either direction.
    */
  val Flagged: Set[String] = Set(
    "b8_add_pkey", "b16_cascade_delete", "d7_join_asof", "d20_xmatch_best",
    "e3_agg_distinct", "e11_pivot", "e13_agg_salted_skew", "e15_sketch_union",
    "f1_win_rank", "f3_win_lag_lead", "f4_win_running_frame",
    "f5_win_sliding_frame", "f6_win_range_frame", "f7_win_first_last",
    "f8_win_distribution", "f9_win_ignore_nulls",
    "i21_shard_assign", "i22_seq_pack", "i32_bigram_lm", "i33_vocab_df",
    "i34_kmeans_lloyd", "i37_dedup_lines", "i38_doc_logprob",
    "i40_dedup_keep_best", "i41_dedup_substring", "i44_domain_cap",
    "i49_perplexity_buckets", "i51_global_shuffle",
    "i52_contamination_report", "i53_token_histogram",
    "i55_curriculum_order", "i57_sft_pack", "m5_image_dedup",
    // m15 (r14): m5's window-group shape over the dual-codec hashes —
    // the same value-independent window a bare count prunes; its
    // _forced ladder row times the real group pass
    "m15_jpeg_dedup",
    // b18 (r8): the profile Aggregate feeds explode(array(<4 structs>)),
    // whose cardinality is value-independent — a bare count prunes the
    // aggregates entirely; the _forced ladder row times the real profile
    "b18_table_profile",
    // b19 (r9): b18's shape with the sketch pass — same value-independent
    // explode, so a bare count drops one of the two aggregates; the
    // _forced row times the real sketch+anchor profile
    "b19_profile_sketch",
    // i65 (r10): recall@10 is a count over the EXACT top-10 left-joined
    // to the pruned set — under a bare .count() Catalyst collapses the
    // per-query windows and the pruned-side joins (the group count is
    // |queries|×10 regardless of hit values); the _forced row times the
    // full certification: both rankings + the hit join
    "i65_ann_recall",
    // i66 (r10): the i65 class ×3 rungs — the union of three 1-row
    // aggregates counts to 3 regardless of hit values, so EVERY join
    // and window prunes; the _forced row times the full sweep
    "i66_ann_nprobe_sweep",
    // i67 (r11): i66's class, two indexes per rung — the union of three
    // 1-row aggregates counts to 3 regardless of recall values, so the
    // six pruned chains and the truth join all prune under a bare
    // count; the _forced row times the full dual certification
    "i67_ann_ivf_kmeans",
    // i68 (r11): the per-cell refresh profile counts to |cells|
    // regardless of n_base/n_new values — the left join to the new
    // assignment (unique per cid) and the count aggregates all prune
    // under a bare count (audit: joins 2->0, aggs 4->1); the _forced
    // row times the real refresh assignment
    "i68_ann_index_refresh",
    // i70 (r11): the i65 class against the PQ index — the per-query
    // count is |queries|×10 regardless of hit values, so the ADC probe
    // joins, both rank windows and the hit join prune under a bare
    // count (audit: joins 6->1, aggs 3->1, windows 3->1); the _forced
    // row times the full certification
    "i70_ann_pq_recall",
    // i72 (r11): i70's class with BOTH PQ chains (flat + cell-pruned)
    // left-joined to one truth — the per-query count is |queries|
    // regardless of hit values, so both probe chains prune under a
    // bare count; the _forced row times the dual certification
    "i72_ann_ivfpq_recall",
    // i76 (r12): i72's class with the residual chain — per-query count
    // is |queries| regardless of hit values, so both probe chains prune
    // under a bare count (audit: joins 13->0, aggs 6->1, windows 4->0,
    // generates 5->0); the _forced row times the dual certification
    "i76_ann_rivfpq_recall",
    // i77 (r12): the profile counts to |cells| regardless of n_live, so
    // the inner pre/post join prunes one side under a bare count
    // (audit: joins 2->1); the _forced row times the full measured
    // lifecycle profile
    "i77_ann_compaction",
    // i78 (r12): output is one row per arriving vector regardless of
    // the encoded code VALUES, so the per-vector code aggregation
    // prunes under a bare count (audit: aggs 3->2); the _forced row
    // times the full assign+residualize+encode chain
    "i78_ann_rivfpq_refresh",
    // i81 (r13): i76's class with the OPQ chain — per-query count is
    // |queries| regardless of hit values, so both residual probe
    // chains prune under a bare count (audit: joins 16->0, aggs 7->1,
    // windows 4->0, generates 6->0); the _forced row times the dual
    // certification
    "i81_ann_opq_recall",
    // i82 (r13): the i67 class — per-query count is |queries|
    // regardless of hit values, so both pruned chains prune under a
    // bare count (audit: joins 8->0, windows 4->0); the _forced row
    // times the dual re-cluster certification
    "i82_ann_recluster")
}

/** One-shot audit runner: prints one JSON line per key (drops + node
  * tallies) and a final summary line with the flagged set.
  *
  * Usage: runMain graft.PlanAuditMain [sfDir]   (default sf0.001 — plan
  * shape, not data scale, is what's audited; SPARK_GRAFT_ONLY subsets)
  */
object PlanAuditMain {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Util.sessionBuilder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = Util.onlySubset(SparkEntry.queries) match {
      case None => SparkEntry.queries
      case Some(want) => SparkEntry.queries.filter(p => want(p._1))
    }
    var flagged = List.empty[String]
    selected.toSeq.sortBy(_._1).foreach { case (key, fn) =>
      try {
        val df = fn(spark, sfDir)
        val (j0, a0, w0, g0) = PlanAudit.shape(df.queryExecution.optimizedPlan)
        val (j1, a1, w1, g1) =
          PlanAudit.shape(df.groupBy().count().queryExecution.optimizedPlan)
        // derive drops from the two shapes already computed — calling
        // PlanAudit.drops(df) here would rebuild and re-optimize the
        // counted plan a second time (a fresh groupBy().count() is a new
        // Dataset, so QueryExecution caching does not help), which is
        // measurable on exactly the heavy multi-join keys the audit is for
        val drops =
          PlanAudit.dropsFromShapes((j0, a0, w0, g0), (j1, a1, w1, g1))
        if (drops.nonEmpty) flagged ::= key
        println(s"""{"key":"$key","flag":${drops.nonEmpty},""" +
          s""""drops":"${drops.mkString(", ")}","joins":[$j0,$j1],""" +
          s""""aggs":[$a0,${a1 - 1}],"windows":[$w0,$w1],"generates":[$g0,$g1]}""")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"""{"key":"$key","error":"${e.getClass.getSimpleName}: """ +
          s"""${Option(e.getMessage).getOrElse("").replaceAll("[\"\\n]", " ").take(120)}"}""")
      }
    }
    println(s"""{"audit":"count-pruned","flagged":[${
      flagged.sorted.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
  }
}
