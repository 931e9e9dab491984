package graft

import graft.ops.RelOps

class RelOpsSpec extends SparkTestBase {

  test("d10 plan carries a dynamic partition pruning expression") {
    val df = RelOps.d10_join_dpp.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in:\n${plan.take(1200)}")
    // expected: years whose order count is even (the dim predicate)
    import org.apache.spark.sql.functions._
    val expected = Tables.t(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y")).count()
      .filter(col("count") % 2 === 0)
      .collect().map(_.getInt(0)).toSet
    val years = df.select("o_year").distinct().collect().map(_.getInt(0)).toSet
    assert(years == expected, s"got $years expected $expected")
  }

  test("d11 bucketized range lookup plans an equi-join, not a nested loop") {
    import org.apache.spark.sql.functions._
    val df = RelOps.d11_join_range_lookup.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range lookup fell back to a non-equi plan:\n${plan.take(1000)}")
    // every reported interval count matches a direct BETWEEN recount
    val out = df.collect()
    assert(out.nonEmpty)
    out.take(5).foreach { r =>
      val n = Tables.t(spark, sfDir, "orders")
        .filter(col("o_totalprice") >= r.getLong(1) && col("o_totalprice") <= r.getLong(2))
        .count()
      assert(n == r.getLong(3), s"interval [${r.getLong(1)},${r.getLong(2)}] recount mismatch")
    }
  }

  test("d12 interval-overlap join: equi-bucket plan, exact pair set") {
    val df = RelOps.d12_join_interval_overlap.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain-Scala all-pairs reference over the same fabricated intervals
    val keys = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    def iv(k: Long, mult: Long, m: Int) = {
      val s = (k * mult) % 100000L; (s, s + 1 + k % m)
    }
    val as = keys.filter(_ % 37 == 0).map(k => k -> iv(k, 2654435761L, 50))
    val bs = keys.filter(_ % 11 == 0).map(k => k -> iv(k, 1099087573L, 40))
    val expect = (for {
      (ai, (sa, ea)) <- as; (bi, (sb, eb)) <- bs
      if sa <= eb && sb <= ea
    } yield (ai, bi)).toSet
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    assert(out.nonEmpty, "fixture produced no overlaps (vacuous)")
    // the distinct() is load-bearing ONLY if some matching pair's shared
    // overlap REGION crosses a bucket boundary (then the pair meets in
    // two buckets and would duplicate without the dedup) — the r4 review
    // found the earlier interval-straddles-a-boundary form vacuous
    val multi = for {
      (ai, (sa, ea)) <- as; (bi, (sb, eb)) <- bs
      if sa <= eb && sb <= ea &&
        math.min(ea, eb) / 32 > math.max(sa, sb) / 32
    } yield (ai, bi)
    assert(multi.nonEmpty,
      "no overlapping pair shares >1 bucket — the pair-distinct is untested")
  }

  test("d13 xmatch: grid candidates + exact refine equal brute force") {
    import org.apache.spark.sql.functions._
    val df = RelOps.d13_join_xmatch.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"xmatch fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // plain-Scala brute force over the same planted coordinates
    def coords(k: Long) = ((k * 7919L) % 360000L, (k * 104729L) % 180000L - 90000L)
    val as = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).map(k => k -> coords(k))
    val bs = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0)).map(k => k -> coords(k))
    val expect = (for {
      (ai, (raa, deca)) <- as; (bi, (rab, decb)) <- bs
      dr = math.min(math.abs(raa - rab), 360000L - math.abs(raa - rab))
      dd = deca - decb
      if dr * dr + dd * dd <= 4000000L
    } yield (ai, bi) -> (dr * dr + dd * dd)).toMap
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    assert(out.nonEmpty, "fixture produced no matches (vacuous)")
    // the planted same-key identity (coords(k) == coords(k)) must appear
    // as zero-distance matches whenever both catalogs hold key k
    val shared = as.map(_._1).toSet intersect bs.map(_._1).toSet
    assert(shared.nonEmpty && shared.forall(k => out.get((k, k)).contains(0L)),
      "planted zero-distance identities missing")
  }

  test("d18 spherical xmatch: zones + polynomial haversine equal brute force; pole and seam live") {
    import graft.ops.SphereSql
    val df = RelOps.d18_join_xmatch_sphere.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"spherical xmatch fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val as = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val bs = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val expect = (for {
      (ai, (raa, deca)) <- as; (bi, (rab, decb)) <- bs
      h = SphereSql.haversineD(raa, deca, rab, decb)
      if h <= SphereSql.ThresholdD
    } yield (ai, bi) -> math.floor(h * 1.0e12).toLong).toMap
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    assert(out.nonEmpty, "fixture produced no matches (vacuous)")
    // the spherical delta: pole-cap pairs whose WRAPPED RA difference
    // exceeds the radius still match (flat-sky d13 metric rejects them)
    val coordsA = as.toMap; val coordsB = bs.toMap
    val poleDelta = out.keys.filter { case (ai, bi) =>
      val (raa, deca) = coordsA(ai); val (rab, decb) = coordsB(bi)
      val dr = math.min(math.abs(raa - rab), 360000L - math.abs(raa - rab))
      deca >= 88000 && decb >= 88000 && dr > 2000
    }
    assert(poleDelta.nonEmpty,
      "no pole pair with wrapped dRA > radius — the cos-dec surface is untested")
    // the seam: matched pairs whose RAW RA difference exceeds 300 deg
    val seam = out.keys.filter { case (ai, bi) =>
      math.abs(coordsA(ai)._1 - coordsB(bi)._1) > 300000 &&
        coordsA(ai)._2 < 88000
    }
    assert(seam.nonEmpty, "no non-polar match across the RA seam — wrap untested")
  }

  test("d21 general-radius xmatch: 0.5-deg matches equal brute force and subset d18") {
    import graft.ops.SphereSql
    val df = RelOps.d21_xmatch_radius.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"general-radius xmatch fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val as = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val bs = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val thr = { val st = SphereSql.sinHalfD(500.0); st * st }
    val expect = (for {
      (ai, (raa, deca)) <- as; (bi, (rab, decb)) <- bs
      h = SphereSql.haversineD(raa, deca, rab, decb)
      if h <= thr
    } yield (ai, bi) -> math.floor(h * 1.0e12).toLong).toMap
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    assert(out.nonEmpty, "fixture produced no matches (vacuous)")
    // the halved radius must be a STRICT subset of the 2-deg gate — the
    // covering adapts to (height, sep) rather than riding d18's slack
    val d18 = RelOps.d18_join_xmatch_sphere.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet.subsetOf(d18), "0.5-deg result not within the 2-deg result")
    assert(out.size < d18.size, "halving the radius dropped nothing — vacuous")
  }

  test("d20 best-match: per-source argmin with unique tiebreak; unmatched sources survive as NULLs") {
    import graft.ops.SphereSql
    val df = RelOps.d20_xmatch_best.fn(spark, sfDir)
    val out = df.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getLong(1), r.getLong(2))))
    }.toMap
    val as = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val bs = Tables.t(spark, sfDir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .map(k => k -> SphereSql.catalogD(k))
    val expect = as.map { case (ai, (raa, deca)) =>
      val inRadius = bs.flatMap { case (bi, (rab, decb)) =>
        val h = SphereSql.haversineD(raa, deca, rab, decb)
        if (h <= SphereSql.ThresholdD)
          Some((math.floor(h * 1.0e12).toLong, bi)) else None
      }
      ai -> (if (inRadius.isEmpty) None
        else { val (d2, bi) = inRadius.min; Some((bi, d2)) })
    }.toMap
    assert(out == expect, s"argmin diverges: got ${out.count(_._2.nonEmpty)} " +
      s"matched vs expect ${expect.count(_._2.nonEmpty)}")
    assert(out.size == as.size, "LEFT semantics lost rows: every source must appear once")
    assert(out.values.exists(_.isEmpty), "no unmatched source — LEFT untested (vacuous)")
    assert(out.values.exists(_.nonEmpty), "no matched source (vacuous)")
  }

  test("d20 core: contested argmin picks nearest, equal-distance tie breaks on b_id, isolated is NULL") {
    import spark.implicits._
    // a=1 has a nearer b (30) plus two farther EQUAL-distance bs (10, 20);
    // a=2 sees only the equal pair (tiebreak must choose b_id 10);
    // a=3 is isolated (nearest b is ~90 deg away)
    val a = Seq((1L, 10000L, 0L), (2L, 200000L, 0L), (3L, 100000L, -80000L))
      .toDF("a_id", "ra_a", "dec_a")
    val b = Seq((10L, 9000L, 0L), (20L, 11000L, 0L), (30L, 10500L, 0L),
      (40L, 199000L, 0L), (50L, 201000L, 0L))
      .toDF("b_id", "ra_b", "dec_b")
    val got = RelOps.sphereBestMatch(a, b).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L).contains(30L), s"nearest not chosen: ${got(1L)}")
    assert(got(2L).contains(40L), s"equal-distance tiebreak not on b_id: ${got(2L)}")
    assert(got(3L).isEmpty, s"isolated source should be NULL: ${got(3L)}")
  }

  test("d18 zone layout: every zone's cell width dominates the true max RA separation") {
    val r = 2000L
    val cells = RelOps.sphereZoneCells
    assert(cells.length == 90 && cells.forall(_ >= 1))
    (0 until 90).foreach { z =>
      val d0e = math.max(-90000L, z * 2000L - 92000L)
      val d1e = math.min(90000L, z * 2000L - 86000L)
      val mx = math.max(math.abs(d0e), math.abs(d1e))
      val ceTrue = math.cos(mx * math.Pi / 180000) // true trig, not the poly
      val n = cells(z)
      if (n > 1) {
        val sinHalfR = math.sin(r * math.Pi / 360000)
        assert(sinHalfR / ceTrue < 1.0, s"zone $z: bound formula out of asin domain")
        val dLamMaxMilli = 2 * math.asin(sinHalfR / ceTrue) * 180000 / math.Pi
        assert(360000.0 / n >= dLamMaxMilli,
          s"zone $z: cell width ${360000.0 / n} < max dRA $dLamMaxMilli — covering broken")
      }
    }
  }

  test("d18 blocking is lossless on random catalogs spanning poles and seam") {
    import graft.ops.SphereSql
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def randCat(n: Int): Seq[(Long, Long, Long)] = (1 to n).map { i =>
      val ra = rnd.nextLong(360000L)
      // bias a third of the points poleward so polar zones get traffic
      val dec = rnd.nextInt(3) match {
        case 0 => 86000L + rnd.nextLong(4001L) * (if (rnd.nextBoolean()) 1 else -1)
        case 1 => rnd.nextLong(4001L) - 2000L // equator band near the seam decs
        case _ => rnd.nextLong(180001L) - 90000L
      }
      (i.toLong, ra, dec.max(-90000L).min(90000L))
    }
    val aRows = randCat(400)
    val bRows = randCat(300)
    val a = aRows.toDF("a_id", "ra_a", "dec_a")
    val b = bRows.toDF("b_id", "ra_b", "dec_b")
    val got = RelOps.sphereXmatchPairs(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (ai, raa, deca) <- aRows; (bi, rab, decb) <- bRows
      if SphereSql.haversineD(raa, deca, rab, decb) <= SphereSql.ThresholdD
    } yield (ai, bi)).toSet
    assert(got == expect,
      s"random covering diverges: got ${got.size}, expect ${expect.size}, " +
        s"missing ${(expect -- got).take(5)}, extra ${(got -- expect).take(5)}")
    assert(expect.nonEmpty, "random fixture produced no matches (vacuous)")
  }

  test("d14 fuzzy join: pigeonhole blocking + refine equal brute-force hamming") {
    import org.apache.spark.sql.functions._
    val df = RelOps.d14_join_fuzzy.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join fell back to a non-equi plan:\n${plan.take(1000)}")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // plain-Scala brute force over the same planted keys
    def d9(k: Long) = f"${k * 48271L % 1000000007L % 1000000000L}%09d"
    def perturb(k: Long) = {
      val s = d9(k).toCharArray
      val p = (k % 9).toInt
      s(p) = (((s(p) - '0') + 5) % 10 + '0').toChar
      new String(s)
    }
    val ks = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val expect = (for {
      ka <- ks; kb <- ks if kb % 97 == 0
      hd = d9(ka).zip(perturb(kb)).count { case (x, y) => x != y }
      if hd <= 2
    } yield (ka, kb) -> hd.toLong).toMap
    assert(out == expect, s"pair set diverges: ${out.size} vs ${expect.size}")
    // every dirty record links back to its clean self at distance 1
    val planted = ks.filter(_ % 97 == 0)
    assert(planted.nonEmpty &&
      planted.forall(k => out.get((k, k)).contains(1L)),
      "planted distance-1 self-links missing")
  }

  test("d13 xmatch core finds pairs across the 0/360-degree RA seam") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted catalogs: a seam pair (0.1 deg vs 359.9 deg, same dec), a
    // dec-cell-boundary pair, an exact-radius pair, and a just-outside
    // near miss — the cases a non-wrapping or truncating-division grid
    // would get wrong
    val a = Seq((1L, 100L, 0L), (2L, 50000L, -1999L), (3L, 200000L, 77000L),
      (4L, 300000L, -50000L))
      .toDF("a_id", "ra_m", "dec_m")
    val b = Seq((10L, 359900L, 0L), // seam: wrapped dr = 200
      (20L, 50000L, 1L), // dec crosses the 0-cell boundary (shifted grid)
      (30L, 200000L, 75000L), // dd = 2000 exactly = r — inclusive
      (40L, 300000L, -52001L)) // dd = 2001 — outside
      .toDF("b_id", "ra_m", "dec_m")
    val got = RelOps.xmatchPairs(a, b, cellMilli = 2000L, rMilli = 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 10L) -> (200L * 200L),
      (2L, 20L) -> (2000L * 2000L), (3L, 30L) -> (2000L * 2000L)),
      s"seam/boundary semantics wrong: $got")
  }

  test("d16 salted join equals the unsalted join and actually shuffles on (k, salt)") {
    import org.apache.spark.sql.functions._
    val got = RelOps.d16_join_salted_skew.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // unsalted reference, same skewed key construction
    val exp = Tables.t(spark, sfDir, "lineitem")
      .withColumn("k",
        when(col("l_orderkey") % 10 < 7, 1L).otherwise(col("l_orderkey") % 25))
      .join(Tables.t(spark, sfDir, "nation"),
        col("k") === col("n_nationkey").cast("long"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), graft.Par.dsum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == exp, s"salting changed the result:\n got=$got\n exp=$exp")
    // the planted skew is real, and the hot key spreads over all salts
    val plan = RelOps.d16_join_salted_skew.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"salted join was not a shuffle join:\n${plan.take(600)}")
    assert(plan.contains("salt"), "salt key absent from the join")
    val spread = Tables.t(spark, sfDir, "lineitem")
      .withColumn("k",
        when(col("l_orderkey") % 10 < 7, 1L).otherwise(col("l_orderkey") % 25))
      .withColumn("salt", pmod(col("l_orderkey") + col("l_linenumber"), lit(8)))
      .filter(col("k") === 1).select("salt").distinct().count()
    assert(spread == 8, s"hot key only spread over $spread salts")
  }

  test("d17 point-in-time join: exactly one version per fact, correct era, no BNLJ") {
    import org.apache.spark.sql.functions._
    val out = RelOps.d17_join_pit.fn(spark, sfDir)
    val nFacts = Tables.t(spark, sfDir, "orders").count()
    assert(out.count() == nFacts, "PIT join must be a bijection on facts")
    assert(out.select("o_orderkey").distinct().count() == nFacts,
      "a fact matched multiple dimension versions")
    // era correctness: a changed customer (custkey % 10 == 3) seen as-of
    // version 1 must show the ORIGINAL balance; as-of 2 the updated one
    val changed = out.filter(col("o_custkey") % 10 === 3)
    assert(changed.filter(col("asof_version") === 1 && col("version") =!= 1)
      .count() == 0, "as-of v1 fact resolved to a later version")
    assert(changed.filter(col("asof_version") === 2 && col("version") =!= 2)
      .count() == 0, "as-of v2 fact resolved to the closed version")
    assert(changed.filter(col("asof_version") === 2).count() > 0,
      "no changed-customer v2 facts — era logic untested")
    // unchanged customers always resolve to their single open version 1
    assert(out.filter(col("o_custkey") % 10 =!= 3 && col("version") =!= 1)
      .count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"PIT join degenerated:\n${plan.take(600)}")
  }

  test("d19 outer PIT join: exactly one OR zero versions, pre-creation facts survive as NULLs") {
    import org.apache.spark.sql.functions._
    val out = RelOps.d19_join_pit_outer.fn(spark, sfDir)
    val nFacts = Tables.t(spark, sfDir, "orders").count()
    assert(out.count() == nFacts,
      "outer PIT join must preserve every fact exactly once")
    assert(out.select("o_orderkey").distinct().count() == nFacts,
      "a fact matched multiple dimension versions")
    // the row-loss bug this op exists to catch: as-of 1 predates the
    // dimension's creation (valid_from of the initial load is 2) — those
    // facts MUST survive with NULL dimension columns
    val pre = out.filter(col("asof_version") === 1)
    assert(pre.count() > 0, "no pre-creation facts planted — vacuous")
    assert(pre.filter(col("version").isNotNull).count() == 0,
      "a pre-creation fact resolved a dimension version")
    assert(out.filter(col("asof_version") >= 2 && col("version").isNull)
      .count() == 0, "a covered fact lost its dimension row")
    // era rule recomputed independently: version(ck, asof) = null if
    // asof < 2; 2 at asof 2; 3 (if %10==3) else 2 at asof 3;
    // 4 (if %5==3) else 2 at asof 4
    val rows = out.collect()
    rows.foreach { r =>
      val ck = r.getLong(1); val asof = r.getLong(2)
      val expect: Option[Long] =
        if (asof < 2) None
        else if (asof == 2) Some(2L)
        else if (asof == 3) Some(if (ck % 10 == 3) 3L else 2L)
        else Some(if (ck % 5 == 3) 4L else 2L)
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got == expect, s"fact ${r.getLong(0)} (ck=$ck asof=$asof): $got != $expect")
    }
    // all three version depths are live: some 3-version customer is seen
    // at each of its eras
    Seq(2L, 3L, 4L).foreach { v =>
      assert(rows.exists(r => r.getLong(1) % 10 == 3 && !r.isNullAt(3) &&
        r.getLong(3) == v), s"no %10==3 fact resolved version $v — era untested")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"outer PIT join degenerated:\n${plan.take(600)}")
  }

  test("d15 bloom prunes the probe side hard, loses nothing, and is codegen-native") {
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sfDir, "lineitem")
    // the SHARED construction (RelOps.bloomMightContain + d15BuildSide) —
    // the bounds below test exactly what the op ships
    val build = RelOps.d15BuildSide(spark, sfDir)
    val mc = RelOps.bloomMightContain(build, "o_orderkey", col("l_orderkey"), 0.01)
    val total = li.count()
    val passed = li.filter(mc).count()
    val exact = li.join(build, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(passed >= exact, s"bloom dropped true matches: passed=$passed exact=$exact")
    assert(passed <= exact + (0.01 * 3 + 0.02) * total,
      s"bloom fpp way off: passed=$passed exact=$exact total=$total")
    assert(passed < total / 2, s"bloom pruned nothing: passed=$passed of $total")
    // hot path must be the native expression, not a UDF
    val plan = RelOps.d15_join_bloom.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no native bloom filter in plan:\n${plan.take(600)}")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      "bloom probe went through a UDF")
  }
}
