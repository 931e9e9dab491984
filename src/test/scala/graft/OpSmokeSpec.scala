package graft

/** Smoke: every declared query executes at sf0.001 and returns a sane shape
  * (the DuckDB hash-match itself is the driver-run t2 gate; this catches
  * runtime regressions in `sbt test`).
  *
  * Sharded 4 ways (r15, the r14 verdict's #6): the 257-key pass was one
  * sequential suite and had outgrown the driver's test budget (~30 min
  * total suite wall; the driver's VERIFY truncated mid-run). The shards
  * are striped over the SORTED key list (key i goes to shard i % 4) so
  * each shard carries a balanced mix of cheap scalar keys and heavy
  * streaming/ANN keys, and build.sbt assigns each shard its own forked
  * JVM group so they run CONCURRENTLY. Striping means each shard JVM
  * builds its own fixtureOnce scaffolding (per-PID scratch) — at
  * sf0.001 those builds are sub-second, a price worth 4× the wall.
  */
abstract class OpSmokeShard(shard: Int, nShards: Int) extends SparkTestBase {

  private val expectNonEmpty = SparkEntry.queries.keySet --
    Set("i5_dedup_near_jaccard", "i10_dedup_minhash_lsh", "i11_dedup_simhash",
      "i12_dedup_embcos") // near-dup pair sets may be empty at sf0.001

  SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
    .filter(_._2 % nShards == shard)
    .map(_._1)
    .foreach { case (name, fn) =>
      test(s"$name executes at sf0.001") {
        val df = fn(spark, sfDir)
        val n = df.count()
        assert(n >= 0)
        if (expectNonEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      }
    }
}

class OpSmokeSpec extends OpSmokeShard(0, 4) {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("d5 cross join cardinality is |region| × |nation|") {
    assert(SparkEntry.queries("d5_join_cross")(spark, sfDir).count() == 125)
  }

  test("h12 bitwise results match JVM integer semantics") {
    val rows = SparkEntry.queries("h12_bit_funcs")(spark, sfDir).limit(500).collect()
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == (k & 255L) && r.getLong(2) == (k | 4096L))
      assert(r.getLong(4) == ~k)
      assert(r.getLong(5) == ((k % 1024L) << 3) && r.getLong(6) == (k >> 2))
      assert(r.getLong(7) == java.lang.Long.bitCount(k).toLong)
    }
  }

  test("f8 distribution values satisfy their defining identities") {
    val rows = SparkEntry.queries("f8_win_distribution")(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, part) =>
      val n = part.length
      assert(part.forall(_.getLong(5) == n.toLong), "n_part != partition size")
      // cume_dist ranges in (0, 1] and hits 1 exactly once per partition
      assert(part.count(_.getDouble(3) == 1.0) >= 1)
      part.foreach { r =>
        assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
        assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
        assert(r.getLong(4) == math.ceil(r.getDouble(3) * 10).toLong)
      }
    }
  }
}

class OpSmokeSpecShard1 extends OpSmokeShard(1, 4)
class OpSmokeSpecShard2 extends OpSmokeShard(2, 4)
class OpSmokeSpecShard3 extends OpSmokeShard(3, 4)
