package graft

import graft.ops.EtlOps
import graft.ingest.Convert
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** B-group property laws (SURVEY §5.3; seeded-random sampling — the
  * scalatest/scalacheck bridge artifact is not on the offline classpath).
  */
class EtlOpsSpec extends SparkTestBase {

  private val rnd = new Random(42)

  test("normalizeName is idempotent and produces valid SQL identifiers") {
    val samples = Seq.fill(200)(rnd.nextString(rnd.nextInt(20))) ++
      Seq("select", "2col", "Event ID", "a-b-c", "", "_x", "ALL", "col.1")
    samples.foreach { raw =>
      val n = EtlOps.normalizeName(raw)
      assert(EtlOps.normalizeName(n) == n || n.endsWith("_")) // reserved pad stable
      assert(n.matches("[a-z_][a-z0-9_]*"), s"bad identifier '$n' from '$raw'")
    }
  }

  test("normalizeColumns dedupes colliding names") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("Col A", "col_a", "COL-A")
    val out = EtlOps.normalizeColumns(df)
    assert(out.columns.toSeq == Seq("col_a", "col_a_2", "col_a_3"))
  }

  test("widening casts are lossless for in-range values") {
    import spark.implicits._
    val samples = Seq.fill(100)((rnd.nextInt().toShort, rnd.nextInt(), rnd.nextFloat()))
    val df = samples.toDF("s", "i", "f")
      .select(col("s"), col("i"), col("f"),
        col("s").cast(IntegerType).as("sw"), col("i").cast(LongType).as("iw"),
        col("f").cast(DoubleType).as("fw"))
    df.collect().foreach { r =>
      assert(r.getInt(3) == r.getShort(0).toInt)
      assert(r.getLong(4) == r.getInt(1).toLong)
      assert(r.getDouble(5) == r.getFloat(2).toDouble)
    }
  }

  test("nanToNull maps exactly NaN/±Inf to null, identity elsewhere") {
    import spark.implicits._
    val vals = Seq(1.5, 0.0, -2.25, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue)
    val df = vals.toDF("x").select(EtlOps.nanToNull(col("x")).as("y"))
    val out = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(1.5), Some(0.0), Some(-2.25), None, None, None,
      Some(Double.MinPositiveValue)))
  }

  test("null sentinel only nulls the sentinel value") {
    import spark.implicits._
    val df = Seq(-1L, 0L, 1L, -999L).toDF("x")
      .select(EtlOps.nullSentinel(col("x"), -999L).as("y"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ==
      Seq(Some(-1L), Some(0L), Some(1L), None))
  }

  test("array expand and explode agree on content (row-count algebra)") {
    val emb = Tables.t(spark, sfDir, "embeddings").limit(50).cache()
    val n = emb.count()
    val exploded = emb.select(col("vec_id"), posexplode(col("embedding")))
    assert(exploded.count() == n * 64)
    // expansion of position 0 equals explode's pos=0 slice
    val expanded = emb.select(col("vec_id"), col("embedding")(0).as("e0"))
    val fromExplode = exploded.filter(col("pos") === 0)
      .select(col("vec_id"), col("col").as("e0"))
    assert(expanded.except(fromExplode).count() == 0)
    emb.unpersist()
  }

  test("Convert.convert chains the full fits2db pipeline") {
    import spark.implicits._
    val df = Seq((1, -999.0, 2.0), (2, Double.NaN, 4.0), (3, 10.0, 6.0))
      .toDF("ID", "Raw Val", "2col")
    val spec = Convert.ConvertSpec(rules = Map(
      "raw_val" -> Convert.ColumnRule(scale = Some((0.5, 100.0))),
      "_2col" -> Convert.ColumnRule(widenTo = Some(LongType))))
    val out = Convert.convert(df, spec)
    assert(out.columns.toSeq == Seq("id", "raw_val", "_2col"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDouble(1) == -999.0 * 0.5 + 100.0)
    assert(rows(1).isNullAt(1)) // NaN scrubbed before scaling
    assert(rows(2).getLong(2) == 6L)
  }

  test("ingest end-to-end: FITS source -> convert -> JDBC sink -> read back") {
    // The full fits2db shape in one call: FITS binary table in, conversion
    // chain applied, bulk-loaded into a DB, contents verified.
    val fits = "/tmp/graft_test/ingest.fits"
    val supplier = Tables.t(spark, sfDir, "supplier")
    graft.fits.FitsWriter.write(fits, supplier.schema,
      supplier.orderBy("s_suppkey").collect().toIndexedSeq,
      strLens = Map("s_name" -> 20))
    val url = "jdbc:derby:/tmp/graft_test/ingest_db;create=true"
    Convert.ingest(spark, fits, "fits",
      Convert.ConvertSpec(rules = Map(
        "s_acctbal" -> Convert.ColumnRule(scale = Some((1.0, 0.0))))),
      url, sinkFormat = "jdbc", jdbcTable = "supplier_conv")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val back = spark.read.jdbc(url, "supplier_conv", props)
    assert(back.count() == supplier.count())
    val a = back.select(col("S_SUPPKEY").cast(LongType).as("k"),
      col("S_ACCTBAL").as("b")).orderBy("k").collect()
    val e = supplier.select(col("s_suppkey").as("k"), col("s_acctbal").as("b"))
      .orderBy("k").collect()
    assert(a.toSeq == e.toSeq)
  }

  test("ingest with the fits2db DDL lifecycle: drop-create, append, truncate-reload") {
    import graft.ingest.Ddl
    val src = "/tmp/graft_test/ddl_ingest_src"
    Tables.t(spark, sfDir, "region").write.mode("overwrite").parquet(src)
    val url = "jdbc:derby:/tmp/graft_test/ddl_ingest_db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    // first load: DROP on a missing table must be tolerated (42Y55)
    Convert.ingest(spark, src, "parquet", Convert.ConvertSpec(), url,
      sinkFormat = "jdbc", jdbcTable = "region_ddl",
      jdbcDdl = Some((Ddl.Derby, Ddl.DropCreate)))
    assert(spark.read.jdbc(url, "\"region_ddl\"", props).count() == 5)

    // truncate-reload: same table, rows replaced not doubled
    Convert.ingest(spark, src, "parquet", Convert.ConvertSpec(), url,
      sinkFormat = "jdbc", jdbcTable = "region_ddl",
      jdbcDdl = Some((Ddl.Derby, Ddl.TruncateLoad)))
    val back = spark.read.jdbc(url, "\"region_ddl\"", props)
    assert(back.count() == 5, "TruncateLoad must clear before append")
    assert(back.columns.toSeq == Seq("r_regionkey", "r_name"),
      "our DDL (lowercase, case-exact) defines the table, not Spark's writer")
  }

  test("Convert.addStablePkey assigns a dense 1..n key") {
    val df = Tables.t(spark, sfDir, "customer").repartition(7)
    val out = Convert.addStablePkey(df)
    val keys = out.select("pkey").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == (1L to df.count()).toSeq)
  }

  test("b8 pkey matches ORDER BY rank and plans no global (un-partitioned) window") {
    val out = EtlOps.b8_add_pkey.fn(spark, sfDir)
    val rows = out.select("pkey", "n_nationkey").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    assert(rows.sortBy(_._1).map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "pkey order must equal n_nationkey order")
    assert(rows.map(_._1).sorted.toSeq == (1L to rows.length).toSeq)
    // the r1 regression: row_number over Window.orderBy with no partitionBy
    // funnels every row through one task — assert it's gone for good
    import org.apache.spark.sql.catalyst.plans.logical.{Window => WindowNode}
    val globalWindows = out.queryExecution.optimizedPlan.collect {
      case w: WindowNode if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"un-partitioned window in plan: ${globalWindows.mkString("; ")}")
  }

  test("b13 merged read surfaces old-generation gaps as NULL, new rows intact") {
    import org.apache.spark.sql.functions._
    val out = EtlOps.b13_schema_evolution.fn(spark, sfDir)
    val docs = Tables.t(spark, sfDir, "documents")
    assert(out.count() == docs.count(), "merge lost or duplicated rows")
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang", "n_chars"))
    // gen1 (even ids) lacked lang/n_chars → NULL; gen2 (odd ids) kept them
    assert(out.filter(col("doc_id") % 2 === 0 && col("lang").isNotNull).count() == 0)
    assert(out.filter(col("doc_id") % 2 === 1 && col("lang").isNull).count() == 0)
    val odd = out.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
    val srcOdd = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
    assert(odd.exceptAll(srcOdd).isEmpty, "gen2 column values drifted through the merge")
  }

  test("b15 snapshot reads: v1 pinned under v2 commit; append never rewrites v1") {
    // drive the op once (it commits v1 then v2, returns the pinned v1 read)
    val v1 = EtlOps.b15_snapshot_read.fn(spark, sfDir)
    val base = new java.io.File(Util.scratch(
      s"b15_table_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"))
    def snapshot(dir: String) =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val v1Files = snapshot(s"$base/data/add1")
    assert(v1Files.nonEmpty)
    // v2 = v1 plus the delta, reconstructed from the v2 manifest
    val v2 = spark.read
      .parquet(EtlOps.readManifest(s"$base/v2.manifest"): _*)
    val orders = Tables.t(spark, sfDir, "orders")
    val expectV1 = orders.filter(col("o_orderkey") % 3 === 0)
      .select("o_orderkey", "o_totalprice")
    val expectV2 = orders.filter(col("o_orderkey") % 3 <= 1)
      .select("o_orderkey", "o_totalprice")
    assert(v1.exceptAll(expectV1).isEmpty && expectV1.exceptAll(v1).isEmpty)
    assert(v2.exceptAll(expectV2).isEmpty && expectV2.exceptAll(v2).isEmpty)
    // the append-only discipline: committing v2 left every v1 data file
    // byte-untouched (same mtimes) and the v1 manifest still names ONLY
    // the v1 files
    assert(snapshot(s"$base/data/add1") == v1Files,
      "v2 commit rewrote v1 data files")
    assert(EtlOps.readManifest(s"$base/v1.manifest") == Seq(s"$base/data/add1"))
  }

  test("b15 OCC: two committers racing one version - exactly one wins, the loser throws") {
    import scala.jdk.CollectionConverters._
    val base = Util.scratch("b15_occ")
    new java.io.File(base).mkdirs()
    val path = s"$base/v3.manifest"
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        barrier.await() // maximize the collision window
        try {
          EtlOps.commitManifest(path, Seq(s"$base/data/writer$i"))
          results.add(Right(i))
        } catch { case e: Throwable => results.add(Left(e)) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    assert(winners.size == 1 && losers.size == 1,
      s"expected exactly one winner: $results")
    assert(losers.head.left.exists(
      _.isInstanceOf[java.nio.file.FileAlreadyExistsException]),
      s"loser must fail with the typed OCC refusal: ${losers.head}")
    // the surviving manifest is exactly the winner's write, uncorrupted
    // (atomic create — never an interleaving of the two)
    val content = EtlOps.readManifest(path)
    val winnerId = winners.head.toOption.get
    assert(content == Seq(s"$base/data/writer$winnerId"),
      s"manifest corrupted by the race: $content")
    // the loser's retry protocol succeeds at the NEXT version
    EtlOps.commitManifest(s"$base/v4.manifest",
      content :+ s"$base/data/retry")
    assert(EtlOps.readManifest(s"$base/v4.manifest").size == 2)
  }

  test("b17 audit counts exactly the planted defects; no class vacuous") {
    val okeys = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val custSet = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    // staged = orders + the %41 duplicates; classes mirror the op exactly
    val staged = okeys ++ okeys.filter(_ % 41 == 0)
    val exp = Map(
      "not_null_custkey" -> staged.count(_ % 31 == 0).toLong,
      // %37 keys that are NOT %31 get the negated (out-of-domain at any
      // scale, since c_custkey is positive) key; their
      // original custkeys were valid, so orphan count = class size
      "fk_custkey" -> staged.count(k => k % 31 != 0 && k % 37 == 0).toLong,
      "range_totalprice" -> staged.count(_ % 43 == 0).toLong,
      "unique_orderkey" -> okeys.count(_ % 41 == 0).toLong)
    val got = EtlOps.b17_constraint_audit.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, s"audit mismatch:\n got=$got\n exp=$exp")
    exp.foreach { case (k, v) =>
      assert(v > 0, s"constraint $k has no planted violations — vacuous audit")
    }
    assert(custSet.nonEmpty) // sanity: FK parent exists
  }

  test("b16 cascade audit matches a plain-Scala referential walk") {
    val custKeys = Tables.t(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val ords = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val liKeys = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    val delCust = custKeys.filter(_ % 97 == 0).toSet
    assert(delCust.nonEmpty, "fixture plants no forget-keys — vacuous cascade")
    val delOrd = ords.filter(o => delCust(o._2)).map(_._1).toSet
    assert(delOrd.nonEmpty, "forget-set customers have no orders — cascade untested")
    val exp = Map(
      "customer" -> ((custKeys.length.toLong, delCust.size.toLong,
        custKeys.filterNot(_ % 97 == 0).sum)),
      "orders" -> ((ords.length.toLong, delOrd.size.toLong,
        ords.filterNot(o => delCust(o._2)).map(_._1).sum)),
      "lineitem" -> ((liKeys.length.toLong, liKeys.count(delOrd).toLong,
        liKeys.filterNot(delOrd).sum)))
    val got = EtlOps.b16_cascade_delete.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(got == exp, s"audit mismatch:\n got=$got\n exp=$exp")
    // the forget set must broadcast; the cascade must never go nested-loop
    val plan = EtlOps.b16_cascade_delete.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "forget set not broadcast")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"cascade degenerated:\n${plan.take(600)}")
  }

  test("b18 profile rows match per-column ground truth in one scan") {
    val orders = Tables.t(spark, sfDir, "orders")
    val n = orders.count()
    val got = EtlOps.b18_table_profile.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    got.foreach { case (c, r) =>
      val truth = orders.agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
        countDistinct(col(c)).as("nd"),
        min(col(c)).cast("string"), max(col(c)).cast("string")).head()
      assert(r.getLong(1) == n, s"$c n_rows")
      assert(r.getLong(2) == truth.getLong(0), s"$c n_null")
      assert(r.getLong(3) == truth.getLong(1), s"$c n_distinct")
      assert(r.getString(4) == truth.getString(2), s"$c min_str")
      assert(r.getString(5) == truth.getString(3), s"$c max_str")
    }
    // one scan: the profile plan reads `orders` exactly once
    val df = EtlOps.b18_table_profile.fn(spark, sfDir)
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("orders"))
    assert(scans == 1, s"profile must be a single pass over the table, saw $scans scans")
  }

  test("b19 sketch pass plans with NO Expand; gated predicate holds; values match b18") {
    val profCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    // the 100 TB subplan: one Aggregate, one scan, NO Expand — the
    // whole point of swapping exact distinct for the sketch
    val sketch = EtlOps.profileSketchAgg(
      Tables.t(spark, sfDir, "orders"), profCols)
    sketch.collect()
    val plan = sketch.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"sketch profile must not Expand:\n${plan.take(800)}")
    val scans = sketch.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("orders"))
    assert(scans == 1, s"sketch pass must be one scan, saw $scans")
    // the gated key: every within_5pct true, non-sketch columns = b18's
    val got = EtlOps.b19_profile_sketch.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val b18 = EtlOps.b18_table_profile.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == profCols.toSet)
    got.foreach { case (c, r) =>
      assert(r.getBoolean(4), s"$c sketch outside the 5% envelope")
      val e = b18(c)
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2) &&
        r.getLong(3) == e.getLong(3) && r.getString(5) == e.getString(4) &&
        r.getString(6) == e.getString(5), s"$c diverges from b18's profile")
    }
  }

  test("b18 null counting is non-vacuous: planted nulls surface per column") {
    // the gate fixture (orders) has zero nulls in every profiled column,
    // so without this the n_null path would be green-by-vacuity
    val tmp = java.nio.file.Files.createTempDirectory("graft_b18").toString
    Tables.t(spark, sfDir, "orders")
      .withColumn("o_custkey",
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_custkey")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit(null)).otherwise(col("o_orderstatus")))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val planted = Tables.t(spark, tmp, "orders")
    val expCust = planted.filter(col("o_custkey").isNull).count()
    val expStat = planted.filter(col("o_orderstatus").isNull).count()
    assert(expCust > 0 && expStat > 0, "fixture must actually plant nulls")
    val got = EtlOps.b18_table_profile.fn(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("o_custkey") == expCust, s"o_custkey n_null ${got("o_custkey")} != $expCust")
    assert(got("o_orderstatus") == expStat, s"o_orderstatus n_null ${got("o_orderstatus")} != $expStat")
    assert(got("o_orderkey") == 0L && got("o_orderpriority") == 0L,
      "untouched columns must report zero nulls")
  }
}
