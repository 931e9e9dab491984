package graft

import graft.ingest.{Convert, Ddl, Main}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fits2db argv surface end-to-end (SURVEY §3.1): option parsing, glob
  * expansion, multi-file FITS scan, DDL lifecycle, Derby load-back. Also
  * gates the struct-flattening data/DDL agreement and the mysql/sqlite
  * array-load rejection (ADVICE r2).
  */
class IngestCliSpec extends SparkTestBase {

  test("argv parsing covers the reference flag surface") {
    val a = Main.parse(Seq("--table", "obs", "--dialect", "derby",
      "--url", "jdbc:derby:x;create=true", "--drop", "--extnum", "1",
      "--pkey", "id", "--chunk", "500", "--concurrency", "4",
      "in1.fits", "in2.fits"))
    assert(a.table.contains("obs") && a.dialect == "derby" &&
      a.mode.contains(Ddl.DropCreate))
    assert(a.extnum.contains(1) && a.pkey.contains("id") &&
      a.chunk.contains(500) && a.concurrency.contains(4))
    assert(a.inputs == Seq("in1.fits", "in2.fits"))
  }

  test("argv parsing fails loudly on malformed input") {
    def msg(args: String*): String =
      intercept[IllegalArgumentException](Main.parse(args)).getMessage
    assert(msg("--dialect", "derby", "x.fits").contains("needs --url"))
    assert(msg("--dialect", "csv", "x.fits").contains("needs --out"))
    assert(msg("--dialect", "oracle", "--out", "o", "x.fits").contains("unknown dialect"))
    assert(msg("--bogus", "x.fits").contains("unknown option"))
    assert(msg("--out", "o").contains("no input files"))
    assert(msg("--extnum", "two", "x.fits").contains("expects an integer"))
    // a flag must not swallow the NEXT flag as its value ('--table --drop'
    // would load into a table named '--drop' and drop the lifecycle)
    assert(msg("--table", "--drop", "--dialect", "parquet", "--out", "o", "x.fits")
      .contains("--table expects a value"))
    assert(msg("--dialect", "parquet", "--out", "o", "x.fits", "--pkey")
      .contains("--pkey expects a value"))
    // DB-only flags on a file sink are rejected, not silently discarded
    assert(msg("--dialect", "parquet", "--out", "o", "--drop", "x.fits")
      .contains("apply only to DB dialects"))
    assert(msg("--dialect", "csv", "--out", "o", "--table", "t", "x.fits")
      .contains("apply only to DB dialects"))
  }

  test("csv sink flattens structs and rejects arrays with the b6 remedy") {
    import spark.implicits._
    val src = "/tmp/graft_test/cli_csv_src"
    Seq((1L, (0.5f, 1.5f))).toDF("k", "vis")
      .select(col("k"), struct(col("vis._1").as("re"), col("vis._2").as("im")).as("vis"))
      .write.mode("overwrite").parquet(src)
    val out = "/tmp/graft_test/cli_csv_out"
    Convert.ingestAll(spark, Seq(src), "parquet", Map.empty,
      Convert.ConvertSpec(), out, sinkFormat = "csv")
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.toSeq == Seq("k", "vis_re", "vis_im"))
    val arrSrc = "/tmp/graft_test/cli_csv_arr"
    Seq((1L, Seq(0.5f))).toDF("k", "spec").write.mode("overwrite").parquet(arrSrc)
    val e = intercept[IllegalArgumentException] {
      Convert.ingestAll(spark, Seq(arrSrc), "parquet", Map.empty,
        Convert.ConvertSpec(), out, sinkFormat = "csv")
    }
    assert(e.getMessage.contains("b6_array_expand"))
  }

  test("glob expansion matches files and rejects empty matches") {
    val dir = "/tmp/graft_test/cli_glob"
    new java.io.File(dir).mkdirs()
    Seq("g1.fits", "g2.fits").foreach { n =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$n"), "x")
    }
    val got = Main.expandGlobs(spark, Seq(s"$dir/g*.fits"))
    assert(got.map(_.split('/').last).sorted == Seq("g1.fits", "g2.fits"))
    val e = intercept[IllegalArgumentException](
      Main.expandGlobs(spark, Seq(s"$dir/none*.fits")))
    assert(e.getMessage.contains("no input files match"))
  }

  test("FITS DSv2 reads multiple same-schema files as one scan") {
    val dir = "/tmp/graft_test/cli_multi"
    new java.io.File(dir).mkdirs()
    val nation = Tables.t(spark, sfDir, "nation").orderBy("n_nationkey")
    val lo = nation.filter(col("n_nationkey") < 12)
    val hi = nation.filter(col("n_nationkey") >= 12)
    graft.fits.FitsWriter.writeDataFrame(s"$dir/lo.fits", lo,
      strLens = Map("n_name" -> 25))
    graft.fits.FitsWriter.writeDataFrame(s"$dir/hi.fits", hi,
      strLens = Map("n_name" -> 25))
    val both = spark.read.format("fits").load(s"$dir/lo.fits", s"$dir/hi.fits")
    assert(both.count() == nation.count())
    assert(both.orderBy("n_nationkey").collect().toSeq ==
      nation.collect().toSeq)
  }

  test("FITS multi-file load rejects schema drift between files") {
    val dir = "/tmp/graft_test/cli_drift"
    new java.io.File(dir).mkdirs()
    val s1 = StructType(Seq(StructField("x", IntegerType)))
    val s2 = StructType(Seq(StructField("x", DoubleType)))
    graft.fits.FitsWriter.write(s"$dir/a.fits", s1, Seq(Row(1)))
    graft.fits.FitsWriter.write(s"$dir/b.fits", s2, Seq(Row(1.0)))
    val e = intercept[Exception] {
      spark.read.format("fits").load(s"$dir/a.fits", s"$dir/b.fits").count()
    }
    assert(e.getMessage.contains("multi-file"))
  }

  test("CLI end-to-end: FITS glob -> DDL lifecycle -> Derby table matches source") {
    val dir = "/tmp/graft_test/cli_e2e"
    new java.io.File(dir).mkdirs()
    val supplier = Tables.t(spark, sfDir, "supplier").orderBy("s_suppkey")
    val lo = supplier.filter(col("s_suppkey") % 2 === 0)
    val hi = supplier.filter(col("s_suppkey") % 2 === 1)
    graft.fits.FitsWriter.writeDataFrame(s"$dir/part_a.fits", lo,
      strLens = Map("s_name" -> 20))
    graft.fits.FitsWriter.writeDataFrame(s"$dir/part_b.fits", hi,
      strLens = Map("s_name" -> 20))
    val url = s"jdbc:derby:$dir/db;create=true"
    Main.run(spark, Main.parse(Seq(
      "--table", "supplier_cli", "--format", "fits", "--dialect", "derby",
      "--url", url, "--drop", "--chunk", "100",
      s"$dir/part_*.fits")))
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val back = spark.read.jdbc(url, "\"supplier_cli\"", props)
    assert(back.count() == supplier.count())
    // hash-equal contents: compare the full key/name/acctbal projection
    val a = back.select(col("s_suppkey").cast(LongType),
      col("s_name"), col("s_acctbal")).orderBy("s_suppkey").collect()
    val e = supplier.select(col("s_suppkey").cast(LongType),
      col("s_name"), col("s_acctbal")).orderBy("s_suppkey").collect()
    assert(a.toSeq == e.toSeq)
    // re-running with --truncate replaces, not doubles (lifecycle check)
    Main.run(spark, Main.parse(Seq(
      "--table", "supplier_cli", "--format", "fits", "--dialect", "derby",
      "--url", url, "--truncate", s"$dir/part_*.fits")))
    assert(spark.read.jdbc(url, "\"supplier_cli\"", props).count() ==
      supplier.count())
  }

  test("CLI ingests a mixed plain+gzipped FITS glob (the compressed-drop shape)") {
    val dir = "/tmp/graft_test/cli_gz"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    val supplier = Tables.t(spark, sfDir, "supplier").orderBy("s_suppkey")
    val lo = supplier.filter(col("s_suppkey") % 2 === 0)
    val hi = supplier.filter(col("s_suppkey") % 2 === 1)
    graft.fits.FitsWriter.writeDataFrame(s"$dir/in_a.fits", lo,
      strLens = Map("s_name" -> 20))
    graft.fits.FitsWriter.writeDataFrame(s"$dir/raw_b.fits", hi,
      strLens = Map("s_name" -> 20))
    graft.Util.gzipFile(s"$dir/raw_b.fits", s"$dir/in_b.fits.gz")
    val out = s"$dir/out"
    Main.run(spark, Main.parse(Seq(
      "--format", "fits", "--dialect", "parquet", "--out", out,
      s"$dir/in_*")))
    val back = spark.read.parquet(out)
    assert(back.count() == supplier.count(),
      s"mixed plain+gz CLI ingest produced ${back.count()} rows")
    val a = back.select(col("s_suppkey").cast(LongType), col("s_name"))
      .orderBy("s_suppkey").collect()
    val e = supplier.select(col("s_suppkey").cast(LongType), col("s_name"))
      .orderBy("s_suppkey").collect()
    assert(a.toSeq == e.toSeq)
  }

  test("CLI ingests tile-compressed (ZTABLE=T) FITS like any other member") {
    val dir = "/tmp/graft_test/cli_tiled"
    graft.Util.deleteRecursively(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    val supplier = Tables.t(spark, sfDir, "supplier").orderBy("s_suppkey")
    graft.fits.FitsWriter.writeTiledDataFrame(s"$dir/in_tiled.fits", supplier,
      tileLen = 4, strLens = Map("s_name" -> 20))
    val out = s"$dir/out"
    Main.run(spark, Main.parse(Seq(
      "--format", "fits", "--dialect", "parquet", "--out", out,
      s"$dir/in_*.fits")))
    val back = spark.read.parquet(out)
      .select(col("s_suppkey").cast(LongType), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey").collect()
    val e = supplier
      .select(col("s_suppkey").cast(LongType), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey").collect()
    assert(back.toSeq == e.toSeq, "tiled FITS ingest diverged from source")
  }

  test("struct columns flatten identically in DDL and written frame") {
    // the C/M complex case: DDL flattens vis -> vis_re/vis_im; the frame
    // Spark appends must agree or the load fails (ADVICE r2 medium)
    import spark.implicits._
    val df = Seq((1L, (0.5f, -0.5f)), (2L, (1.5f, 2.5f)))
      .toDF("k", "vis")
      .select(col("k"), struct(col("vis._1").as("re"), col("vis._2").as("im")).as("vis"))
    val src = "/tmp/graft_test/cli_struct_src"
    df.write.mode("overwrite").parquet(src)
    val url = "jdbc:derby:/tmp/graft_test/cli_struct_db;create=true"
    Convert.ingestAll(spark, Seq(src), "parquet", Map.empty,
      Convert.ConvertSpec(), url, sinkFormat = "jdbc",
      jdbcTable = "vis_tab", jdbcDdl = Some((Ddl.Derby, Ddl.DropCreate)))
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val back = spark.read.jdbc(url, "\"vis_tab\"", props)
    assert(back.columns.toSeq == Seq("k", "vis_re", "vis_im"))
    assert(back.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getFloat(1), r.getFloat(2))).toSeq ==
      Seq((1L, 0.5f, -0.5f), (2L, 1.5f, 2.5f)))
  }

  test("mysql/sqlite array loads are rejected with the b6 remedy") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("spec", ArrayType(FloatType))))
    val e = intercept[IllegalArgumentException] {
      Convert.prepareJdbcTable("jdbc:mysql://unused", "t", schema,
        Ddl.MySql, Ddl.Create)
    }
    assert(e.getMessage.contains("b6_array_expand"))
    val e2 = intercept[IllegalArgumentException] {
      Convert.prepareJdbcTable("jdbc:sqlite:unused", "t", schema,
        Ddl.Sqlite, Ddl.Create)
    }
    assert(e2.getMessage.contains("array column 'spec'"))
  }
}
