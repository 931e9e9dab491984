package graft

import graft.ingest.Ddl
import graft.ingest.Ddl.{Create, DropCreate, TruncateLoad}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-DDL gate for the dialect layer: every SURVEY §1.2 type row that
  * reaches a Spark type, rendered for each of the reference's three targets.
  * No DB server exists in the sandbox (SURVEY §0), so exact strings ARE the
  * contract.
  */
class DdlSpec extends AnyFunSuite {

  // one column per §1.2 row (TFORM noted): L, X, B/I, I-unsigned→J, J, K,
  // K-unsigned→decimal, E, D, rA, C/M struct, rT array, corpus date/ts
  private val schema = StructType(Seq(
    StructField("flag", BooleanType, nullable = true), // L
    StructField("bits", BinaryType, nullable = true), // X
    StructField("counts", ShortType, nullable = false), // B / I
    StructField("idx", IntegerType, nullable = true), // I unsigned-widened / J
    StructField("big", LongType, nullable = true), // J unsigned-widened / K
    StructField("ubig", DecimalType(20, 0), nullable = true), // K unsigned
    StructField("flux", FloatType, nullable = true), // E
    StructField("ra", DoubleType, nullable = false), // D
    StructField("name", StringType, nullable = true), // rA
    StructField("vis", StructType(Seq( // C/M complex → _re/_im
      StructField("re", FloatType, nullable = true),
      StructField("im", FloatType, nullable = true))), nullable = true),
    StructField("spec", ArrayType(FloatType), nullable = true), // rT / P / Q
    StructField("obs_date", DateType, nullable = true),
    StructField("obs_ts", TimestampType, nullable = true)))

  test("postgres CREATE TABLE covers every §1.2 type row") {
    val ddl = Ddl.createTable(schema, "obs", Ddl.Postgres)
    assert(ddl ==
      """CREATE TABLE "obs" (
        |  "flag" boolean,
        |  "bits" bytea,
        |  "counts" smallint NOT NULL,
        |  "idx" integer,
        |  "big" bigint,
        |  "ubig" numeric(20,0),
        |  "flux" real,
        |  "ra" double precision NOT NULL,
        |  "name" text,
        |  "vis_re" real,
        |  "vis_im" real,
        |  "spec" real[],
        |  "obs_date" date,
        |  "obs_ts" timestamp
        |)""".stripMargin)
  }

  test("mysql CREATE TABLE covers every §1.2 type row") {
    val ddl = Ddl.createTable(schema, "obs", Ddl.MySql)
    assert(ddl ==
      """CREATE TABLE `obs` (
        |  `flag` tinyint(1),
        |  `bits` blob,
        |  `counts` smallint NOT NULL,
        |  `idx` int,
        |  `big` bigint,
        |  `ubig` decimal(20,0),
        |  `flux` float,
        |  `ra` double NOT NULL,
        |  `name` text,
        |  `vis_re` float,
        |  `vis_im` float,
        |  `spec` json,
        |  `obs_date` date,
        |  `obs_ts` datetime
        |)""".stripMargin)
  }

  test("sqlite CREATE TABLE covers every §1.2 type row") {
    val ddl = Ddl.createTable(schema, "obs", Ddl.Sqlite)
    assert(ddl ==
      """CREATE TABLE "obs" (
        |  "flag" integer,
        |  "bits" blob,
        |  "counts" integer NOT NULL,
        |  "idx" integer,
        |  "big" integer,
        |  "ubig" numeric,
        |  "flux" real,
        |  "ra" real NOT NULL,
        |  "name" text,
        |  "vis_re" real,
        |  "vis_im" real,
        |  "spec" text,
        |  "obs_date" text,
        |  "obs_ts" text
        |)""".stripMargin)
  }

  test("--create / --drop / --truncate statement sequences") {
    val small = StructType(Seq(StructField("x", IntegerType)))
    assert(Ddl.statements(small, "t", Ddl.Postgres, Create) ==
      Seq("CREATE TABLE IF NOT EXISTS \"t\" (\n  \"x\" integer\n)"))
    assert(Ddl.statements(small, "t", Ddl.Postgres, DropCreate) ==
      Seq("DROP TABLE IF EXISTS \"t\"",
        "CREATE TABLE \"t\" (\n  \"x\" integer\n)"))
    assert(Ddl.statements(small, "t", Ddl.Postgres, TruncateLoad) ==
      Seq("CREATE TABLE IF NOT EXISTS \"t\" (\n  \"x\" integer\n)",
        "TRUNCATE TABLE \"t\""))
    // sqlite has no TRUNCATE: DELETE FROM is the documented analog
    assert(Ddl.statements(small, "t", Ddl.Sqlite, TruncateLoad).last ==
      "DELETE FROM \"t\"")
  }

  test("serial pkey clause per dialect (fits2db --pkey)") {
    val small = StructType(Seq(StructField("x", IntegerType)))
    assert(Ddl.createTable(small, "t", Ddl.Postgres, pkey = Some("id"))
      .contains("\"id\" bigserial PRIMARY KEY"))
    assert(Ddl.createTable(small, "t", Ddl.MySql, pkey = Some("id"))
      .contains("`id` bigint NOT NULL AUTO_INCREMENT PRIMARY KEY"))
    assert(Ddl.createTable(small, "t", Ddl.Sqlite, pkey = Some("id"))
      .contains("\"id\" integer PRIMARY KEY AUTOINCREMENT"))
  }

  test("identifier quoting survives embedded quote characters") {
    val s = StructType(Seq(StructField("we\"ird", IntegerType)))
    assert(Ddl.createTable(s, "ta\"ble", Ddl.Postgres)
      .contains("\"ta\"\"ble\"") )
    val m = StructType(Seq(StructField("we`ird", IntegerType)))
    assert(Ddl.createTable(m, "ta`ble", Ddl.MySql).contains("`ta``ble`"))
  }

  test("unknown dialect and unmappable type fail loudly") {
    intercept[IllegalArgumentException] {
      Ddl.statements(StructType(Nil), "t",
        Ddl.dialects.getOrElse("oracle",
          throw new IllegalArgumentException("unknown dialect 'oracle'")),
        Create)
    }
    intercept[IllegalArgumentException] {
      Ddl.createTable(StructType(Seq(
        StructField("m", MapType(StringType, IntegerType)))), "t", Ddl.Postgres)
    }
  }
}
