package graft

import graft.ingest.Ddl
import graft.ingest.Ddl.{Create, DropCreate, TruncateLoad}
import org.apache.spark.sql.types._

/** Golden-DDL gate for the dialect layer: every SURVEY §1.2 type row that
  * reaches a Spark type, rendered for each of the reference's three targets.
  * No postgres/mysql/sqlite server exists in the sandbox (SURVEY §0), so
  * exact strings ARE the contract for those; the Derby dialect additionally
  * EXECUTES (create → JDBC load → read back).
  */
class DdlSpec extends SparkTestBase {

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

  test("emitted DDL executes on a live server (Derby): create -> load -> read back") {
    // Derby is not a fits2db target but it is the only live SQL server in
    // the sandbox — executing the emitted statements proves the DDL layer
    // produces real SQL, not just strings that look right.
    val url = "jdbc:derby:/tmp/graft_test/ddl_derby;create=true"
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("label", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val stmts = Ddl.statements(schema, "ddl_exec", Ddl.Derby, Ddl.DropCreate)
    assert(stmts == Seq(
      "DROP TABLE \"ddl_exec\"",
      "CREATE TABLE \"ddl_exec\" (\n  \"k\" bigint NOT NULL,\n  \"label\" clob,\n  \"score\" double\n)"))
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      stmts.foreach { s =>
        try st.execute(s)
        catch { // plain DROP on a table that never existed (no IF EXISTS in Derby)
          case e: java.sql.SQLException if s.startsWith("DROP") && e.getSQLState == "42Y55" => ()
        }
      }
    } finally conn.close()
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, null: String, 2.5))
      .toDF("k", "label", "score")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    df.write.mode("append").jdbc(url, "\"ddl_exec\"", props)
    val back = spark.read.jdbc(url, "\"ddl_exec\"", props)
    assert(back.count() == 3)
    assert(back.orderBy("k").collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getDouble(2))).toSeq ==
      Seq((1L, Some("a"), 0.5), (2L, Some("b"), 1.5), (3L, None, 2.5)))
  }

  test("unknown dialect and unmappable type fail loudly") {
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("x", IntegerType))))
    val e = intercept[IllegalArgumentException] {
      Ddl.forFrame(df, "t", "oracle") // library's own unknown-dialect path
    }
    assert(e.getMessage.contains("unknown dialect"))
    intercept[IllegalArgumentException] {
      Ddl.createTable(StructType(Seq(
        StructField("m", MapType(StringType, IntegerType)))), "t", Ddl.Postgres)
    }
  }
}
