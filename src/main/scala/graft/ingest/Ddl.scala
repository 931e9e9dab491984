package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Dialect-parameterized DDL emission — the fits2db "emit DDL once
  * (CREATE TABLE [; DROP/TRUNCATE first])" step (SURVEY §3.1) for the three
  * reference targets {postgres | mysql | sqlite}. The type rows are SURVEY
  * §1.2's Spark column ("Spark type") mapped back out to each target's SQL;
  * no server is reachable in this sandbox, so the layer is a pure
  * schema→statements function, gated by golden-string tests (DdlSpec).
  *
  * Scale note: DDL is emitted once per load on the driver — it is O(columns)
  * and never touches data, so there is nothing to distribute. The statements
  * are what a JDBC sink runs in its setup transaction before the per-
  * partition batch writes fan out.
  */
object Ddl {

  sealed trait Dialect {
    def name: String
    /** identifier quoting: postgres/sqlite use "x", mysql uses `x`. */
    def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
    def sqlType(dt: DataType): String
    /** auto-increment surrogate-key column clause (fits2db --pkey). */
    def serialPkey(name: String): String
    /** TRUNCATE has no sqlite spelling; DELETE FROM is its documented analog. */
    def truncate(table: String): String = s"TRUNCATE TABLE ${quote(table)}"
    /** Derby has no IF [NOT] EXISTS clause; emitters degrade to the plain
      * form there (loaders catch the already/never-existed errors).
      */
    def supportsIfExists: Boolean = true
  }

  /** SURVEY §1.2 "Typical SQL (postgres)" column, verbatim where given. */
  case object Postgres extends Dialect {
    val name = "postgres"
    def sqlType(dt: DataType): String = dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType => "smallint" // TFORM B/I (no unsigned: widen)
      case IntegerType => "integer" // TFORM J
      case LongType => "bigint" // TFORM K
      case d: DecimalType => s"numeric(${d.precision},${d.scale})" // unsigned-64
      case FloatType => "real" // TFORM E
      case DoubleType => "double precision" // TFORM D
      case StringType => "text" // TFORM rA
      case BinaryType => "bytea" // TFORM X bit array
      case DateType => "date"
      case TimestampType | TimestampNTZType => "timestamp"
      case ArrayType(e, _) => s"${sqlType(e)}[]" // SQL-array mode for rT/P/Q
      case other => throw new IllegalArgumentException(
        s"no postgres mapping for $other (expand structs before DDL)")
    }
    def serialPkey(name: String): String = s"${quote(name)} bigserial PRIMARY KEY"
  }

  case object MySql extends Dialect {
    val name = "mysql"
    override def quote(id: String): String = "`" + id.replace("`", "``") + "`"
    def sqlType(dt: DataType): String = dt match {
      case BooleanType => "tinyint(1)"
      case ByteType | ShortType => "smallint"
      case IntegerType => "int"
      case LongType => "bigint"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case FloatType => "float"
      case DoubleType => "double"
      case StringType => "text"
      case BinaryType => "blob"
      case DateType => "date"
      case TimestampType | TimestampNTZType => "datetime"
      // no native arrays: JSON column (fits2db's array mode alternative is
      // scalar expansion — EtlOps b6 — which needs no special type)
      case ArrayType(_, _) => "json"
      case other => throw new IllegalArgumentException(
        s"no mysql mapping for $other (expand structs before DDL)")
    }
    def serialPkey(name: String): String =
      s"${quote(name)} bigint NOT NULL AUTO_INCREMENT PRIMARY KEY"
  }

  /** sqlite's storage classes are dynamic; these are the conventional
    * affinity declarations.
    */
  case object Sqlite extends Dialect {
    val name = "sqlite"
    def sqlType(dt: DataType): String = dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType => "integer"
      case _: DecimalType => "numeric"
      case FloatType | DoubleType => "real"
      case StringType => "text"
      case BinaryType => "blob"
      case DateType | TimestampType | TimestampNTZType => "text" // ISO-8601 convention
      case ArrayType(_, _) => "text" // JSON-encoded
      case other => throw new IllegalArgumentException(
        s"no sqlite mapping for $other (expand structs before DDL)")
    }
    def serialPkey(name: String): String =
      s"${quote(name)} integer PRIMARY KEY AUTOINCREMENT"
    override def truncate(table: String): String = s"DELETE FROM ${quote(table)}"
  }

  /** Embedded Derby — not a fits2db target, but the only live SQL server
    * in this sandbox; lets DdlSpec EXECUTE the emitted DDL (create → load
    * via the JDBC sink → read back) instead of only string-matching it.
    */
  case object Derby extends Dialect {
    val name = "derby"
    def sqlType(dt: DataType): String = dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType => "smallint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case d: DecimalType => s"decimal(${math.min(d.precision, 31)},${d.scale})"
      case FloatType => "real"
      case DoubleType => "double"
      // Spark's JDBC writer binds StringType as CLOB on Derby; a varchar
      // column would reject its setNull(CLOB) — match the loader.
      case StringType => "clob"
      case BinaryType => "blob"
      case DateType => "date"
      case TimestampType | TimestampNTZType => "timestamp"
      case other => throw new IllegalArgumentException(
        s"no derby mapping for $other (expand structs/arrays before DDL)")
    }
    def serialPkey(name: String): String =
      s"${quote(name)} bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY"
    override def supportsIfExists: Boolean = false
  }

  val dialects: Map[String, Dialect] =
    Seq(Postgres, MySql, Sqlite, Derby).map(d => d.name -> d).toMap

  /** Load-preparation policy, mirroring the reference CLI flags: --create
    * (create if absent), --drop (drop + recreate), --truncate (create if
    * absent, then clear rows).
    */
  sealed trait Mode
  case object Create extends Mode
  case object DropCreate extends Mode
  case object TruncateLoad extends Mode

  /** Complex (C/M TFORM) struct columns flatten to name_field scalar
    * columns — SURVEY §1.2's "expand to _re,_im" — so every remaining
    * column has a scalar/array SQL type.
    */
  def flattenStructs(schema: StructType): StructType =
    StructType(schema.fields.toSeq.flatMap {
      case StructField(n, st: StructType, nullable, _) =>
        st.fields.toSeq.map(f =>
          StructField(s"${n}_${f.name}", f.dataType, nullable || f.nullable))
      case f => Seq(f)
    })

  def createTable(schema: StructType, table: String, dialect: Dialect,
      ifNotExists: Boolean = false, pkey: Option[String] = None): String = {
    val flat = flattenStructs(schema)
    val pkeyCol = pkey.map(dialect.serialPkey).toSeq
    val cols = flat.fields.map { f =>
      val base = s"${dialect.quote(f.name)} ${dialect.sqlType(f.dataType)}"
      if (f.nullable) base else s"$base NOT NULL"
    }
    val ine = if (ifNotExists && dialect.supportsIfExists) "IF NOT EXISTS " else ""
    (pkeyCol ++ cols).mkString(
      s"CREATE TABLE $ine${dialect.quote(table)} (\n  ", ",\n  ", "\n)")
  }

  def dropTable(table: String, dialect: Dialect): String =
    if (dialect.supportsIfExists) s"DROP TABLE IF EXISTS ${dialect.quote(table)}"
    else s"DROP TABLE ${dialect.quote(table)}"

  /** The ordered statement list a loader runs before its first batch. */
  def statements(schema: StructType, table: String, dialect: Dialect,
      mode: Mode, pkey: Option[String] = None): Seq[String] = mode match {
    case Create =>
      Seq(createTable(schema, table, dialect, ifNotExists = true, pkey))
    case DropCreate =>
      Seq(dropTable(table, dialect),
        createTable(schema, table, dialect, ifNotExists = false, pkey))
    case TruncateLoad =>
      Seq(createTable(schema, table, dialect, ifNotExists = true, pkey),
        dialect.truncate(table))
  }

  /** Convenience: DDL for a DataFrame about to be loaded. */
  def forFrame(df: DataFrame, table: String, dialect: String,
      mode: Mode = Create, pkey: Option[String] = None): Seq[String] =
    statements(df.schema, table,
      dialects.getOrElse(dialect.toLowerCase,
        throw new IllegalArgumentException(
          s"unknown dialect '$dialect' (${dialects.keys.mkString("|")})")),
      mode, pkey)
}
