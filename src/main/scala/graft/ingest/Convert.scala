package graft.ingest

import graft.ops.EtlOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fits2db-equivalent ETL driver (SURVEY §3.2 E2): source → conversion
  * chain → sink, as one declarative pipeline.
  *
  * The B-group chain (normalize → widen → null-sentinel → NaN policy →
  * scale) is pure narrow column expressions, so Catalyst fuses the whole
  * thing into a single WholeStageCodegen stage per input split — the Spark
  * analog of fits2db's constant-memory chunk loop, parallelized over file
  * splits instead of a process pool (§3.1 mapping).
  *
  * Scale notes:
  *  - No global row_number here: fits2db's --pkey at 100 TB is assigned as
  *    (split-local ordinal + per-split offset); the offsets come from one
  *    tiny count-per-partition job. `addStablePkey` implements that shape.
  *  - JDBC sink: each partition opens one connection and batch-inserts
  *    (`spark.write.jdbc` semantics) — the COPY worker pool. Partition
  *    count = writer concurrency; `repartition(n)` controls DB fan-in.
  */
object Convert {

  /** Per-column conversion directives (the TSCAL/TZERO/TNULL of a source). */
  final case class ColumnRule(
      scale: Option[(Double, Double)] = None, // (TSCAL, TZERO)
      nullSentinel: Option[Long] = None,
      widenTo: Option[DataType] = None)

  final case class ConvertSpec(
      rules: Map[String, ColumnRule] = Map.empty,
      nanToNull: Boolean = true,
      normalizeNames: Boolean = true)

  /** source DataFrame → converted DataFrame (the whole fits2db pipeline as
    * one narrow expression chain).
    */
  def convert(df: DataFrame, spec: ConvertSpec): DataFrame = {
    val named = if (spec.normalizeNames) EtlOps.normalizeColumns(df) else df
    // A rule keyed by a name that doesn't exist POST-normalization would be
    // silently skipped (unscaled values reaching the sink) — fail loudly.
    val unknown = spec.rules.keySet -- named.columns.toSet
    require(unknown.isEmpty,
      s"ConvertSpec rules reference unknown columns: ${unknown.mkString(", ")} " +
        s"(note: rule keys match POST-normalization names; available: ${named.columns.mkString(", ")})")
    val converted = named.schema.fields.map { f =>
      val rule = spec.rules.getOrElse(f.name, ColumnRule())
      var c: Column = col(s"`${f.name}`")
      rule.nullSentinel.foreach(sv => c = EtlOps.nullSentinel(c, sv))
      if (spec.nanToNull && (f.dataType == DoubleType || f.dataType == FloatType))
        c = EtlOps.nanToNull(c)
      rule.scale.foreach { case (s, z) => c = EtlOps.scaleZero(c, s, z) }
      rule.widenTo.foreach(t => c = c.cast(t))
      c.as(f.name)
    }
    named.select(converted.toIndexedSeq: _*)
  }

  /** Stable serial pkey without a global sort bottleneck: per-partition
    * ordinals + exclusive prefix offsets (one lightweight count job). The
    * assignment is stable for a fixed partitioning of the source — for a
    * reproducible id across runs, sort by a business key first.
    */
  def addStablePkey(df: DataFrame, name: String = "pkey"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Pin ONE physical evaluation: both passes below must see the same
    // partitioning/row distribution, which a plain lazy plan does not
    // guarantee (AQE re-plans, task retries, non-deterministic sources).
    val pinned = df.localCheckpoint()
    val withPid = pinned.withColumn("__pid", spark_partition_id())
    // Pass 1 (lightweight job): per-partition row counts → exclusive prefix
    // offsets, computed on the driver (numPartitions rows, not data rows).
    val counts = withPid.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    // Broadcast-join the tiny (pid, offset) table — a WHEN-chain would grow
    // one branch per partition and blow plan depth at real split counts.
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    // Pass 2: partition-local ordinal (position order within the split).
    val w = Window.partitionBy("__pid").orderBy(monotonically_increasing_id())
    withPid.join(offsetDf, "__pid")
      .withColumn(name, row_number().over(w).cast(LongType) + col("__off"))
      .drop("__pid", "__off")
  }

  /** JDBC driver class by URL scheme; None lets Spark resolve from the
    * driver registry (normal for server DBs with the jar on the classpath).
    */
  private def jdbcDriverFor(url: String): Option[String] =
    if (url.startsWith("jdbc:derby:")) Some("org.apache.derby.jdbc.EmbeddedDriver")
    else None

  /** Mirrors `Ddl.flattenStructs` on the data side: struct columns (the
    * C/M complex case) expand to `name_field` scalar columns, so the frame
    * Spark appends lines up column-for-column with the table our DDL
    * created. Without this the DDL and the written frame disagree for any
    * struct-bearing schema (and Spark's JDBC writer cannot bind structs
    * anyway).
    */
  def flattenStructCols(df: DataFrame): DataFrame = {
    // the output NAMES come from Ddl.flattenStructs itself — one source of
    // truth, so a future change to its naming rule cannot desynchronize
    // the DDL'd table from the frame the JDBC writer appends
    val targetNames = Ddl.flattenStructs(df.schema).fieldNames
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap {
      case StructField(n, st: StructType, _, _) =>
        st.fields.toSeq.map(f => col(s"`$n`.`${f.name}`"))
      case f => Seq(col(s"`${f.name}`"))
    }
    require(cols.length == targetNames.length,
      "flattenStructCols drifted from Ddl.flattenStructs")
    df.select(cols.zip(targetNames).map { case (c, nm) => c.as(nm) }: _*)
  }

  /** fits2db's --create/--drop/--truncate lifecycle against a JDBC target:
    * run the dialect's DDL (graft.ingest.Ddl) in the loader's setup
    * transaction, then the data lands with SaveMode.Append into the table
    * WE defined — not the one Spark's writer would improvise. A DROP/
    * TRUNCATE against a table that does not exist yet is not an error
    * (first load), matching the reference CLI.
    */
  def prepareJdbcTable(url: String, table: String, schema: StructType,
      dialect: Ddl.Dialect, mode: Ddl.Mode): Unit = {
    // MySql/Sqlite DDL maps arrays to json/text columns that Spark's JDBC
    // writer can never bind an ArrayType to — the emitted table would be
    // unpopulatable through this load path. Fail at prepare time with the
    // remedy (scalar expansion, EtlOps b6) instead of at first batch.
    if (dialect == Ddl.MySql || dialect == Ddl.Sqlite)
      Ddl.flattenStructs(schema).fields
        .find(_.dataType.isInstanceOf[ArrayType]).foreach { f =>
          throw new IllegalArgumentException(
            s"${dialect.name}: array column '${f.name}' cannot be loaded over " +
              "JDBC (Spark binds no ArrayType for json/text targets) — expand " +
              "to scalar columns first (EtlOps.b6_array_expand)")
        }
    jdbcDriverFor(url).foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      Ddl.statements(schema, table, dialect, mode).foreach { s =>
        try st.execute(s)
        catch {
          case e: java.sql.SQLException
              if (s.startsWith("DROP") || s.startsWith("TRUNCATE") ||
                s.startsWith("DELETE")) && isMissingTable(e) => ()
          // dialects without IF NOT EXISTS (Derby) emit a plain CREATE;
          // an existing table is then the IF-NOT-EXISTS success case
          case e: java.sql.SQLException
              if s.startsWith("CREATE") && isAlreadyExists(e) => ()
        }
      }
    } finally conn.close()
  }

  /** Missing-table SQLSTATEs: standard 42S02 (mysql), Derby 42Y55/42X05,
    * postgres 42P01.
    */
  private def isMissingTable(e: java.sql.SQLException): Boolean =
    Set("42Y55", "42X05", "42S02", "42P01").contains(e.getSQLState)

  /** Already-exists SQLSTATEs: Derby X0Y32, mysql 42S01, postgres 42P07. */
  private def isAlreadyExists(e: java.sql.SQLException): Boolean =
    Set("X0Y32", "42S01", "42P07").contains(e.getSQLState)

  /** Full ingest: any-format source → convert → sink (parquet/csv/JDBC).
    * `jdbcDdl` = Some(dialect, mode) runs the fits2db DDL lifecycle first
    * and appends into the prepared table; None keeps Spark's own
    * overwrite-with-inferred-DDL behavior.
    */
  def ingest(spark: SparkSession, sourcePath: String, format: String,
      spec: ConvertSpec, sinkPath: String, sinkFormat: String = "parquet",
      jdbcTable: String = "converted",
      jdbcDdl: Option[(Ddl.Dialect, Ddl.Mode)] = None): Unit =
    ingestAll(spark, Seq(sourcePath), format, Map.empty, spec, sinkPath,
      sinkFormat, jdbcTable, jdbcDdl)

  /** Multi-file ingest — the CLI's expanded-glob entry (same-schema files
    * become one scan, the reference's worker-pool fan-out as tasks over
    * file splits).
    *  - `pkey`: add a stable serial key column (fits2db --pkey).
    *  - `concurrency`: repartition before the sink — DB fan-in control
    *    (one connection per partition on the JDBC path).
    *  - `batchRows`: rows per JDBC INSERT batch (the chunk-size analog).
    */
  def ingestAll(spark: SparkSession, sourcePaths: Seq[String], format: String,
      readerOptions: Map[String, String], spec: ConvertSpec, sinkPath: String,
      sinkFormat: String = "parquet", jdbcTable: String = "converted",
      jdbcDdl: Option[(Ddl.Dialect, Ddl.Mode)] = None,
      pkey: Option[String] = None, concurrency: Option[Int] = None,
      batchRows: Option[Int] = None): Unit = {
    require(sourcePaths.nonEmpty, "ingest needs at least one source path")
    val src = spark.read.format(format).options(readerOptions)
      .load(sourcePaths: _*)
    val converted = convert(src, spec)
    val keyed = pkey.fold(converted)(addStablePkey(converted, _))
    val out = concurrency.fold(keyed)(keyed.repartition(_))
    sinkFormat match {
      case "jdbc" =>
        val props = new java.util.Properties()
        jdbcDriverFor(sinkPath).foreach(props.setProperty("driver", _))
        batchRows.foreach(n => props.setProperty("batchsize", n.toString))
        // struct columns flatten to name_field scalars on BOTH sides (the
        // DDL flattens internally; the frame must match what it created)
        val flat = flattenStructCols(out)
        jdbcDdl match {
          case Some((dialect, mode)) =>
            prepareJdbcTable(sinkPath, jdbcTable, flat.schema, dialect, mode)
            // quoted with the DIALECT's quoting (mysql backticks, not "")
            // to hit the case-exact identifier our DDL created
            flat.write.mode("append").jdbc(sinkPath, dialect.quote(jdbcTable), props)
          case None =>
            flat.write.mode("overwrite").jdbc(sinkPath, jdbcTable, props)
        }
      case "parquet" => out.write.mode("overwrite").parquet(sinkPath)
      case "csv" =>
        // CSV holds scalars only: flatten complex structs like the JDBC
        // path, and reject arrays with the same remedy the DB dialects
        // give (Spark's bare AnalysisException names no fix)
        val flat = flattenStructCols(out)
        flat.schema.fields.find(_.dataType.isInstanceOf[ArrayType]).foreach { f =>
          throw new IllegalArgumentException(
            s"csv: array column '${f.name}' cannot be written to CSV — " +
              "expand to scalar columns first (EtlOps.b6_array_expand)")
        }
        flat.write.mode("overwrite").option("header", "true").csv(sinkPath)
      case other => throw new IllegalArgumentException(
        s"Unsupported sink format '$other' (jdbc, parquet, csv)")
    }
  }
}
