package graft.ingest

import org.apache.spark.sql.SparkSession

/** The fits2db command (SURVEY §3.1): argv → expand input globs → read the
  * table extension → conversion chain → DDL lifecycle → bulk load.
  *
  * ```
  * graft-ingest [options] <input file/glob>...
  *   --table NAME        target table (default: converted)
  *   --format FMT        source format: fits|parquet|csv (default: fits)
  *   --dialect D         sink: postgres|mysql|sqlite|derby → JDBC (needs
  *                       --url), csv|parquet → files (needs --out)
  *   --url JDBC_URL      JDBC connection string for DB dialects
  *   --out PATH          output path for csv/parquet sinks
  *   --create            create table if absent (default lifecycle)
  *   --drop              drop + recreate before load
  *   --truncate          create if absent, clear rows, then load
  *   --extnum N          FITS extension number (default: first table HDU)
  *   --pkey NAME         add a stable serial key column
  *   --chunk N           rows per JDBC INSERT batch (chunk-size analog)
  *   --concurrency N     sink fan-in: repartition to N writers
  * ```
  *
  * The reference's per-file worker pool maps to tasks over file splits:
  * the expanded file list becomes ONE multi-file scan (same schema), so
  * Spark schedules per-split tasks instead of forking per-file processes,
  * and the JDBC append opens one connection per partition — identical
  * fan-out shape, no driver funnel.
  */
object Main {

  final case class CliArgs(
      inputs: Seq[String] = Nil,
      table: Option[String] = None, // default "converted" (DB dialects only)
      format: String = "fits",
      dialect: String = "parquet",
      url: Option[String] = None,
      out: Option[String] = None,
      mode: Option[Ddl.Mode] = None, // default Create (DB dialects only)
      extnum: Option[Int] = None,
      pkey: Option[String] = None,
      chunk: Option[Int] = None,
      concurrency: Option[Int] = None)

  private val jdbcDialects = Set("postgres", "mysql", "sqlite", "derby")
  private val fileSinks = Set("csv", "parquet")

  def usage: String = {
    "usage: graft-ingest [options] <input file/glob>...\n" +
      "  --table NAME  --format fits|parquet|csv  --dialect " +
      "postgres|mysql|sqlite|derby|csv|parquet\n" +
      "  --url JDBC_URL  --out PATH  --create|--drop|--truncate\n" +
      "  --extnum N  --pkey NAME  --chunk N  --concurrency N"
  }

  /** argv → CliArgs; throws IllegalArgumentException with a usage-bearing
    * message on any malformed input (the CLI's exit-2 path).
    */
  def parse(argv: Seq[String]): CliArgs = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg\n$usage")
    def intArg(flag: String, v: String): Int =
      try v.toInt catch { case _: NumberFormatException =>
        fail(s"$flag expects an integer, got '$v'") }
    // a flag's value must not itself be a flag: '--table --drop' would
    // otherwise silently load into a table named '--drop' AND discard the
    // lifecycle the user asked for
    def valueOf(flag: String, rest: List[String]): (String, List[String]) =
      rest match {
        case v :: t if !v.startsWith("--") => (v, t)
        case _ => fail(s"$flag expects a value")
      }
    @annotation.tailrec
    def go(rest: List[String], acc: CliArgs): CliArgs = rest match {
      case Nil => acc
      case "--table" :: r =>
        val (v, t) = valueOf("--table", r); go(t, acc.copy(table = Some(v)))
      case "--format" :: r =>
        val (v, t) = valueOf("--format", r); go(t, acc.copy(format = v))
      case "--dialect" :: r =>
        val (v, t) = valueOf("--dialect", r); go(t, acc.copy(dialect = v.toLowerCase))
      case "--url" :: r =>
        val (v, t) = valueOf("--url", r); go(t, acc.copy(url = Some(v)))
      case "--out" :: r =>
        val (v, t) = valueOf("--out", r); go(t, acc.copy(out = Some(v)))
      case "--create" :: t => go(t, acc.copy(mode = Some(Ddl.Create)))
      case "--drop" :: t => go(t, acc.copy(mode = Some(Ddl.DropCreate)))
      case "--truncate" :: t => go(t, acc.copy(mode = Some(Ddl.TruncateLoad)))
      case "--extnum" :: r =>
        val (v, t) = valueOf("--extnum", r)
        go(t, acc.copy(extnum = Some(intArg("--extnum", v))))
      case "--pkey" :: r =>
        val (v, t) = valueOf("--pkey", r); go(t, acc.copy(pkey = Some(v)))
      case "--chunk" :: r =>
        val (v, t) = valueOf("--chunk", r)
        go(t, acc.copy(chunk = Some(intArg("--chunk", v))))
      case "--concurrency" :: r =>
        val (v, t) = valueOf("--concurrency", r)
        go(t, acc.copy(concurrency = Some(intArg("--concurrency", v))))
      case flag :: _ if flag.startsWith("--") => fail(s"unknown option $flag")
      case p :: t => go(t, acc.copy(inputs = acc.inputs :+ p))
    }
    val args = go(argv.toList, CliArgs())
    if (args.inputs.isEmpty) fail("no input files given")
    if (jdbcDialects(args.dialect) && args.url.isEmpty)
      fail(s"--dialect ${args.dialect} needs --url")
    if (fileSinks(args.dialect) && args.out.isEmpty)
      fail(s"--dialect ${args.dialect} needs --out")
    if (!jdbcDialects(args.dialect) && !fileSinks(args.dialect))
      fail(s"unknown dialect '${args.dialect}'")
    // DB-only flags on a file sink would be silently discarded — the same
    // loud-over-lossy rule as the '--table --drop' guard above
    if (fileSinks(args.dialect)) {
      val dbOnly = Seq(
        args.table.map(_ => "--table"),
        args.mode.map {
          case Ddl.Create => "--create"
          case Ddl.DropCreate => "--drop"
          case Ddl.TruncateLoad => "--truncate"
        },
        args.chunk.map(_ => "--chunk")).flatten
      if (dbOnly.nonEmpty)
        fail(s"${dbOnly.mkString("/")} apply only to DB dialects " +
          s"(postgres|mysql|sqlite|derby), not --dialect ${args.dialect}")
    }
    args
  }

  /** Expands each pattern through the Hadoop glob syntax the reference's
    * shell-glob inputs map onto; fails loudly when a pattern matches
    * nothing (a silent empty scan would "succeed" and load zero rows).
    */
  def expandGlobs(spark: SparkSession, patterns: Seq[String]): Seq[String] =
    patterns.flatMap { p =>
      // one expander for CLI and DSv2 (graft.fits.FitsTable.expandOne:
      // literal fast-path + sorted glob); the CLI adds its own
      // fail-loudly-per-pattern contract on top
      val matched = graft.fits.FitsTable.expandOne(p)
      require(matched.nonEmpty, s"no input files match '$p'")
      matched
    }

  /** Runs one parsed invocation against an existing session (separated
    * from `main` so tests drive the full path without exiting the JVM).
    */
  def run(spark: SparkSession, args: CliArgs): Unit = {
    val files = expandGlobs(spark, args.inputs)
    val readerOptions =
      args.extnum.map(n => Map("extnum" -> n.toString)).getOrElse(Map.empty)
    if (jdbcDialects(args.dialect))
      Convert.ingestAll(spark, files, args.format, readerOptions,
        Convert.ConvertSpec(), args.url.get, sinkFormat = "jdbc",
        jdbcTable = args.table.getOrElse("converted"),
        jdbcDdl = Some((Ddl.dialects(args.dialect), args.mode.getOrElse(Ddl.Create))),
        pkey = args.pkey, concurrency = args.concurrency,
        batchRows = args.chunk)
    else
      Convert.ingestAll(spark, files, args.format, readerOptions,
        Convert.ConvertSpec(), args.out.get, sinkFormat = args.dialect,
        pkey = args.pkey, concurrency = args.concurrency)
  }

  def main(argv: Array[String]): Unit = {
    val args =
      try parse(argv.toIndexedSeq)
      catch { case e: IllegalArgumentException =>
        System.err.println(e.getMessage); sys.exit(2) }
    val spark = graft.Util.sessionBuilder(
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"),
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("graft-ingest")
      .getOrCreate()
    // run-phase usage errors (empty glob match, dialect/type rejections)
    // are CLI errors too — message + exit 2, not a raw stack trace
    try run(spark, args)
    catch { case e: IllegalArgumentException =>
      System.err.println(e.getMessage); spark.stop(); sys.exit(2) }
    finally spark.stop()
  }
}
