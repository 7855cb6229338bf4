package graft

import java.io.PrintStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{Catalog, Etl, Sources, Transforms}

/** Interactive console front-end — user-facing parity with the reference's
  * prompt-driven ETL flow (reference: src/etl/ETLProcess.java:29-53 main
  * flow, :77-140 source/destination pickers, :313-386 mapping + transform
  * dialogs), driving the library modules the engine already exposes:
  * [[Catalog]] for discovery, [[Etl]] for mapping/transforms, [[Sinks]] for
  * load semantics. The console collects a DESCRIPTION of the pipeline; the
  * execution is still one lazy Spark plan — nothing is row-at-a-time.
  *
  * Testability: [[Cli.run]] takes the input lines and output stream as
  * parameters, so a scripted-stdin test can walk the whole dialog; `main`
  * wires real stdin/stdout.
  */
object Cli {

  /** Thrown when stdin ends mid-dialog. */
  final class InputExhausted extends RuntimeException("input ended mid-dialog")

  private final class Io(in: Iterator[String], val out: PrintStream) {
    def readLine(prompt: String): String = {
      out.print(prompt)
      if (!in.hasNext) throw new InputExhausted
      in.next().trim
    }
    /** Menu-int read with re-prompt on junk (the reference's nextInt would
      * crash; table-name re-prompt validation is :98-102,133-137). */
    @annotation.tailrec
    def readInt(prompt: String): Int =
      readLine(prompt).toIntOption match {
        case Some(n) => n
        case None    => out.println("Not a number."); readInt(prompt)
      }
  }

  /** Re-prompt until the name is a known table (R17 validation parity,
    * reference :98-102 source, :133-137 destination). */
  @annotation.tailrec
  private def pickTable(io: Io, tables: Seq[String], role: String): String = {
    val name = io.readLine(s"Enter the $role table name: ")
    if (tables.contains(name)) name
    else {
      io.out.println(s"Table '$name' does not exist.")
      pickTable(io, tables, role)
    }
  }

  /** Source configuration (reference :77-89): raw SQL or table+columns. */
  private def configureSource(io: Io, spark: SparkSession, dir: String): DataFrame = {
    io.out.println("=== SOURCE CONFIGURATION ===")
    io.out.println("1. Enter a SQL query")
    io.out.println("2. Pick a source table")
    // any value other than 1 falls through to the table picker — reference
    // parity (ETLProcess.java:82-89 does `if (opcion == 1) ... else ...`)
    if (io.readInt("Option: ") == 1) {
      // raw SQL pass-through (R2, reference :84-86): Spark SQL executes it
      Catalog.sql(spark, dir, io.readLine("SQL> "))
    } else {
      val tables = Catalog.listTables(dir)
      io.out.println("Available tables:")
      tables.foreach(t => io.out.println(s"- $t"))
      val table = pickTable(io, tables, "source")
      val cols = Catalog.listColumns(spark, dir, table)
      io.out.println(s"Columns in '$table':")
      cols.foreach(c => io.out.println(s"- $c"))
      val picked = io.readLine("Columns to export (comma-separated): ")
        .split(",").map(_.trim).filter(cols.contains).toSeq
      // no valid column is a hard error, not a re-prompt (reference :122-124)
      if (picked.isEmpty) throw new IllegalArgumentException("No valid columns selected.")
      Tables(spark, dir, table).select(picked.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  /** Per-source-column mapping prompt (reference :313-345): empty skips,
    * unknown destination warns and skips; PK completeness is enforced by
    * Etl.mapColumns (hard error, :336-342). */
  private def mapColumns(io: Io, source: DataFrame, destCols: Seq[String],
      pks: Seq[String]): Seq[(String, String)] = {
    io.out.println("=== COLUMN MAPPING ===")
    io.out.println(s"Source columns: ${source.columns.mkString(", ")}")
    io.out.println(s"Destination columns: ${destCols.mkString(", ")}")
    if (pks.nonEmpty) io.out.println(s"Primary keys: ${pks.mkString(", ")}")
    val used = scala.collection.mutable.Set[String]()
    source.columns.toSeq.flatMap { c =>
      val d = io.readLine(s"Destination column for '$c' (empty to skip): ")
      if (destCols.contains(d) && !used(d)) { used += d; Some(c -> d) }
      else {
        // a doubly-mapped destination would produce two same-named columns
        // and die later in an ambiguous-reference analysis error — warn and
        // skip here, like every other invalid input in the dialog
        if (used(d)) io.out.println(s"Destination column '$d' is already mapped. Skipping.")
        else if (d.nonEmpty) io.out.println(s"Destination column '$d' does not exist. Skipping.")
        None
      }
    }
  }

  /** Transform menu per mapped column (reference :348-386). */
  private def askTransforms(io: Io, cols: Seq[String]): Map[String, Transforms.Transform] = {
    io.out.println("=== TRANSFORMS ===")
    cols.map { c =>
      io.out.println(s"Column: $c")
      io.out.println("1. Lowercase")
      io.out.println("2. Uppercase")
      io.out.println("3. Extract date part")
      io.out.println("4. Concatenate a value")
      io.out.println("5. No transform")
      val t: Transforms.Transform = io.readInt("Option: ") match {
        case 1 => Transforms.Lower
        case 2 => Transforms.Upper
        case 3 => Transforms.DatePart(io.readLine("Part (año/mes/día/hora): "))
        case 4 => Transforms.ConcatLit(io.readLine("Value to concatenate: "))
        case _ => Transforms.Identity
      }
      c -> t
    }.toMap
  }

  /** Walk the full dialog and return the loaded result (lazily planned;
    * the caller decides when to materialize). */
  def run(spark: SparkSession, dir: String, input: Iterator[String],
      out: PrintStream): DataFrame = {
    val io = new Io(input, out)
    val source = configureSource(io, spark, dir)

    out.println("=== DESTINATION CONFIGURATION ===")
    val tables = Catalog.listTables(dir)
    io.out.println("Available tables:")
    tables.foreach(t => io.out.println(s"- $t"))
    val dest = pickTable(io, tables, "destination")
    val destCols = Catalog.listColumns(spark, dir, dest)
    val pks = Catalog.mergeKeys.getOrElse(dest, Nil)

    val mapping = mapColumns(io, source, destCols, pks)
    val etl = Etl(source).mapColumns(mapping, pks) // PK hard error lives here
    val transformed = etl.transform(askTransforms(io, mapping.map(_._2)))

    // Load against the mapped slice of the destination (the reference's
    // INSERT/UPDATE also touches only mapped columns, :388-427,444-466).
    val existing = Tables(spark, dir, dest)
      .select(mapping.map(m => org.apache.spark.sql.functions.col(m._2)): _*)
    val result =
      if (pks.nonEmpty) {
        // a distributed last-writer-wins merge needs an explicit ordering
        // column (SURVEY §7.4) where the reference relied on arrival order
        @annotation.tailrec
        def askOrder(): String = {
          val c = io.readLine(s"Ordering column for last-writer-wins (${mapping.map(_._2).mkString(", ")}): ")
          if (mapping.exists(_._2 == c)) c
          else { out.println(s"'$c' is not a mapped column."); askOrder() }
        }
        transformed.loadUpsert(existing, pks, askOrder())
      } else transformed.loadInsertIfAbsent(existing)
    out.println(s"ETL complete. Loaded into '$dest'.")
    result
  }

  /** JDBC-mode dialog — the reference's ACTUAL runtime shape: both ends are
    * live database connections from config.properties (ETLProcess.java:13-26),
    * discovery is `DatabaseMetaData` (:142-159 tables, :290-300 PKs), and the
    * load is keyed upsert when the destination declares a PK (:198-206),
    * full-row insert-if-absent otherwise (:444-466). Same mapping/transform
    * dialogs as parquet mode — only the endpoints differ. */
  def runJdbc(spark: SparkSession, src: Sources.JdbcConfig,
      dst: Sources.JdbcConfig, input: Iterator[String],
      out: PrintStream): DataFrame = {
    val io = new Io(input, out)
    out.println("=== SOURCE CONFIGURATION ===")
    out.println("1. Enter a SQL query")
    out.println("2. Pick a source table")
    val source =
      if (io.readInt("Option: ") == 1) {
        // raw SQL pushed to the SOURCE database verbatim (R2, :84-86)
        Sources.jdbcQuery(spark, src, io.readLine("SQL> "))
      } else {
        val tables = Sources.listJdbcTables(src)
        out.println("Available tables:")
        tables.foreach(t => out.println(s"- $t"))
        val table = pickTable(io, tables, "source")
        val full = Sources.jdbcTable(spark, src, table)
        val cols = full.columns.toSeq
        out.println(s"Columns in '$table':")
        cols.foreach(c => out.println(s"- $c"))
        val picked = io.readLine("Columns to export (comma-separated): ")
          .split(",").map(_.trim).filter(cols.contains).toSeq
        if (picked.isEmpty) throw new IllegalArgumentException("No valid columns selected.")
        full.select(picked.map(org.apache.spark.sql.functions.col): _*)
      }

    out.println("=== DESTINATION CONFIGURATION ===")
    val tables = Sources.listJdbcTables(dst)
    out.println("Available tables:")
    tables.foreach(t => out.println(s"- $t"))
    val dest = pickTable(io, tables, "destination")
    val destCols = Sources.jdbcTable(spark, dst, dest).columns.toSeq
    val pks = Sources.jdbcPrimaryKeys(dst, dest)

    val mapping = mapColumns(io, source, destCols, pks)
    val etl = Etl(source).mapColumns(mapping, pks)
    val transformed = etl.transform(askTransforms(io, mapping.map(_._2)))

    if (pks.nonEmpty) {
      @annotation.tailrec
      def askOrder(): String = {
        val c = io.readLine(s"Ordering column for last-writer-wins (${mapping.map(_._2).mkString(", ")}): ")
        if (mapping.exists(_._2 == c)) c
        else { out.println(s"'$c' is not a mapped column."); askOrder() }
      }
      Sources.jdbcUpsert(transformed.result, dst, dest, pks, askOrder())
    } else {
      // no-PK destinations get the reference's insert-with-verification
      // (construirInsertConVerificacion, :444-466): only rows not already
      // present whole-row land, so rerunning a dialog never duplicates
      Sources.jdbcInsertIfAbsent(spark, transformed.result, dst, dest)
    }
    out.println(s"ETL complete. Loaded into '$dest'.")
    Sources.jdbcTable(spark, dst, dest)
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.configure(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a .properties argument selects JDBC mode (the reference's entry
    // point); anything else is a parquet data dir
    val result = args.headOption match {
      case Some(p) if p.endsWith(".properties") =>
        val props = Sources.loadProperties(p)
        runJdbc(spark, Sources.jdbcConfig(props, "origen"),
          Sources.jdbcConfig(props, "destino"),
          scala.io.Source.stdin.getLines(), System.out)
      case other =>
        run(spark, other.getOrElse("/root/testdata/sf0.001"),
          scala.io.Source.stdin.getLines(), System.out)
    }
    // materialize + show a sample, like the reference's completion report
    System.out.println(s"Rows: ${result.count()}")
    result.show(10, truncate = false)
    spark.stop()
  }
}
