package graft.engine

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Source/sink construction — the engine's equivalents of the reference's
  * JDBC-to-JDBC endpoints plus the parquet endpoints the harness exercises.
  *
  * The reference opens two SQL Server connections from config and streams a
  * query result row-by-row (reference: src/etl/ETLProcess.java:13-26,66-75,
  * 163-164), loading in 1000-row batches (:210,263-267). Here both ends are
  * DataFrames: a JDBC read becomes a partitioned parallel scan (predicate
  * pushdown included), and the 1000-row write batching maps onto the JDBC
  * writer's `batchsize` — per-executor round trips instead of a single
  * serial connection. Parquet endpoints are the test/bench stand-ins and
  * the native lake format at scale.
  */
object Sources {

  /** Connection config — mirrors config.properties:1-9 (url/user/password
    * per side) without any vendor specifics. */
  final case class JdbcConfig(url: String, user: String, password: String)

  /** Match the reference's MAX_BATCH_SIZE (ETLProcess.java:210). */
  val DefaultBatchSize = 1000

  def parquet(spark: SparkSession, dir: String, table: String): DataFrame =
    graft.Tables(spark, dir, table)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** CSV/JSON endpoints — the interchange formats a complete engine needs
    * beside the columnar lake format. Explicit schema avoids the inference
    * scan (a full extra pass over the data at scale). */
  def csv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header)
    schema.fold(r.option("inferSchema", true))(r.schema).csv(path)
  }

  def json(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned write: readers with a predicate on the
    * partition columns scan only matching directories (PartitionFilters in
    * the plan — whole partitions pruned before any I/O). The 100 TB layout
    * decision: partition by the dominant filter dimension, NOT high-
    * cardinality keys (small-files explosion). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write: rows are hash-bucketed by `bucketCols` at write
    * time, so an equi-join (or aggregate) on those columns between tables
    * with the same bucketing needs NO shuffle at read time — the
    * co-located-join layout for repeated large-fact joins. Requires the
    * session catalog (`saveAsTable`); `sortCols` additionally pre-sorts
    * within buckets for merge-join without a sort. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: bucketCols must be non-empty")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  private def baseOptions(cfg: JdbcConfig): Map[String, String] =
    Map("url" -> cfg.url, "user" -> cfg.user, "password" -> cfg.password)

  /** Option map for a (possibly range-partitioned) table read — pure, so
    * the wiring is unit-testable without a database. */
  private[engine] def jdbcReadOptions(cfg: JdbcConfig, table: String,
      partitionColumn: Option[String], lowerBound: Long, upperBound: Long,
      numPartitions: Int): Map[String, String] =
    baseOptions(cfg) ++ Map("dbtable" -> table) ++
      partitionColumn.map { c =>
        Map("partitionColumn" -> c,
          "lowerBound" -> lowerBound.toString,
          "upperBound" -> upperBound.toString,
          "numPartitions" -> numPartitions.toString)
      }.getOrElse(Map.empty)

  private[engine] def jdbcWriteOptions(cfg: JdbcConfig, table: String,
      batchSize: Int): Map[String, String] =
    baseOptions(cfg) ++ Map("dbtable" -> table, "batchsize" -> batchSize.toString)

  /** Whole-table JDBC scan (R1). `partitionColumn`+bounds turn the serial
    * cursor of the reference into N parallel range scans — the difference
    * between one connection streaming 100 TB and a cluster reading it. */
  def jdbcTable(spark: SparkSession, cfg: JdbcConfig, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0, upperBound: Long = 0,
      numPartitions: Int = 1): DataFrame =
    spark.read.format("jdbc")
      .options(jdbcReadOptions(cfg, table, partitionColumn,
        lowerBound, upperBound, numPartitions))
      .load()

  /** Raw-SQL extraction (R2): the query is pushed to the source database
    * verbatim, exactly like the reference's pass-through
    * (ETLProcess.java:84-86,163-164). */
  def jdbcQuery(spark: SparkSession, cfg: JdbcConfig, query: String): DataFrame =
    spark.read.format("jdbc")
      .options(baseOptions(cfg) + ("query" -> query))
      .load()

  /** Append rows over JDBC in `batchsize` batches (R16 parity). Transaction
    * semantics differ by design: the reference commits every 1000 rows and
    * can leave partial loads (ETLProcess.java:263-278); Spark's task commit
    * is all-or-nothing per task. */
  def jdbcAppend(df: DataFrame, cfg: JdbcConfig, table: String,
      batchSize: Int = DefaultBatchSize): Unit =
    df.write.format("jdbc")
      .options(jdbcWriteOptions(cfg, table, batchSize))
      .mode(SaveMode.Append)
      .save()
}
