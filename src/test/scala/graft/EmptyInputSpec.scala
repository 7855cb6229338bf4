package graft

/** Every operator against an ALL-EMPTY fixture (correct schemas, zero
  * rows): at 100 TB an empty source — a day with no events, a partition
  * with no documents, a corpus with no near-dups — is a normal input, and
  * an operator that crashes on it takes the whole pipeline down. Only
  * no-throw is asserted; ops that generate rows without table input
  * (series generation, recursive seeds) legitimately return data.
  *
  * This sweep caught a real one: connected components' label-sum
  * convergence aggregate is NULL over zero rows and tripped its own
  * overflow guard (fixed in engine/Graph.scala, pinned in GraphSpec).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { n =>
      val schema = Tables(spark, "/root/testdata/sf0.001", n).schema
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name handles an all-empty fixture without throwing") {
      noException should be thrownBy fn(spark, emptyDir).collect()
    }
  }
}
