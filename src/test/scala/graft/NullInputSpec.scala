package graft

import org.apache.spark.sql.functions.lit

/** Every operator against a fixture containing a row whose every non-key
  * column is NULL: schema-legal input (all fixture columns are nullable in
  * the parquet schemas), and at 100 TB some upstream WILL eventually
  * produce it. Null semantics are an op-level choice (propagate, drop,
  * score-as-null) — this sweep only asserts that no operator CRASHES on it
  * (a generator like sequence() with a null-derived bound throws, not
  * nulls out).
  */
class NullInputSpec extends SparkSpec {

  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Tables.names.foreach { n =>
      val base = Tables(spark, "/root/testdata/sf0.001", n)
      val keys = graft.engine.Catalog.mergeKeys.getOrElse(n, Nil)
      // one all-null row (keys kept non-null — a fresh id value)
      val nullRow = base.limit(1).select(base.schema.fields.toSeq.map { f =>
        (if (keys.contains(f.name)) lit(999999).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      base.limit(5).union(nullRow)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name tolerates an all-null row without throwing") {
      noException should be thrownBy fn(spark, nullDir).collect()
    }
  }
}
