package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe (SURVEY §7.3.5): amplifies the sf0.1 fixture ~10×
  * into an adversarial dedup-heavy layout and times selected operators on
  * it. This is how the "sub-linear in pair volume / flat in corpus size"
  * claims in SURVEY.md are produced — kept as a main so any round can
  * re-run them reproducibly.
  *
  * Amplification (deterministic):
  *  - documents ×10 with shifted doc_ids and IDENTICAL text → every doc has
  *    9 exact replicas (worst case for dedup banding: every band collides);
  *  - embeddings ×10 with shifted vec_ids (≈100× candidate pairs);
  *  - events ×10 with shifted event_ids, same users (10× per-user density);
  *  - small dims copied as-is.
  *
  * Usage: runMain graft.ScaleProbe <baseSfDir> <outDir> [op ...]
  * (ops default to the dedup/similarity/event families).
  */
object ScaleProbe {
  private val Copies = 10
  private val Shift = 10000000L

  private def amplify(spark: SparkSession, base: String, out: String): Unit = {
    // the marker records WHAT produced the data: rerunning against a
    // different base (or Copies factor) must re-amplify, not silently time
    // ops on stale data labeled with the new base
    val stamp = s"base=$base copies=$Copies shift=$Shift"
    val done = java.nio.file.Paths.get(out, "_AMPLIFIED")
    if (java.nio.file.Files.exists(done)
        && java.nio.file.Files.readString(done).trim == stamp) return
    new java.io.File(out).mkdirs()
    def write(name: String, idCol: Option[String]): Unit = {
      val src = Tables(spark, base, name)
      val df = idCol match {
        case Some(id) =>
          (0 until Copies).map(i => src.withColumn(id, col(id) + lit(i * Shift)))
            .reduce(_ unionByName _)
        case None => src
      }
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }
    write("documents", Some("doc_id"))
    write("embeddings", Some("vec_id"))
    write("events", Some("event_id"))
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(write(_, None))
    java.nio.file.Files.writeString(done, stamp)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_probe10x")
    val defaultOps = Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
      "dedup_ngram", "dedup_cluster", "dedup_embed_banded", "sim_search",
      "sim_search_bucketed", "sim_search_ivf", "curation_pipeline",
      "event_funnel", "retention_cohort", "stream_interval_join")
    val ops = if (args.length > 2) args.drop(2).toSeq else defaultOps
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    amplify(spark, base, out)
    val timings = ops.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, out)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-24s $sec%8.2f s")
      name -> sec
    }
    val qs = timings.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"metric":"probe10x","queries":$qs,"base":"$base"}""")
    spark.stop()
  }
}
