package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry.queries entry on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * The measured action is a `noop`-format write: it fully evaluates every
  * operator (sorts, projections, all columns materialized) without the
  * metadata shortcuts `count()` would allow, and without writing bytes.
  * A query that throws is reported with `"failed"` status and a -1 timing,
  * and the process exits nonzero — a regression can't hide in a plausible
  * total.
  *
  * Each query is measured best-of-2: one-shot timings on a shared box showed
  * 2–6× run-to-run spread (scheduler/contention noise large enough to hide a
  * real 2× regression or flag a phantom one); the min of two runs tracks the
  * plan's actual cost. Ops with side effects (sink_*) are drop-in rerunnable:
  * they overwrite their own scratch, so run 2 measures the same work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the measured region: touch every table's footer and
    // run one tiny job so the alphabetically-first query doesn't absorb
    // session/codegen/FS-metadata startup costs.
    Tables.names.foreach(n => Tables(spark, sfDir, n).limit(1).count())
    // optional: bench only the named queries (dev use: `runMain graft.Bench q1 q2`)
    val wanted = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      // best-of-2: a failure on either run fails the query
      val best = if (first < 0) first else { val second = once(); if (second < 0) second else math.min(first, second) }
      (name, best, best >= 0)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // Line order matters: the capture downstream keeps the TAIL of this
    // process's output, so the recoverable total must be the LAST line —
    // the per-query detail line (~4k chars at 140 ops) goes first and may
    // lose its head to truncation, while the closing line stays well under
    // the capture window (it carries only the 10 slowest queries, the ones
    // a regression hunt needs). Metric names are distinct ("per_query" vs
    // "total") so a line scanner matching metric=="total" finds exactly one.
    val slowest = results.filter(_._3).sortBy(-_._2).take(10)
      .map { case (k, v, _) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Per-op budget gate: a plan regression (lost pushdown, new shuffle,
    // broadcast turned sort-merge) should fail the BUILDER's bench run, not
    // wait for a round-over-round judge diff. Ceilings live in BenchBudget
    // (3× an idle-box measurement at sf0.1 — wide enough for scheduler
    // noise, tight enough that a genuinely tripled op trips it). Only
    // meaningful at the calibrated scale: enforced when benching sf0.1.
    val calibratedScale = sfDir.endsWith("sf0.1")
    val overBudget =
      if (!calibratedScale) Nil
      else results.filter(_._3).flatMap { case (k, v, _) =>
        BenchBudget.ceilings.get(k).filter(v > _).map(c => (k, v, c))
      }
    overBudget.foreach { case (k, v, c) =>
      System.err.println(f"[bench] $k OVER BUDGET: $v%.2f s > ceiling $c%.2f s")
    }
    val overJson = overBudget.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val perQueryLine =
      s"""{"metric":"per_query","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(perQueryLine)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.length},"queries":$slowest,"failed":$failedJson,"over_budget":$overJson,"sf":"$sfDir"}""")
    // The driver's artifact capture truncates the per-query line (tail-capped),
    // so round-over-round per-query diffs need the full map ON DISK: when
    // SPARK_GRAFT_BENCH_OUT is set, write it there (builder checks in
    // bench/strict_rN.json per round).
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), perQueryLine + "\n")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
    // strict mode (builder runs: SPARK_GRAFT_BUDGET=strict): red on budget
    // violations; the driver's default run keeps exit 0 so its artifact
    // capture isn't disturbed by a slow shared box.
    if (overBudget.nonEmpty && sys.env.get("SPARK_GRAFT_BUDGET").contains("strict"))
      sys.exit(2)
  }
}
