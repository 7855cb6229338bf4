package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Graft
import graft.engine.Graph

/** Dev-only A/B harness for the connected-components kernels: times
  * pointer-jumping ([[Graph.connectedComponents]]) against alternating
  * big-star/small-star ([[Graph.connectedComponentsStar]]) on the REAL
  * verified minhash pair graph, at the base scale and (if amplified — run
  * `graft.ScaleProbe` first) the 10× adversarial probe scale. The edge
  * list is cached and counted before timing, so only the kernels are
  * measured; each kernel runs twice — read the WARM (second) number.
  *
  * Usage: runMain graft.ops.CcBench [dir ...]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_probe10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kernels: Seq[(String, DataFrame => DataFrame)] = Seq(
      "pointer-jump" -> (Graph.connectedComponents(_)),
      "fixed-rounds" -> (Graph.connectedComponents(_, fixedRounds = true)),
      "star" -> (Graph.connectedComponentsStar(_)))
    dirs.foreach { dir =>
      val pairs = Dedup.minhashPairs(spark, dir)
        .select("id_a", "id_b").cache()
      val nEdges = pairs.count()
      println(s"== $dir: $nEdges verified pairs ==")
      kernels.foreach { case (name, fn) =>
        (1 to 2).foreach { run =>
          val t0 = System.nanoTime()
          val n = fn(pairs).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[ccbench] $name%-14s run$run $sec%8.2f s ($n labels)")
        }
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
