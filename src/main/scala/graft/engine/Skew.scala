package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the hand-rolled complements to
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`), for
  * the cases AQE can't fix: skewed AGGREGATION keys (AQE only splits join
  * partitions) and skewed joins below AQE's size thresholds.
  *
  * Salting trades one extra (cheap, combinable) stage for bounded partition
  * sizes: a 10-billion-row hot key becomes `salt` partitions of 10B/salt
  * rows each. The salt column derives from a hash of the whole row — NOT
  * rand() — so retried tasks produce identical salts (deterministic
  * replay, same requirement as every op in this engine).
  */
object Skew {

  /** Two-stage aggregation with salted keys: stage 1 aggregates on
    * (keys, salt) — partial combine bounds any one partition — and stage 2
    * merges the per-salt partials. `aggs` must be algebraic (sum/count/min/
    * max style) so the two stages compose; that's the same contract Spark's
    * own partial aggregation relies on.
    *
    * @param salts number of salt buckets for the hot keys (≥1)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      stage1: Seq[Column], stage2: Seq[Column]): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(stage1.head, stage1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(stage2.head, stage2.tail: _*)
  }

  /** Skewed equi-join: explode the SMALL side `salts`× (one copy per salt),
    * salt the big side deterministically, join on (keys, salt). Each hot
    * key's rows spread over `salts` partitions instead of one. Use when the
    * small side is too big to broadcast but the big side has hot keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // Only types where the exploded small side can't surface unmatched
    // duplicates: a right/full outer join would emit each unmatched
    // small-side row once PER SALT.
    val saltSafe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(saltSafe(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType: the salt-exploded " +
        "small side would duplicate unmatched rows under right/full outer")
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
