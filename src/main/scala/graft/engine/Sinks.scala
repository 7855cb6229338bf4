package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load-side semantics — parity with the reference's three load paths,
  * re-expressed as distributed set operations instead of per-row T-SQL.
  *
  * The reference loads row-at-a-time over JDBC in 1000-row transactions
  * (reference: src/etl/ETLProcess.java:208-282). At 100 TB that model is a
  * non-starter; each sink below is a single distributed plan whose only
  * shuffle is the join/window on the merge key, and whose write goes through
  * Spark's task-commit protocol (all-or-nothing per job vs. the reference's
  * partially-committed batches).
  */
object Sinks {

  /** Plain append — the INSERT path with no existence check. */
  def append(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.unionByName(incoming)

  /** Insert-if-not-exists — parity with `construirInsertConVerificacion`
    * (reference: src/etl/ETLProcess.java:202-206,444-466): each incoming row
    * is inserted only if no destination row matches on ALL mapped columns
    * (whole-row match, not key-based — SURVEY §2.C #6).
    *
    * Distributed form: whole-row left-anti join + union. The reference's
    * sequential per-row check also makes a duplicate row *within* the batch
    * insert only once (the second occurrence sees the first); `dropDuplicates`
    * on incoming reproduces that.
    *
    * Null caveat (documented divergence): T-SQL `col = ?` never matches NULL,
    * so the reference re-inserts null-bearing duplicates; the equi-anti-join
    * matches that (null join keys never match), but `dropDuplicates` is
    * null-safe and would collapse two identical null-bearing incoming rows.
    *
    * Scale: the anti-join shuffles both sides by all columns' hash; with a
    * bounded destination it is broadcastable — Catalyst/AQE decides.
    */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val cols = existing.columns.toSeq
    existing.unionByName(
      incoming.dropDuplicates(cols).join(existing, cols, "left_anti"))
  }

  /** Keyed upsert — parity with the PK path `construirUpsertSQL`
    * (reference: src/etl/ETLProcess.java:198-201,388-427): UPDATE non-key
    * columns on key match, INSERT otherwise. Within a batch later rows win
    * (the per-row loop re-updates), so batch semantics are last-writer-wins
    * per key, ordered by `orderCol` (SURVEY §7.4 determinism note: the
    * reference's "later" is arrival order; a distributed merge needs an
    * explicit ordering column).
    *
    * Scale: one window shuffle on the key to pick each key's last incoming
    * row, one anti-join shuffle to drop overwritten existing rows. Both hash
    * on the same key, so AQE can reuse the exchange.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             orderCol: String): DataFrame = {
    // Deterministic tiebreak: when two incoming rows for the same key tie on
    // orderCol, order by every remaining column so last-writer-wins does not
    // depend on partition/task order (SURVEY §7.4).
    val tiebreak = incoming.columns.toSeq
      .filterNot(c => c == orderCol || keys.contains(c)).map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tiebreak: _*)
    // orderCol may itself be a destination column (e.g. updated_at): drop it
    // only when the destination schema doesn't carry it.
    val dropCols = "__graft_rn" +:
      (if (existing.columns.contains(orderCol)) Nil else Seq(orderCol))
    val lastWriter = incoming
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop(dropCols: _*)
    existing.join(lastWriter, keys, "left_anti")
      .unionByName(lastWriter.select(existing.columns.map(col).toSeq: _*))
  }
}
