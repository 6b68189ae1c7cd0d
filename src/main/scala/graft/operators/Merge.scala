package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based CDC merge — MERGE INTO semantics on plain immutable files:
  * apply a change set (upserts + deletes) to a base table and produce the
  * next version of the table. This is how a mutable-table feed (debezium
  * row images, an operational-store export, the reference's Put/Delete
  * stream, db.go:339-341 / db.go:392-425) lands on an analytics store
  * that only knows how to append: rewrite = (base ∖ changed-keys) ∪
  * upserted-rows.
  *
  * Scale shape (100 TB base, GB-scale change batch — the normal CDC
  * ratio):
  *  - the base is NEVER shuffled: the anti-join on the change keys is a
  *    broadcast hash anti-join (`broadcastChanges = true`, the default),
  *    so applying a batch costs one linear scan of the base plus the
  *    union — exactly the cost of rewriting the files, which any merge
  *    must pay. With partition-pruned bases (day partitions), only the
  *    partitions holding changed keys need rewriting.
  *  - a change feed with multiple images per key is compacted first by
  *    [[compactLatest]] — a partial-aggregable argmax (max_by struct),
  *    so a hot key with a million images map-side-combines instead of
  *    funneling one task.
  *  - when the change batch is itself huge (a backfill), pass
  *    `broadcastChanges = false` and both sides shuffle on the key — the
  *    sort-merge path AQE picks for balanced sides.
  */
object Merge {

  /** One change row per key, op ∈ {"upsert", "delete"}: rows of `base`
    * whose key has no change survive; "upsert" rows replace/insert;
    * "delete" keys disappear. `changes` must carry the base columns plus
    * `opCol`. Requires at most one change per key (compact multi-image
    * feeds with [[compactLatest]] first). */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
      broadcastChanges: Boolean = true): DataFrame = {
    val keys = changes.select(key)
    val untouched = base.join(
      if (broadcastChanges) broadcast(keys) else keys, Seq(key), "left_anti")
    untouched.unionByName(
      changes.filter(col(opCol) === "upsert").drop(opCol))
  }

  /** Latest-image-per-key compaction of a multi-image change feed:
    * keep the row with the max `seqCol` per key. Implemented as
    * max_by(struct(all columns), seq) — a partial-aggregable argmax, so
    * the reduction is map-side-combined (no per-key window funnel). */
  def compactLatest(changes: DataFrame, key: String, seqCol: String): DataFrame = {
    val payload = struct(changes.columns.filter(_ != key).map(col): _*)
    changes
      .groupBy(key)
      .agg(max_by(payload, col(seqCol)).as("__img"))
      .select(col(key) +: changes.columns.filter(_ != key)
        .map(c => col(s"__img.$c").as(c)): _*)
  }
}
