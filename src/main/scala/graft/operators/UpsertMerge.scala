package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style MERGE (upsert + delete) of a change set into a base table —
  * the incremental-refresh primitive a training-data pipeline needs to
  * re-curate a 100 TB corpus without rewriting it from scratch.
  *
  * Semantics (one change row per key):
  *   - a change row with the delete flag set removes the base row;
  *   - any other change row REPLACES the base row (update) or is appended
  *     (insert) — the SQL `MERGE ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
  *     INSERT` shape, specialised to whole-row replacement.
  *
  * Execution shape: `base ANTI-JOIN changeKeys` + `UNION non-delete
  * changes`. The anti join broadcasts whenever the change set is small —
  * the common CDC case — so the 100 TB base side never shuffles; a huge
  * change set degrades gracefully to one key-partitioned shuffle. This
  * beats the full-outer-join formulation, which shuffles BOTH sides
  * unconditionally (full outer cannot broadcast).
  */
object UpsertMerge {

  def apply(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "UpsertMerge needs at least one key column")
    val upserts = deleteCol.fold(changes)(c => changes.filter(!col(c)).drop(c))
    require(base.columns.toSet == upserts.columns.toSet,
      "change schema must match base schema (plus the optional delete flag); " +
        s"base=${base.columns.sorted.mkString(",")} " +
        s"changes=${upserts.columns.sorted.mkString(",")}")
    val kept = base.join(
      changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
    kept.unionByName(upserts.select(base.columns.map(col).toIndexedSeq: _*))
  }
}
