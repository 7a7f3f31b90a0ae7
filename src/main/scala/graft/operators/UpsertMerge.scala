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
      deleteCol: Option[String] = None,
      /** SQL MERGE errors when a source row matches twice; two change
        * rows with one key would here silently insert BOTH after the
        * anti-join removes the base row. Checked by default — one cheap
        * aggregate over the (small, broadcastable by assumption) change
        * set. Opt out only when the producer guarantees unique keys.
        */
      requireUniqueKeys: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "UpsertMerge needs at least one key column")
    if (requireUniqueKeys) {
      val dups = changes.groupBy(keys.map(col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      require(dups.isEmpty,
        s"UpsertMerge: change set has multiple rows for key " +
          s"${dups.headOption.map(_.toSeq.init.mkString(",")).getOrElse("")} — " +
          "one change row per key (set requireUniqueKeys=false to skip this check)")
    }
    // null delete flag = NOT a delete: `!col(c)` is null for null input,
    // which would silently drop the row from upserts while its key still
    // anti-joins the base row away — a malformed change row would become a
    // silent delete. coalesce makes null mean "upsert".
    val upserts = deleteCol.fold(changes)(c =>
      changes.filter(!coalesce(col(c), lit(false))).drop(c))
    require(base.columns.toSet == upserts.columns.toSet,
      "change schema must match base schema (plus the optional delete flag); " +
        s"base=${base.columns.sorted.mkString(",")} " +
        s"changes=${upserts.columns.sorted.mkString(",")}")
    val kept = base.join(
      changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
    kept.unionByName(upserts.select(base.columns.map(col).toIndexedSeq: _*))
  }
}
