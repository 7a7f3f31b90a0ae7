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
      requireUniqueKeys: Boolean = true,
      /** Additive schema evolution: when true, the change set may carry
        * columns the base lacks — they join the output schema with NULL
        * for every untouched base row (the lakehouse `mergeSchema`
        * contract, evolution by addition only: dropping or retyping a
        * column remains a loud error either way). Default false: an
        * unexpected column is more often a producer bug than evolution.
        */
      allowNewColumns: Boolean = false): DataFrame = {
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
    val newCols = upserts.columns.filterNot(base.columns.contains).toSeq
    if (allowNewColumns)
      require(base.columns.forall(upserts.columns.contains),
        "schema evolution is additive only — the change set must still " +
          s"carry every base column; missing: " +
          s"${base.columns.filterNot(upserts.columns.contains).mkString(",")}")
    else
      require(base.columns.toSet == upserts.columns.toSet,
        "change schema must match base schema (plus the optional delete flag); " +
          s"base=${base.columns.sorted.mkString(",")} " +
          s"changes=${upserts.columns.sorted.mkString(",")}")
    // widen untouched base rows with NULL for each evolved column, typed
    // from the change schema so the union never implicitly casts
    val widened = newCols.foldLeft(base) { (acc, c) =>
      acc.withColumn(c,
        lit(null).cast(upserts.schema(upserts.schema.fieldIndex(c)).dataType))
    }
    val kept = widened.join(
      changes.select(keys.map(col): _*).distinct(), keys, "left_anti")
    kept.unionByName(upserts.select(widened.columns.map(col).toIndexedSeq: _*))
  }
}
