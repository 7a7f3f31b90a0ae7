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
        * anti-join removes the base row. Checked by default — the check
        * is FUSED into the anti-join's key build (a per-key raise_error
        * guard on the distinct-keys aggregate the join needs anyway), so
        * it costs no extra pass over the change set and surfaces when
        * the merged frame is first acted on, Spark-lazily. Opt out only
        * when the producer guarantees unique keys.
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
    // The anti-join needs the distinct change keys either way; with the
    // uniqueness check on, build them as groupBy+count and guard each
    // key with a lazy raise_error — a duplicate key throws the moment
    // the merge is executed, and the check costs zero extra jobs/passes
    // (the former eager collect() scanned and shuffled the change set
    // once more per merge — one full extra delta pass at scale, one
    // extra Spark job per micro-batch in the CDC stream).
    val changeKeys =
      if (requireUniqueKeys) {
        val counted = changes.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("__um_n__"))
        val msg = concat(
          lit("UpsertMerge: change set has multiple rows for key "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*),
          lit(" — one change row per key (set requireUniqueKeys=false " +
            "to skip this check)"))
        counted.select(keys.map { k =>
          val kt = changes.schema(changes.schema.fieldIndex(k)).dataType
          when(col("__um_n__") > 1, raise_error(msg).cast(kt))
            .otherwise(col(k)).as(k)
        }: _*)
      } else changes.select(keys.map(col): _*).distinct()
    val kept = widened.join(changeKeys, keys, "left_anti")
    kept.unionByName(upserts.select(widened.columns.map(col).toIndexedSeq: _*))
  }
}
