package graft.search

import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 `GroupLookupSearch` (reference warp_pipes/search/group_lookup.py:
  * 22-121): map a group id (e.g. a document id) to all member row ids.
  *
  * Build: `corpus.groupBy(groupKey).agg(sort_array(collect_list(idx)))` —
  * the reference's dense `[n_groups, max_members]` torch matrix becomes a
  * ragged lookup frame (no padding materialized; -1/-inf padding is
  * applied per query by resize()).
  * Query: broadcast/shuffle equi-join on the group id; member lists are
  * truncated to k; member scores are 0 (matching group_lookup.py:108-110 —
  * padding gets -inf via resize).
  */
case class GroupLookupEngine(
    corpus: DataFrame,
    groupKey: String,
    config: SearchConfig = SearchConfig(),
    corpusIdxCol: String = "idx",
    stateDir: Option[String] = None,
    corpusFingerprint: String = "") extends SearchEngine {

  override def params = Map("k" -> config.k.toString,
    "groupKey" -> groupKey, "engine" -> "group_lookup")

  private lazy val n: Long = corpus.count()
  protected def fillRange: Option[Long] = Some(n)

  /** (gid, members sorted asc); fingerprint-persisted when `stateDir`. */
  lazy val lookup: DataFrame = {
    def compute = corpus
      .groupBy(qcol(groupKey).as("__gid__"))
      .agg(sort_array(collect_list(col(corpusIdxCol).cast("long"))).as("__members__"))
    stateDir match {
      case Some(dir) =>
        graft.core.CachedStage(corpus.sparkSession, dir,
          buildStateKey(corpusFingerprint, "lookup"))(compute)
      case None => compute
    }
  }

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    val qGroup = qcol(s"${config.queryField}.$groupKey")
    // No broadcast hint: the lookup is O(n_groups x avg members) — corpus-
    // sized — and an explicit hint is honored regardless of size, which
    // would OOM the driver at the 100 TB design point. A plain equi-join
    // lets AQE broadcast small lookups and shuffle large ones.
    val joined = stamped
      .select(col(rowId), qGroup.as("__gid__"))
      .join(lookup, Seq("__gid__"), "left")
      .select(col(rowId),
        slice(coalesce(col("__members__"), array().cast("array<long>")),
          1, config.k).as("__new_idx__"))
      .withColumn("__new_score__",
        org.apache.spark.sql.functions.transform(col("__new_idx__"), _ => lit(0d)))
    stamped.join(joined, Seq(rowId))
  }
}
