package graft.search

import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame

/** S5 `TopkSearch` (reference warp_pipes/search/topk.py:21-87): re-rank
  * the PREVIOUS engine's results — sort desc, truncate to k. Forces
  * `mergePreviousResults = false` (topk.py:32-38), since its output IS the
  * previous results reshaped.
  *
  * Pure per-row array expressions: sorting k entries per row never
  * shuffles.
  */
case class TopkEngine(config0: SearchConfig = SearchConfig()) extends SearchEngine {

  val config: SearchConfig = config0.copy(mergePreviousResults = false)
  override def params = Map("k" -> config.k.toString, "engine" -> "topk")

  // re-ranker: never fills (reference TopkSearch has no corpus)
  protected def fillRange: Option[Long] = None
  override private[search] def mayFill: Boolean = false

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    require(stamped.columns.contains(idxKey),
      s"TopkEngine requires previous results in $idxKey/$scoreKey")
    val entries = SearchResultOps.sortEntries(SearchResultOps.zipEntries(
      qcol(idxKey).cast("array<long>"), qcol(scoreKey).cast("array<double>")))
    stamped
      .withColumn("__new_idx__", SearchResultOps.entriesIdx(entries))
      .withColumn("__new_score__", SearchResultOps.entriesScore(entries))
  }
}
