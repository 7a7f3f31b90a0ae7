package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Named dataset splits processed per split — the reference's
  * `DatasetDict` handling (warp_pipes/core/pipe.py:153-163: a pipe mapped
  * over a `datasets.DatasetDict` applies independently to every split).
  * A thin wrapper over `Map[String, DataFrame]` (SURVEY §1.1): Spark has
  * no native split concept, and keeping splits as separate frames keeps
  * every per-split plan independently optimizable (no union in the plan
  * until the caller asks for one).
  */
case class DatasetDict(splits: Map[String, DataFrame]) {
  require(splits.nonEmpty, "DatasetDict requires at least one split " +
    "(toDF/names on an empty dict have no meaning)")
  def apply(split: String): DataFrame = splits(split)
  def names: Seq[String] = splits.keys.toSeq.sorted

  /** Apply a pipe to every split (core/pipe.py:158-162). */
  def transform(pipe: Pipe): DatasetDict =
    DatasetDict(splits.map { case (k, df) => k -> pipe(df) })

  /** Split-aware map, for callers that vary by split name. */
  def transformEach(f: (String, DataFrame) => DataFrame): DatasetDict =
    DatasetDict(splits.map { case (k, df) => k -> f(k, df) })

  /** Collapse to one frame with the split name in `splitCol`. Splits are
    * unioned by name in sorted-split order (deterministic).
    */
  def toDF(splitCol: String = "split"): DataFrame =
    names.map(n => splits(n).withColumn(splitCol, lit(n)))
      .reduce(_.unionByName(_))
}

object DatasetDict {
  /** Build from (name -> predicate-filtered frame) pairs. */
  def of(pairs: (String, DataFrame)*): DatasetDict = DatasetDict(pairs.toMap)
}
