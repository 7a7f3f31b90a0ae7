package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every point row (`pointTs`) with
  * every interval row whose `[start, end]` contains it, optionally
  * per-key — "clicks inside incident windows", "trades during halts",
  * "events within a session span".
  *
  * Spark-first lowering: a naive `ts BETWEEN start AND end` non-equi
  * join is a broadcast-nested-loop or cartesian product — quadratic and
  * un-shardable at scale. Here both sides are BINNED: each interval
  * explodes into the fixed-width bins it covers, each point tags its one
  * bin, and the join becomes an equi-join on (keys, bin) with a cheap
  * residual filter. A point lies in exactly one bin, so every matching
  * (point, interval) pair is produced exactly once — no dedup pass.
  *
  * Pick `binWidth` near the TYPICAL interval span: cost is
  * |intervals| x (span/binWidth + 1) exploded rows vs join-key
  * selectivity; both sides shuffle once on (keys, bin).
  *
  * Timestamps are integer units (e.g. epoch micros) — callers convert;
  * bins use exact floor division, valid for negative values too.
  */
object RangeJoin {

  private def fdiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / w).cast("long")

  /** Inner-join points to containing intervals. Column names of the two
    * sides must be disjoint apart from `keyCols` (standard join-output
    * rule — rename upstream otherwise).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTsCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iv = intervals.withColumn("__rj_bin__",
      explode(sequence(fdiv(col(startCol), binWidth),
        fdiv(col(endCol), binWidth))))
    val pt = points.withColumn("__rj_bin__", fdiv(col(pointTsCol), binWidth))
    pt.join(iv, keyCols :+ "__rj_bin__", "inner")
      .filter(col(pointTsCol) >= col(startCol) &&
        col(pointTsCol) <= col(endCol))
      .drop("__rj_bin__")
  }
}
