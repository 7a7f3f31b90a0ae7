package graft.operators

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group by a score column — "best 3 docs per source",
  * "latest 5 events per user". A per-group window with an explicit
  * tie-break column, so results are deterministic even on score ties.
  *
  * Scale shape: one shuffle on the group key; groups rank in parallel and
  * the rank filter is pushed into the window operator (no full-group
  * materialization beyond the sort). Skewed groups split under AQE. The
  * output keeps an optional `rankCol` (1-based) for downstream use.
  *
  * `saltBuckets > 1` turns on a two-phase plan for FEW-HUGE-GROUPS
  * inputs (e.g. billions of rows in 8 clusters), where a single
  * per-group sort cannot parallelize: phase 1 ranks within
  * (group, hash-salt) — `saltBuckets`-way parallel, each task sorting
  * |group|/saltBuckets rows — and keeps top-k per bucket, a SUPERSET of
  * the answer under ANY salt assignment; phase 2 ranks the
  * <= saltBuckets*k survivors per group. The result is exactly the
  * single-phase answer (same ties, same ranks), independent of the salt.
  */
case class GroupTopKPipe(
    groupCols: Seq[String],
    scoreCol: String,
    k: Int,
    tieBreakCol: String,
    descending: Boolean = true,
    rankCol: Option[String] = Some("rank"),
    saltBuckets: Int = 1) extends Pipe {
  require(groupCols.nonEmpty, "GroupTopKPipe needs at least one group column")
  require(k > 0, "k must be positive")
  require(saltBuckets >= 1, "saltBuckets must be >= 1")
  override def params = Map("group" -> groupCols.mkString(","),
    "score" -> scoreCol, "k" -> k.toString, "tie" -> tieBreakCol,
    "desc" -> descending.toString, "rank" -> rankCol.getOrElse(""),
    "salt" -> saltBuckets.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val ord = if (descending) qcol(scoreCol).desc else qcol(scoreCol).asc
    val pruned =
      if (saltBuckets <= 1) df
      else {
        val w1 = Window.partitionBy(
          groupCols.map(qcol) :+ pmod(hash(qcol(tieBreakCol)), lit(saltBuckets)): _*)
          .orderBy(ord, qcol(tieBreakCol))
        df.withColumn("__gtk_p1__", row_number().over(w1))
          .filter(col("__gtk_p1__") <= k).drop("__gtk_p1__")
      }
    val w = Window.partitionBy(groupCols.map(qcol): _*)
      .orderBy(ord, qcol(tieBreakCol))
    val ranked = pruned.withColumn("__gtk_r__", row_number().over(w))
      .filter(col("__gtk_r__") <= k)
    rankCol match {
      case Some(r) => ranked.withColumnRenamed("__gtk_r__", r)
      case None => ranked.drop("__gtk_r__")
    }
  }
}
