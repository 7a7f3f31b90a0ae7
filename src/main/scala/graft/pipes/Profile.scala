package graft.pipes

import graft.core.Pipe
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row / null / exact-distinct
  * counts and min/max — the profile a curation run consults before
  * choosing filters and thresholds.
  *
  * All statistics for all columns ride ONE aggregate over the data:
  * multiple `count(DISTINCT col)` aggregates plan a single scan with an
  * Expand (map-side cost × columns, partial-aggregated before the
  * shuffle), never a per-column pass — profiling a 100 TB table costs
  * one read. Min/max are cast to string so heterogeneous column types
  * share a uniform long-format output:
  * `(col_name, n_rows, n_null, n_distinct, min_s, max_s)`.
  */
case class ProfilePipe(cols: Seq[String]) extends Pipe {
  require(cols.nonEmpty, "ProfilePipe needs at least one column")

  override def params = Map("cols" -> cols.mkString(","))

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    def nn(c: String) = s"__nn_${c}__"
    def nd(c: String) = s"__nd_${c}__"
    def mn(c: String) = s"__mn_${c}__"
    def mx(c: String) = s"__mx_${c}__"
    val aggs: Seq[Column] =
      count(lit(1)).as("__n__") +: cols.flatMap { c =>
        Seq(
          count(Pipe.qcol(c)).as(nn(c)),
          count_distinct(Pipe.qcol(c)).as(nd(c)),
          min(Pipe.qcol(c)).cast("string").as(mn(c)),
          max(Pipe.qcol(c)).cast("string").as(mx(c)))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${nn(c)}`, `${nd(c)}`, `${mn(c)}`, `${mx(c)}`").mkString(", ")
    one.select(col("__n__"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, __nonnull__, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("__n__").as("n_rows"),
        (col("__n__") - col("__nonnull__")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
