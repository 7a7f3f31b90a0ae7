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
case class ProfilePipe(
    cols: Seq[String],
    /** Exact distinct counts plan an Expand ×(cols+1) — one pass, but
      * every input row is re-hashed per profiled column. `exact = false`
      * swaps in HyperLogLog++ (`approx_count_distinct`, default 5% rsd):
      * no Expand, plain partial aggregation, the right trade at 100 TB
      * where a ±5% distinct estimate steers the same curation decision.
      */
    exact: Boolean = true) extends Pipe {
  require(cols.nonEmpty, "ProfilePipe needs at least one column")

  override def params = Map("cols" -> cols.mkString(","), "exact" -> exact.toString)

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    def nn(c: String) = s"__nn_${c}__"
    def nd(c: String) = s"__nd_${c}__"
    def mn(c: String) = s"__mn_${c}__"
    def mx(c: String) = s"__mx_${c}__"
    val aggs: Seq[Column] =
      count(lit(1)).as("__n__") +: cols.flatMap { c =>
        Seq(
          count(Pipe.qcol(c)).as(nn(c)),
          (if (exact) count_distinct(Pipe.qcol(c))
           else approx_count_distinct(Pipe.qcol(c))).as(nd(c)),
          min(Pipe.qcol(c)).cast("string").as(mn(c)),
          max(Pipe.qcol(c)).cast("string").as(mx(c)))
      }
    // widen ahead of the aggregate: the Expand (×(distinct cols + 1))
    // plus hashing/casting is expression-heavy, and a single parquet
    // file plans 1-2 input splits — serializing the whole map side on
    // 1-2 cores (the r8 narrow-scan hazard, re-measured here at 4.9 s →
    // sub-second for a 4-column lineitem profile)
    val one = Pipe.widen(df).agg(aggs.head, aggs.tail: _*)
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

/** Grouped quantiles of a numeric column — the distribution profile
  * behind length/score threshold choices (`p50/p90/p99 tokens per
  * language`, ...).
  *
  * Default is `approx_percentile` (a fixed-size sketch per group,
  * partial-aggregated — bounded memory at any group size, the 100 TB
  * mode). `exact = true` swaps in `percentile`, which buffers every
  * group value in the aggregation state: exact interpolated quantiles,
  * but memory grows with the largest group — use it when groups are
  * known-bounded (it is also the oracle-replayable mode: Spark's linear
  * interpolation matches DuckDB's `quantile_cont` bit-for-bit).
  */
case class GroupQuantilesPipe(
    groupCol: String,
    valueCol: String,
    probs: Seq[Double],
    exact: Boolean = false,
    accuracy: Int = 10000) extends Pipe {
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    "probs must be fractions in [0, 1]")

  override def params = Map("group" -> groupCol, "value" -> valueCol,
    "probs" -> probs.mkString(","), "exact" -> exact.toString,
    "accuracy" -> accuracy.toString)

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val arr = s"array(${probs.mkString(", ")})"
    val agg =
      if (exact) expr(s"percentile(`$valueCol`, $arr)")
      else expr(s"approx_percentile(`$valueCol`, $arr, $accuracy)")
    // approx_percentile preserves the input's integral type; cast for a
    // uniform array<double> contract across both modes
    df.groupBy(Pipe.qcol(groupCol))
      .agg(agg.cast("array<double>").as("quantiles"),
        count(Pipe.qcol(valueCol)).as("n"))
  }
}
