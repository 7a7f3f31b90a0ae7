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
    // Two single-row aggregates instead of one:
    //   1. counts + distincts — all-LONG buffers, so the multi-distinct
    //      Expand rewrite plans HashAggregate;
    //   2. min/max (string-cast) + null counts — grouping-free fold, no
    //      sort needed even as SortAggregate.
    // Folding min/max into aggregate 1 poisons it: a STRING-typed
    // aggregation buffer is not UnsafeRow-mutable, so the whole Expand
    // aggregate fell back to SortAggregate — THREE full sorts of the
    // ×(cols+1) expanded rows (measured 5.0 s → 1.3 s for the 4-column
    // lineitem profile; plan diff: SortAggregate×3 + Sort×2 →
    // HashAggregate×2, zero Sort below the output ordering). Both
    // aggregates hang off the SAME widened child, so the round-robin
    // exchange is planned once and reused; at production scale (scan
    // already session-wide, widen a no-op) the second pass is one extra
    // column-pruned scan — linear, sort-free, spill-free.
    val distinctAggs: Seq[Column] =
      count(lit(1)).as("__n__") +: cols.map { c =>
        (if (exact) count_distinct(Pipe.qcol(c))
         else approx_count_distinct(Pipe.qcol(c))).as(nd(c))
      }
    val statAggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(Pipe.qcol(c)).as(nn(c)),
        min(Pipe.qcol(c)).cast("string").as(mn(c)),
        max(Pipe.qcol(c)).cast("string").as(mx(c)))
    }
    // No widen: with the SortAggregate fallback gone, the Expand map
    // side is count-hash work a partial HashAggregate handles on the
    // scan's own splits — the r8-era widen predated the split and its
    // round-robin exchange now costs more than it saves (measured
    // 2.21 s widened vs 1.69 s narrow at sf0.1; at production scan
    // widths widen is a no-op either way)
    val one = df.agg(distinctAggs.head, distinctAggs.tail: _*)
      .crossJoin(df.agg(statAggs.head, statAggs.tail: _*))
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

