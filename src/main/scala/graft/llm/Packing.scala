package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import graft.pipes.NestingOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing for LLM training: documents are laid
  * end-to-end in `orderCol` order (per `groupCol` stream when given) and
  * cut every `seqLen` tokens. Each doc learns which fixed-size training
  * sequences it lands in:
  *
  *   - `pack_first` / `pack_last` — ids of the first/last sequence the
  *     doc's tokens touch (a doc spans `pack_last - pack_first + 1`
  *     sequences when it crosses chunk boundaries);
  *   - `pack_pos` — the doc's token offset inside `pack_first`.
  *
  * The layout is a pure function of (order, token counts) — no RNG, no
  * partitioning dependence — so the SAME packing comes out on any cluster
  * size or retry, which makes training-data shuffles reproducible.
  *
  * Scale shape: with `groupCol` the prefix sum is a per-group window (one
  * shuffle on the group key, groups process in parallel); without it the
  * global prefix sum uses the range-partition + broadcast-offset design
  * ([[NestingOps.withGlobalPrefixSum]]) — never a single-partition window.
  */
case class PackSequencesPipe(
    tokenCountCol: String,
    seqLen: Int,
    orderCol: String,
    groupCol: Option[String] = None) extends Pipe {
  require(seqLen > 0, "seqLen must be positive")
  override def update: Boolean = true
  override def params = Map("tokens" -> tokenCountCol,
    "seqLen" -> seqLen.toString, "order" -> orderCol,
    "group" -> groupCol.getOrElse(""))

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val prev = "__pk_prev__"
    val cnt = coalesce(qcol(tokenCountCol).cast("long"), lit(0L))
    val staged = groupCol match {
      case Some(g) =>
        df.withColumn(prev,
          sum(cnt).over(Window.partitionBy(qcol(g)).orderBy(qcol(orderCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - cnt)
      case None =>
        NestingOps.withGlobalPrefixSum(
          df.withColumn("__pk_cnt__", cnt), orderCol, "__pk_cnt__", prev)
          .drop("__pk_cnt__")
    }
    val slen = lit(seqLen.toLong)
    val p = col(prev)
    // exact integer floor-div: (x - x mod s) / s keeps the double divide
    // on an exactly-divisible numerator (a bare x/s cast could misround
    // near chunk boundaries at huge global offsets)
    def fdiv(x: Column): Column = ((x - pmod(x, slen)) / slen).cast("long")
    val outs: Seq[(String, Column)] = Seq(
      "pack_first" -> fdiv(p),
      "pack_last" -> when(cnt > 0, fdiv(p + cnt - 1)).otherwise(fdiv(p)),
      "pack_pos" -> pmod(p, slen))
    finish(staged, outs).drop(prev)
  }
}
