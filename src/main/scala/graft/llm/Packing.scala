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

/** Materialize the packed sequences themselves — the frame a trainer
  * actually consumes: one row per fixed-size pack with the concatenated
  * token slice `(pack_id, tokens, doc_ids, n_tokens)`. Documents are laid
  * end-to-end in `orderCol` order and cut every `seqLen` tokens, so a
  * pack may span several documents (`doc_ids` carries the per-token
  * provenance a loss-masking/attention-reset collator needs); every pack
  * holds exactly `seqLen` tokens except the final ragged one.
  *
  * Scale shape: per-doc token counts feed the scale-safe global prefix
  * sum ([[NestingOps.withGlobalPrefixSum]] — range partition + broadcast
  * offsets), tokens then explode with exact global positions and shuffle
  * ONCE on the pack id for reassembly. No corpus-wide window, no driver
  * state; pack sizes bound the reassembly groups, so no group skew.
  */
case class PackMaterializePipe(
    tokensCol: String,
    seqLen: Int,
    orderCol: String,
    idCol: String) extends Pipe {
  require(seqLen > 0, "seqLen must be positive")
  override def params = Map("tokens" -> tokensCol,
    "seqLen" -> seqLen.toString, "order" -> orderCol, "id" -> idCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val slim = df.select(qcol(idCol).as("__pm_id__"),
      qcol(orderCol).as("__pm_ord__"), qcol(tokensCol).as("__pm_tk__"))
      .withColumn("__pm_cnt__", size(col("__pm_tk__")).cast("long"))
    val offs = NestingOps.withGlobalPrefixSum(
      slim, "__pm_ord__", "__pm_cnt__", "__pm_off__")
    val exploded = offs.select(col("__pm_id__"), col("__pm_off__"),
      posexplode(col("__pm_tk__")).as(Seq("__pm_p__", "__pm_t__")))
      .withColumn("__pm_g__", col("__pm_off__") + col("__pm_p__"))
    val packed = exploded
      // `div`, not `/`: long/long Column division is DOUBLE arithmetic,
      // inexact past 2^53 — same fix as ShardAssignPipe (ADVICE r6)
      .withColumn("pack_id", expr(s"`__pm_g__` div ${seqLen}L"))
    packed.groupBy("pack_id")
      .agg(
        arrTransform(array_sort(collect_list(
          struct(col("__pm_g__").as("g"), col("__pm_t__").as("t")))),
          x => x.getField("t")).as("tokens"),
        arrTransform(array_sort(collect_list(
          struct(col("__pm_g__").as("g"), col("__pm_id__").as("d")))),
          x => x.getField("d")).as("doc_ids"),
        count(lit(1)).cast("int").as("n_tokens"))
  }

  private def arrTransform(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)
}
