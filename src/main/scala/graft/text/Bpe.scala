package graft.text

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Byte-pair-encoding subword tokenization (Sennrich et al.,
  * arXiv:1508.07909) — the subword layer the reference delegates to
  * HuggingFace fast tokenizers (warp_pipes/pipes/tokenizer.py:13-55).
  *
  * Semantics pinned for determinism: merges apply IN LIST ORDER, each as
  * ONE left-to-right greedy pass over the word's symbols ("aaa" with
  * merge (a,a) -> ["aa","a"]). This matches the classic merge-table
  * semantics for non-overlapping pairs and is deterministic everywhere;
  * HF's repeated highest-priority-anywhere application can differ on
  * pathological self-overlapping repeats — documented divergence, covered
  * by the differential spec against an independent scalar Scala oracle
  * (no SQL engine can replay an iterative fold, so this surface is
  * spec-verified rather than gate-verified, like D1/D2/U4).
  *
  * Everything is Column-expression work (nested aggregate folds — no UDF,
  * no serialization boundary): encode is map-only and shuffle-free; learn
  * is a driver loop of `numMerges` rounds, each one map-side-combined
  * pair-count aggregate over a localCheckpoint-ed symbol frame (state
  * rows are symbol arrays — corpus-sized, never collected; only the
  * numBuckets-ish pair-count table tops reach the driver, 1 row/round).
  */
object BpeOps {

  /** Characters of one token as an array<string> column. */
  def chars(t: Column): Column = filter(split(t, ""), c => length(c) > 0)

  /** One left-to-right greedy pass applying merge (a, b) -> a+b over a
    * symbol array. `a`/`b` are plan-time literals (the merge table is a
    * constructor param), so the whole pass folds into one aggregate.
    */
  def applyMerge(sym: Column, a: String, b: String): Column = {
    val zero = struct(array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("prev"))
    def flush(st: Column) =
      when(st.getField("prev").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("prev"))))
    aggregate(sym, zero,
      (st, s) =>
        when(st.getField("prev") === lit(a) && s === lit(b),
          struct(st.getField("acc").as("acc"), lit(a + b).as("prev")))
          .otherwise(struct(flush(st).as("acc"), s.as("prev"))),
      st => flush(st))
  }

  /** Encode one word: chars, then the merge table in order. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(chars(word)) { case (sym, (a, b)) => applyMerge(sym, a, b) }

  /** Whitespace words of a text column (empty-safe). */
  def words(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), t => length(t) > 0)

  /** Adjacent symbol pairs of an array as (a, b) structs. */
  private def pairs(sym: Column): Column =
    when(size(sym) >= 2,
      arrTransform(sequence(lit(0), size(sym) - 2), i =>
        struct(element_at(sym, (i + 1).cast("int")).as("a"),
          element_at(sym, (i + 2).cast("int")).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Learn a merge table from a corpus: `numMerges` rounds of "count all
    * adjacent symbol pairs, merge the most frequent" (ties broken by
    * (a, b) ascending for determinism). Stops early when no pair reaches
    * `minCount`. Each round is one distributed aggregate + one map pass;
    * the symbol state is localCheckpoint-ed so plans stay linear.
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2): Seq[(String, String)] = {
    var sym = Pipe.widen(df.select(qcol(textCol).as("__bp_t__")))
      .select(explode(words(col("__bp_t__"))).as("__bp_w__"))
      .select(chars(col("__bp_w__")).as("sym"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && learned.size < numMerges) {
      val top = sym.select(explode(pairs(col("sym"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((a, b))
        sym = sym.select(applyMerge(col("sym"), a, b).as("sym"))
          .localCheckpoint(true)
      }
    }
    learned.toSeq
  }
}

/** Apply a learned (or supplied) BPE merge table to a text column:
  * emits the subword array and its length. Map-only, zero shuffle —
  * the merge table rides in the plan as literals, so at 100 TB this is a
  * pure per-split pass like every other text kernel here.
  */
case class BpeEncodePipe(
    textCol: String,
    merges: Seq[(String, String)],
    outputCol: String = "bpe_tokens",
    countCol: String = "n_bpe_tokens") extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol,
    "merges" -> merges.map { case (a, b) => s"$a+$b" }.mkString("|"),
    "out" -> outputCol, "count" -> countCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // the whole-text native kernel ([[org.apache.spark.sql.graft
    // .BpeEncodeExpr]]): same automaton as BpeOps.encodeWord, but a
    // compiled loop inside whole-stage codegen with a per-thread
    // word-memo — r13 re-lowering of the interpreted |merges|-deep HOF
    // pyramid (3.4 -> ~0.4 s on the sf0.1 gate, bit-identical output,
    // differential spec + DuckDB gate unchanged)
    val subwords = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.BpeEncodeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(qcol(textCol), lit(""))),
        merges))
    // widen: per-row kernel work — on a small file's 1-2 input splits it
    // serializes (the bench measured 13 s at sf0.1 on 2 tasks with the
    // HOF form); spread across cores first.
    // stage the subword array once; size() referencing a staged column
    // cannot re-trigger the encode (the HOF-inline hazard)
    val staged = Pipe.widen(df).withColumn("__bp_sub__", subwords)
    finish(staged, Seq(
      outputCol -> col("__bp_sub__"),
      countCol -> size(col("__bp_sub__")).cast("int")))
      .drop("__bp_sub__")
  }
}

object BpeEncodePipe {
  /** Encode with a FROZEN public tokenizer: load a merges.txt (priority =
    * line order) via [[PretrainedVocab.loadMerges]] instead of re-learning
    * — the import path for applying a published tokenizer's merge table.
    */
  def fromPretrained(
      spark: org.apache.spark.sql.SparkSession,
      textCol: String,
      mergesPath: String,
      outputCol: String = "bpe_tokens",
      countCol: String = "n_bpe_tokens"): BpeEncodePipe =
    BpeEncodePipe(textCol, PretrainedVocab.loadMerges(spark, mergesPath),
      outputCol, countCol)
}
