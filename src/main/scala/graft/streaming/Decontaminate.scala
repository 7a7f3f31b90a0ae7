package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decontamination ON THE STREAM — the ingestion-time twin of
  * [[graft.llm.DecontaminatePipe]]: flag each arriving document that
  * shares any word n-gram with a (static) evaluation corpus.
  *
  * The batch pipe's lowering (explode the big side's n-grams → semi-join
  * → distinct doc ids → join back) needs AGGREGATION STATE on a stream.
  * The stateless form used here collects the eval corpus's distinct
  * n-grams ONCE (they are small by the operation's own premise — the
  * batch pipe broadcasts them) and flags per row with a single
  * `arrays_overlap` against the literal set: map-only, codegen'd, zero
  * streaming state — every micro-batch is a pure pass. Semantics are
  * identical to the batch pipe's flag mode (same tokenizer, same n-gram
  * windows).
  *
  * `maxEvalNgrams` bounds the literal (a plan carrying millions of
  * strings is a driver/codegen hazard, not a data-plane one); past the
  * cap, decontaminate in batch where the relational form applies.
  */
object StreamingDecontaminate {
  def apply(
      df: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      ngramSize: Int = 3,
      flagCol: String = "contaminated",
      maxEvalNgrams: Int = 2000000): DataFrame = {
    val ngrams: Column => Column = text =>
      graft.llm.CurationOps.wordNgrams(
        graft.llm.TextAnalysisOps.toks(text), ngramSize)
    val evalNg = evalDf.select(explode(ngrams(col(textCol))).as("__ng__"))
      .distinct().limit(maxEvalNgrams + 1)
      .collect().map(_.getString(0)).toSeq
    require(evalNg.size <= maxEvalNgrams,
      s"eval corpus has more than $maxEvalNgrams distinct $ngramSize-grams; " +
        "use the batch DecontaminatePipe (relational semi-join) instead")
    // spread the interpreted per-row n-gram HOF work across cores — on
    // the stream source's single file split it serializes (the recurring
    // widen hazard; measured 31.8 -> 3.9 s at sf1, 3.8 -> 1.9 s at sf0.1)
    val wide = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // coalesce: null text yields a null token array and a null overlap —
    // the batch pipe flags such rows false (nothing exploded, no hit).
    // Doc n-grams ride on the LEFT of arrays_overlap: Spark builds its
    // probe set from the smaller side, ~100 doc n-grams vs the eval set.
    wide.withColumn(flagCol,
      coalesce(arrays_overlap(ngrams(col(textCol)), typedLit(evalNg)),
        lit(false)))
  }
}
