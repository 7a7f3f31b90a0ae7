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
  * cap the pipe DEGRADES instead of failing: a batch frame falls back to
  * the relational semi-join (the batch pipe's shuffled form) in-plan, and
  * a stream is run through [[runOverCapToParquet]] — the same relational
  * flag applied per micro-batch via `foreachBatch`, with the eval n-gram
  * frame computed once and persisted across batches.
  *
  * Above `literalScanNgrams` distinct eval grams (well under the
  * literal cap) the PER-ROW cost of the literal scan becomes the
  * hazard, not the plan size: `arrays_overlap` probes the ~100 doc
  * grams against the FULL eval literal, so every CLEAN row walks
  * |evalNg| string comparisons. The flag then switches to the
  * codegen'd [[org.apache.spark.sql.graft.StringSetCountExpr]] — the
  * eval grams ship ONCE per executor as a hash set (the same bytes the
  * literal embedded in the plan) and EVERY row, clean or dirty, pays
  * O(#docGrams) byte-equality lookups: per-doc cost independent of
  * |evalNg|, flags bit-identical (count > 0 ≡ arrays_overlap under
  * Spark string equality). The full exactness ladder: in-plan literal
  * (small) → shipped set probe (up to the collect cap) →
  * [[bloom]] fixed-size bitmap (ANY eval size, one-sided error) →
  * [[runOverCapToParquet]] relational foreachBatch (any size, exact).
  */
object StreamingDecontaminate {
  /** Distinct-eval-gram count above which the in-plan literal scan
    * switches to the shipped-set probe (both modes). Below it the plain
    * literal is cheap and keeps the plan self-contained; above it the
    * set probe bounds per-row cost.
    */
  val DefaultLiteralScanNgrams: Int = 65536

  def apply(
      df: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      ngramSize: Int = 3,
      flagCol: String = "contaminated",
      maxEvalNgrams: Int = 2000000,
      literalScanNgrams: Int = DefaultLiteralScanNgrams): DataFrame = {
    val ngrams: Column => Column = text =>
      graft.llm.CurationOps.wordNgrams(
        graft.llm.TextAnalysisOps.toks(text), ngramSize)
    val evalNg = evalDf.select(explode(ngrams(col(textCol))).as("__ng__"))
      .distinct().limit(maxEvalNgrams + 1)
      .collect().map(_.getString(0)).toSeq
    if (evalNg.size > maxEvalNgrams) {
      // over the literal cap: degrade to the relational batch shape
      // (identical flags; the n-grams live in a frame, not the plan)
      require(!df.isStreaming,
        s"eval corpus has more than $maxEvalNgrams distinct $ngramSize-grams" +
          " — a stream cannot carry the relational flag in-plan (the" +
          " semi-join's per-doc aggregation needs streaming state);" +
          " use StreamingDecontaminate.bloom (fixed-size bitmap, map-only," +
          " one-sided error) or runOverCapToParquet (exact flags via" +
          " foreachBatch) instead")
      return graft.llm.DecontaminatePipe(evalDf, textCol, idCol, ngramSize,
        flagCol = flagCol, broadcastEval = false)(df)
    }
    // spread the interpreted per-row n-gram HOF work across cores — on
    // the stream source's single file split it serializes (the recurring
    // widen hazard; measured 31.8 -> 3.9 s at sf1, 3.8 -> 1.9 s at sf0.1)
    val wide = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // coalesce: null text yields a null token array and a null overlap —
    // the batch pipe flags such rows false (nothing exploded, no hit).
    // Doc n-grams ride on the LEFT of arrays_overlap: Spark builds its
    // probe set from the smaller side, ~100 doc n-grams vs the eval set.
    val flag =
      if (evalNg.size <= literalScanNgrams)
        coalesce(arrays_overlap(ngrams(col(textCol)), typedLit(evalNg)),
          lit(false))
      else
        // broadcast-set probe: O(#docGrams) per row regardless of
        // |evalNg|; null text → null gram array → null count → false,
        // matching the literal path's coalesce
        coalesce(graft.llm.CurationOps.setCount(df.sparkSession,
          ngrams(col(textCol)), evalNg) > 0, lit(false))
    wide.withColumn(flagCol, flag)
  }

  /** Bloom-bitmap decontamination ON THE STREAM — the streaming twin of
    * [[graft.llm.BloomDecontaminatePipe]] and the preferred over-cap
    * shape: the eval corpus compresses to a FIXED `mBits`-bit bitmap
    * built ONCE before the stream starts (one Spark job over the eval
    * side), and each arriving document probes it with the codegen'd
    * [[org.apache.spark.sql.graft.BloomProbeExpr]] — a pure projection,
    * so it is legal inside any StreamingQuery with ZERO state, no
    * literal-size cap, and no fallback. One-sided error only: every
    * truly contaminated doc is flagged (no false negatives); false
    * positives at ~fill^k — size `mBits` >= ~10x expected distinct eval
    * n-grams. Flags are bit-identical to the batch pipe's on the same
    * data (same bitmap, same hashes).
    *
    * `repartitionStream` spreads the interpreted n-gram HOF work across
    * cores (the single-file-split widen hazard the exact mode also
    * handles); it is a stateless round-robin shuffle, not state.
    */
  def bloom(
      df: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      ngramSize: Int = 3,
      mBits: Int = 1 << 20,
      numHashes: Int = 4,
      flagCol: String = "contaminated",
      repartitionStream: Boolean = true): DataFrame = {
    require(!evalDf.isStreaming,
      "the eval corpus must be a static frame — the bitmap is built once" +
        " before the stream starts")
    val bits = graft.llm.BloomOps.buildBitmap(
      evalDf, textCol, ngramSize, numHashes, mBits)
    val wide =
      if (repartitionStream)
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      else df
    graft.llm.BloomOps.withFlag(
      wide, textCol, ngramSize, numHashes, mBits, bits, flagCol)
  }

  /** The over-cap STREAM fallback: run the stream through `foreachBatch`,
    * applying the batch pipe's relational semi-join per micro-batch and
    * appending the flagged rows to `outDir` as parquet (at ingestion
    * scale that is where a flagged stream lands anyway). The eval n-gram
    * frame is exploded/deduped ONCE and persisted for the query's
    * lifetime — each micro-batch pays only its own explode + shuffled
    * semi-join + flag join-back, never a re-scan of the eval corpus.
    * Flags are identical to [[apply]] (same tokenizer, same windows).
    * Drains the stream to completion and returns the written frame.
    *
    * Scale: zero streaming state (every batch is a self-contained
    * relational job); eval n-grams bound executor memory only through
    * the shuffle, not a broadcast/literal — any eval size that a batch
    * decontamination could handle works here too.
    */
  def runOverCapToParquet(
      df: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      outDir: String,
      ngramSize: Int = 3,
      flagCol: String = "contaminated"): DataFrame = {
    require(df.isStreaming, "runOverCapToParquet is the streaming fallback;" +
      " a batch frame over the cap degrades inside apply() already")
    val spark = df.sparkSession
    // stage the token array before building n-grams (the HOF-inline
    // hazard: the split would otherwise re-evaluate per n-gram)
    def ngramRows(src: DataFrame, extra: Seq[Column]): DataFrame =
      src.withColumn("__dc_tk__",
          graft.llm.TextAnalysisOps.toks(col(textCol)))
        .select(extra :+ explode(graft.llm.CurationOps.wordNgrams(
          col("__dc_tk__"), ngramSize)).as("__ng__"): _*)
    val evalNg = ngramRows(evalDf, Nil).distinct().persist()
    try {
      evalNg.count() // materialize once, before the first batch
      val q = df.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val wide = batch.repartition(
            spark.sparkContext.defaultParallelism)
          val hits = ngramRows(wide, Seq(col(idCol).as("__cid__")))
            .join(evalNg, Seq("__ng__"), "left_semi")
            .select("__cid__").distinct()
          wide.join(hits, col(idCol) === col("__cid__"), "left")
            .withColumn(flagCol, col("__cid__").isNotNull)
            .drop("__cid__")
            .write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(outDir)
    } finally evalNg.unpersist()
  }

  /** Overlap-FRACTION decontamination ON THE STREAM — the stateless twin
    * of [[graft.llm.OverlapFractionPipe]] (the GPT-3/PaLM protocol: flag
    * when ≥ thresholdBp/10000 of a document's distinct n-grams appear in
    * the eval set). The batch pipe's explode → semi-join → per-doc count
    * needs aggregation state on a stream; here the fraction folds to a
    * PURE per-row projection instead: the eval corpus's distinct n-grams
    * collect ONCE into a literal set and each arriving row computes
    * `matched = size(array_intersect(grams, evalSet))` — map-only,
    * codegen'd, ZERO streaming state, flags and counts bit-identical to
    * the batch pipe (same tokenizer, same distinct-gram algebra, same
    * integer threshold arithmetic).
    *
    * Bounded by the same `maxEvalNgrams` collect cap as [[apply]], and
    * above `literalScanNgrams` the per-row intersect (which builds a
    * |evalNg|-entry hash set PER ROW — the measured 1.25 s·core/doc
    * cliff at 1M grams) switches to the shipped-set
    * [[org.apache.spark.sql.graft.StringSetCountExpr]]: the doc's
    * DISTINCT grams hash-probe one per-executor set, O(#docGrams) per
    * row, counts bit-identical (the input array is distinct, so the
    * membership count ≡ size(array_intersect)). Past the cap there is
    * NO exact stateless form (a Bloom membership probe COUNTING matches
    * would inflate `matched` by false positives — one-sided error is
    * sound for a flag, not a count): a batch frame degrades to the
    * relational batch pipe in-plan; a stream fails loudly pointing at
    * running [[graft.llm.OverlapFractionPipe]] per micro-batch via
    * `foreachBatch` (the [[runOverCapToParquet]] shape).
    */
  def fraction(
      df: DataFrame,
      evalDf: DataFrame,
      textCol: String,
      idCol: String,
      ngramSize: Int = 8,
      thresholdBp: Int = 7000,
      flagCol: String = "contaminated",
      maxEvalNgrams: Int = 2000000,
      literalScanNgrams: Int = DefaultLiteralScanNgrams): DataFrame = {
    require(!evalDf.isStreaming,
      "the eval corpus must be a static frame — its n-gram set is " +
        "collected once before the stream starts")
    val grams: Column => Column = text =>
      coalesce(array_distinct(graft.llm.CurationOps.wordNgrams(
        graft.llm.TextAnalysisOps.toks(text), ngramSize)),
        array().cast("array<string>"))
    val evalNg = evalDf.select(explode(grams(col(textCol))).as("__ng__"))
      .distinct().limit(maxEvalNgrams + 1)
      .collect().map(_.getString(0)).toSeq
    if (evalNg.size > maxEvalNgrams) {
      require(!df.isStreaming,
        s"eval corpus has more than $maxEvalNgrams distinct $ngramSize-grams" +
          " — a stream cannot carry the literal set in-plan and a Bloom" +
          " probe would inflate the matched COUNT (one-sided error is" +
          " sound for a flag, not a fraction); run" +
          " graft.llm.OverlapFractionPipe per micro-batch via foreachBatch" +
          " (the runOverCapToParquet shape) instead")
      return graft.llm.OverlapFractionPipe(evalDf, textCol, idCol,
        ngramSize, thresholdBp, flagCol, broadcastEval = false)(df)
    }
    val wide = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      // stage the distinct-gram array once (the HOF-inline hazard: the
      // tokenizer + n-gram lambdas would otherwise re-evaluate per use)
      .withColumn("__of_ng__", grams(col(textCol)))
    // doc grams ride on the LEFT of array_intersect (the smaller side);
    // matched counts DISTINCT grams exactly like the batch pipe because
    // both input arrays are distinct
    val matched =
      if (evalNg.size <= literalScanNgrams)
        size(array_intersect(col("__of_ng__"), typedLit(evalNg))).cast("int")
      else
        // broadcast-set membership count over the (distinct) gram array
        // — O(#docGrams) per row, ≡ size(array_intersect) bit-for-bit
        graft.llm.CurationOps.setCount(df.sparkSession,
          col("__of_ng__"), evalNg)
    val total = size(col("__of_ng__")).cast("int")
    val num = matched.cast("long") * 10000L
    val den = total.cast("long")
    wide
      .withColumn("matched_ngrams", matched)
      .withColumn("total_ngrams", total)
      // exact integer division — see OverlapFractionPipe (Column./ is
      // double division; strip the remainder first)
      .withColumn("overlap_bp",
        when(total > 0, ((num - pmod(num, den)) / den).cast("int"))
          .otherwise(lit(0)))
      .withColumn(flagCol,
        total > 0 && num >= lit(thresholdBp.toLong) * den)
      .drop("__of_ng__")
  }
}
