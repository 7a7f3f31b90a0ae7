package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Hashed n-gram feature machinery shared by the data-selection operators:
  * every document maps to a bag of unigram + bigram buckets via the repo's
  * engine-reproducible polynomial char fold (same scheme as
  * [[graft.text.TokenizerPipe]] ids and [[FingerprintPipe]]), so an
  * external engine replays features bit-for-bit.
  */
object FeatureHashOps {

  /** Per-token content hash: fold (h*31 + codepoint) % 1000003, seed 7. */
  def tokHash(t: Column): Column =
    aggregate(filter(split(t, ""), c => length(c) > 0), lit(7L),
      (h, c) => pmod(h * 31 + ascii(c).cast("long"), lit(1000003L)))

  /** Stage the token-hash array of `textCol` as a kept column named `as`.
    * Staging matters: the downstream unigram/bigram builders reference the
    * array several times, and an inlined producing expression re-runs the
    * char fold per reference (the HOF-inline hazard, SURVEY §6).
    */
  def stageTokenHashes(df: DataFrame, textCol: String, as: String): DataFrame =
    df.withColumn(as,
      arrTransform(TextAnalysisOps.toks(coalesce(qcol(textCol), lit(""))),
        tokHash(_)))

  /** Unigram + bigram buckets of a staged token-hash array column:
    * unigram bucket = h % B; bigram bucket = (h_i*131 + h_{i+1}) % 1000003
    * % B. One array of size 2n-1 per doc, pure codegen-able arithmetic.
    */
  def featureBuckets(th: Column, numBuckets: Int): Column = {
    val b = lit(numBuckets.toLong)
    val uni = arrTransform(th, h => pmod(h, b))
    val bi = when(size(th) >= 2,
      arrTransform(sequence(lit(0), size(th) - 2), i =>
        pmod(pmod(element_at(th, (i + 1).cast("int")) * 131 +
          element_at(th, (i + 2).cast("int")), lit(1000003L)), b)))
      .otherwise(array().cast("array<bigint>"))
    concat(uni, bi)
  }
}

/** DSIR-style importance weighting for data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score each raw document by the log importance
  * weight of its hashed n-gram features under a TARGET corpus
  * distribution versus the RAW corpus distribution,
  * `sum_f log p_target(f) - log p_raw(f)` with add-one smoothing over
  * `numBuckets` hashed buckets. High scores read as "looks like the
  * target domain"; selection (top-k or Gumbel resampling) is the
  * caller's filter on the emitted column.
  *
  * Scale shape: both distributions are bucket-count aggregates (at most
  * `numBuckets` rows each — bounded by the hash space, not the corpus),
  * joined into ONE weight table that is BROADCAST; the 100 TB raw side
  * is then explode + broadcast-probe + per-doc re-aggregate on the id —
  * it never shuffles on the feature. Per-feature weights are fixed-point
  * (x1e4) longs, so document scores are exact integer sums — bit-identical
  * on any partitioning and replayable in any engine.
  */
case class ImportanceWeightPipe(
    textCol: String,
    idCol: String,
    targetDf: DataFrame,
    targetTextCol: String,
    numBuckets: Int = 4096,
    outputCol: String = "dsir_logweight",
    broadcastTable: Boolean = true) extends Pipe {
  require(numBuckets > 0, "numBuckets must be positive")
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "id" -> idCol,
    "targetText" -> targetTextCol, "buckets" -> numBuckets.toString,
    "out" -> outputCol, "broadcastTable" -> broadcastTable.toString)

  /** (id?, bucket) feature rows of one corpus side. */
  private def featRows(src: DataFrame, textC: String, id: Option[String]) = {
    val keep = id.map(c => qcol(c).cast("long").as("__iw_id__")).toSeq
    val staged = FeatureHashOps.stageTokenHashes(
      src.select(keep :+ qcol(textC).as("__iw_t__"): _*), "__iw_t__", "__iw_th__")
    staged.select(keep.map(_ => col("__iw_id__")) :+
      explode(FeatureHashOps.featureBuckets(col("__iw_th__"), numBuckets))
        .as("__iw_b__"): _*)
  }

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // widen the corpus side: the char-fold feature HOFs are interpreted
    // and otherwise run on the input's (possibly single) scan tasks
    val wide = Pipe.widen(df)
    val raw = featRows(wide, textCol, Some(idCol))
    val tgt = featRows(targetDf, targetTextCol, None)
    val rawCnt = raw.groupBy("__iw_b__").agg(count(lit(1)).as("__iw_rc__"))
    val tgtCnt = tgt.groupBy("__iw_b__").agg(count(lit(1)).as("__iw_tc__"))
    val rawTot = raw.agg(count(lit(1)).as("__iw_rn__"))
    val tgtTot = tgt.agg(count(lit(1)).as("__iw_tn__"))
    // every bucket a raw doc probes is present in rawCnt by construction,
    // so a left join covers the probe side; absent target buckets smooth
    // to (0+1)/(Tt+B)
    val table = rawCnt.join(tgtCnt, Seq("__iw_b__"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("__iw_b__"),
        round((log((coalesce(col("__iw_tc__"), lit(0L)) + 1).cast("double") /
            (col("__iw_tn__") + numBuckets).cast("double")) -
          log((col("__iw_rc__") + 1).cast("double") /
            (col("__iw_rn__") + numBuckets).cast("double"))) * 10000)
          .cast("long").as("__iw_w__"))
    val probe = if (broadcastTable) broadcast(table) else table
    val scored = raw.join(probe, Seq("__iw_b__"))
      .groupBy("__iw_id__")
      .agg(round(sum("__iw_w__") / 10000d, 4).as("__iw_s__"))
    wide.join(scored, qcol(idCol).cast("long") === col("__iw_id__"), "left")
      .withColumn(outputCol, coalesce(col("__iw_s__"), lit(0d)))
      .drop("__iw_id__", "__iw_s__")
  }
}

/** fastText-style hashed linear quality classifier (Joulin et al.,
  * arXiv:1607.01759 — the quality-filter architecture of the GPT-3/CCNet
  * lineage): logit = bias + sum over hashed unigram+bigram features of a
  * weight-vector entry. The caller supplies trained `weights` (e.g. from
  * any logistic-regression fit over [[FeatureHashOps.featureBuckets]]
  * features); [[HashedLinearScorerPipe.formulaWeights]] provides a
  * deterministic stand-in for gates/tests.
  *
  * Entirely map-only: the weight vector rides along as one array literal
  * (a broadcast variable in spirit), features never leave their row, no
  * shuffle at all — the 100 TB shape for model-based scoring. Weights are
  * quantized to fixed-point x1e4 on construction, so logits are exact
  * integer sums (bit-identical on any layout and replayable externally);
  * `keepCol` is the logit's sign.
  */
case class HashedLinearScorerPipe(
    textCol: String,
    weights: Seq[Double],
    bias: Double = 0.0,
    outputCol: String = "quality_logit",
    keepCol: String = "quality_keep") extends Pipe {
  require(weights.nonEmpty, "weights must not be empty")
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "bias" -> bias.toString,
    "out" -> outputCol, "keep" -> keepCol,
    "weightsFp" -> graft.core.Fingerprint.hash(
      weights.map(w => math.round(w * 10000)).mkString(",")))

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val wfp = typedLit(weights.map(w => math.round(w * 10000)))
    // widen: the char-fold + weight-lookup HOFs are interpreted
    val staged =
      FeatureHashOps.stageTokenHashes(Pipe.widen(df), textCol, "__hl_th__")
      .withColumn("__hl_f__",
        FeatureHashOps.featureBuckets(col("__hl_th__"), weights.size))
    val fp = aggregate(col("__hl_f__"), lit(math.round(bias * 10000)),
      (acc, b) => acc + element_at(wfp, (b + 1).cast("int")))
    val outs: Seq[(String, Column)] = Seq(
      outputCol -> round(fp / 10000d, 4),
      keepCol -> (fp > 0))
    finish(staged, outs).drop("__hl_th__", "__hl_f__")
  }
}

object HashedLinearScorerPipe {
  /** Deterministic integer-formula weights for gates and specs:
    * w(b) = (((b*13 + 5) mod 21) - 10) / 10 — replayable in any engine.
    */
  def formulaWeights(numBuckets: Int): Seq[Double] =
    Seq.tabulate(numBuckets)(b => (((b * 13 + 5) % 21) - 10) / 10.0)

  /** Train naive-Bayes log-odds weights over the hashed feature space:
    * w(b) = log P(b|pos) - log P(b|neg) with add-`smoothing` estimates,
    * bias = log(nPos/nNeg). Equivalent to a generatively-trained linear
    * classifier on the same features (the fastText-recipe starting
    * point); entirely two bucket-count aggregates — at most `numBuckets`
    * rows ever reach the driver, so training scales with the hash space,
    * not the corpus.
    */
  def trainLogOdds(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numBuckets: Int,
      smoothing: Double = 1.0): (Seq[Double], Double) = {
    val staged = FeatureHashOps.stageTokenHashes(
      df.select(qcol(labelCol).cast("boolean").as("__tr_y__"),
        qcol(textCol).as("__tr_t__")), "__tr_t__", "__tr_th__")
    val feats = staged.select(col("__tr_y__"),
      explode(FeatureHashOps.featureBuckets(col("__tr_th__"), numBuckets))
        .as("__tr_b__"))
    val counts = feats.groupBy("__tr_b__").agg(
      sum(when(col("__tr_y__"), 1L).otherwise(0L)).as("p"),
      sum(when(col("__tr_y__"), 0L).otherwise(1L)).as("n"))
      .collect().map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (posTot, negTot) = counts.values.foldLeft((0L, 0L)) {
      case ((p, n), (dp, dn)) => (p + dp, n + dn)
    }
    val denomP = posTot + smoothing * numBuckets
    val denomN = negTot + smoothing * numBuckets
    val weights = Seq.tabulate(numBuckets) { b =>
      val (p, n) = counts.getOrElse(b, (0L, 0L))
      math.log((p + smoothing) / denomP) - math.log((n + smoothing) / denomN)
    }
    val rows = df.agg(
      // coalesce: sum(...) is NULL on an empty frame — the bare getLong
      // threw NullPointerException there (ADVICE r6)
      coalesce(sum(when(qcol(labelCol).cast("boolean"), 1L).otherwise(0L)),
        lit(0L)),
      count(lit(1))).head()
    val nPos = rows.getLong(0).toDouble
    val nNeg = rows.getLong(1) - nPos
    (weights, math.log((nPos + smoothing) / (nNeg + smoothing)))
  }
}
