package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** The Gopher rule battery as named column expressions — shared by
  * [[GopherQualityPipe]] (which stages the token/line arrays as real
  * columns) and the `graft_gopher_keep` SQL function (which inlines
  * them: each HOF evaluates its array child once per row, so the inline
  * form is a bounded constant-factor cost, not the per-element
  * re-evaluation hazard the staging guards against).
  */
object GopherQualityOps {

  /** Integer counts + per-rule booleans + `gopher_keep`, in emission
    * order, over explicit text/token/line columns. Every rule is an
    * INTEGER comparison (e.g. mean word length in [3,10] ⇔ 3·n_words ≤
    * sum_word_len ≤ 10·n_words) — no double arithmetic for an external
    * oracle to diverge on at any scale.
    */
  def battery(text: Column, toks: Column, lines: Column): Seq[(String, Column)] = {
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^[-*•]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("long")
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val symbols =
      (length(text) - length(replace(text, lit("#"), lit("")))).cast("long") +
        ((length(text) - length(replace(text, lit("..."), lit("")))) / 3).cast("long") +
        (length(text) - length(replace(text, lit("…"), lit("")))).cast("long")
    val enStop = TextAnalysisOps.stopwords.head._2
    val distinctStops =
      size(array_distinct(filter(toks, t => t.isin(enStop.map(lit): _*))))
        .cast("long")

    val rWordCount = nWords >= 50L && nWords <= 100000L
    val rMeanLen = sumLen >= nWords * 3L && sumLen <= nWords * 10L
    val rSymbol = symbols * 10L <= nWords
    val rBullet = bulletLines * 10L <= nLines * 9L
    val rEllipsis = ellipsisLines * 10L <= nLines * 3L
    val rAlpha = alphaWords * 5L >= nWords * 4L
    val rStop = distinctStops >= 2L

    Seq(
      "n_words" -> nWords,
      "sum_word_len" -> sumLen,
      "n_lines" -> nLines,
      "bullet_lines" -> bulletLines,
      "ellipsis_lines" -> ellipsisLines,
      "alpha_words" -> alphaWords,
      "symbol_count" -> symbols,
      "distinct_stopwords" -> distinctStops,
      "rule_word_count" -> rWordCount,
      "rule_mean_word_len" -> rMeanLen,
      "rule_symbol_ratio" -> rSymbol,
      "rule_bullet_lines" -> rBullet,
      "rule_ellipsis_lines" -> rEllipsis,
      "rule_alpha_words" -> rAlpha,
      "rule_stopwords" -> rStop,
      "gopher_keep" -> (rWordCount && rMeanLen && rSymbol && rBullet &&
        rEllipsis && rAlpha && rStop))
  }

  /** The whole battery folded to the keep flag as ONE scalar expression
    * — the `graft_gopher_keep` SQL surface, sharing this kernel with the
    * pipe so both front ends emit identical values.
    */
  def keep(text0: Column): Column = {
    val text = coalesce(text0, lit(""))
    battery(text, TextAnalysisOps.toks(text), split(text, "\n")).last._2
  }
}

/** Gopher-style document quality rules (Rae et al., arXiv:2112.11446
  * §A1.1): the published heuristic filter battery — word-count bounds,
  * mean-word-length bounds, symbol-to-word ratio, bullet-/ellipsis-line
  * ratios, alphabetic-word share, and a minimum of distinct function
  * words. Complements [[RepetitionStatsPipe]] (the same paper's
  * repetition signals) with the structural/lexical half of the filter.
  *
  * Emits per-document integer counts, one boolean per rule, and
  * `gopher_keep` = AND of all rules — a FLAG, not a filter, so
  * drop/quarantine/audit stays the caller's policy (same contract as
  * dedup keep-best). Map-only: pure per-row Column expressions, zero
  * shuffle — at 100 TB this is one linear pass over input splits.
  *
  * Thresholds are the paper's: 50 ≤ words ≤ 100k, mean word length in
  * [3,10], symbol('#'/'...'/'…')-to-word ratio ≤ 0.1, ≤ 90% of lines
  * bullet-started, ≤ 30% of lines ellipsis-ended, ≥ 80% of words with an
  * alphabetic character, ≥ 2 distinct stopwords (the en function-word
  * list shared with [[graft.llm.QualityScorePipe]]).
  */
case class GopherQualityPipe(textCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = coalesce(qcol(textCol), lit(""))
    // Stage the token/line arrays as real columns so CollapseProject
    // cannot inline the producing split() into every per-element lambda
    // (the RepetitionStatsPipe HOF-inline lesson).
    // no widen: flag-only rule battery, map-only contract (the spec pins
    // an Exchange-free plan) — the round-robin exchange of full document
    // text costs more than the linear pass it parallelizes (r19 A/B)
    val staged = df
      .withColumn("__gq_toks__", TextAnalysisOps.toks(text))
      .withColumn("__gq_lines__", split(text, "\n"))
    val outs = GopherQualityOps.battery(
      text, col("__gq_toks__"), col("__gq_lines__"))
    finish(staged, outs).drop("__gq_toks__", "__gq_lines__")
  }
}
