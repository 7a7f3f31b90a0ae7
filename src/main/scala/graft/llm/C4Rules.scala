package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rules as named column expressions — shared by
  * [[C4CleanPipe]] (which stages the line array as a real column) and
  * the `graft_c4_clean` SQL function (which folds the line filter to the
  * cleaned text as one scalar).
  */
object C4CleanOps {

  /** A line survives iff (after right-trimming spaces/tabs) it ends in a
    * terminal punctuation mark (`.` `!` `?` `"` `”`), carries at least
    * five whitespace-separated words, and does not mention "javascript"
    * in any case — the published line-level battery. Regex class only,
    * no lookaround, so Java regex and RE2 agree character for character.
    */
  def lineKeep(l: Column): Column = {
    val r = rtrim(l, " \t")
    val words = size(split(trim(r), "\\s+"))
    r.rlike("[.!?\"”]$") && length(trim(r)) > 0 && words >= 5 &&
      !lower(r).contains("javascript")
  }

  /** Counts + per-rule booleans + cleaned text, in emission order, over
    * an explicit text/line-array pair. Sentence counting is defined as
    * the number of maximal `[.!?]+` runs in the CLEANED text — an
    * integer an external oracle reproduces exactly (the paper's nltk
    * sentence tokenizer is not engine-replayable; a punctuation-run
    * count is, and bounds it from below). Page-level flags (lorem ipsum,
    * `{`) are evaluated on the ORIGINAL page, as published.
    */
  def battery(textCol: String, text: Column, lines: Column): Seq[(String, Column)] = {
    val kept = filter(lines, lineKeep _)
    val cleaned = concat_ws("\n", kept)
    val nLines = size(lines).cast("long")
    val keptLines = size(kept).cast("long")
    val nSentences =
      size(regexp_extract_all(cleaned, lit("[.!?]+"), lit(0))).cast("long")
    val flagLorem = lower(text).contains("lorem ipsum")
    val flagBrace = text.contains("{")
    val rSentences = nSentences >= 3L
    Seq(
      textCol -> cleaned,
      "n_lines" -> nLines,
      "kept_lines" -> keptLines,
      "n_sentences" -> nSentences,
      "flag_lorem_ipsum" -> flagLorem,
      "flag_curly_brace" -> flagBrace,
      "rule_min_sentences" -> rSentences,
      "c4_keep" -> (rSentences && !flagLorem && !flagBrace))
  }

  /** Line filter + reassembly folded to ONE scalar expression — the
    * `graft_c4_clean` SQL surface, sharing [[lineKeep]] with the pipe so
    * both front ends emit identical text.
    */
  def clean(text0: Column): Column = {
    val text = coalesce(text0, lit(""))
    concat_ws("\n", filter(split(text, "\n"), lineKeep _))
  }
}

/** C4-style page cleaning (Raffel et al., arXiv:1910.10683 §2.2): the
  * published heuristic battery for web-crawl text — keep only lines that
  * end in terminal punctuation, carry ≥ 5 words, and do not mention
  * "javascript"; flag pages containing "lorem ipsum" or `{`; and require
  * ≥ 3 sentences in what survives. Complements [[GopherQualityPipe]]
  * (Gopher judges a document as-is; C4 REWRITES it line by line first).
  *
  * The text column is rewritten in place to the cleaned page; page-level
  * verdicts are emitted as a FLAG (`c4_keep`), not a filter, so
  * drop/quarantine/audit stays the caller's policy (the dedup keep-best
  * contract). The paper's cross-corpus three-sentence-span dedup is the
  * separate [[SpanDedupPipe]]; its bad-words list ships no lexicon here —
  * pass one to [[UrlFilterPipe]]-style blockers if policy needs it.
  *
  * Engine reproducibility: every rule is an integer comparison or exact
  * substring/regex-class test — no doubles, no lookaround — so an
  * external oracle matches bit for bit at any scale. Map-only: pure
  * per-row Column expressions, zero shuffle — at 100 TB this is one
  * linear pass over input splits.
  */
case class C4CleanPipe(textCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = coalesce(qcol(textCol), lit(""))
    // Stage the line array as a real column so CollapseProject cannot
    // inline the producing split() into every per-element lambda (the
    // RepetitionStatsPipe HOF-inline lesson).
    // no widen: flag/rewrite rule battery, map-only contract (the spec
    // pins an Exchange-free plan) — shuffling full text costs more than
    // the linear pass it parallelizes (r19 A/B)
    val staged = df.withColumn("__c4_lines__", split(text, "\n"))
    val outs = C4CleanOps.battery(textCol, text, col("__c4_lines__"))
    finish(staged, outs).drop("__c4_lines__")
  }
}
