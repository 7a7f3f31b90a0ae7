package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Text-analysis operators for training-data curation — language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (codegen, no shuffle, no UDF).
  */
object TextAnalysisOps {

  /** Tiny function-word lists per language; deliberately deterministic and
    * engine-reproducible (a DuckDB oracle can mirror them 1:1).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "es", "en", "que", "por"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est", "en", "que", "pour"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "bu"))

  def toks(text: Column): Column = split(trim(text), "\\s+")

  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))

  /** The default CCNet normalize chain ([[TextNormalizePipe]] with its
    * default toggles) as one scalar expression — shared by the pipe and
    * the `ccnet_normalize` SQL function so both surfaces emit identical
    * values.
    */
  def normalizeCCNet(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      lower(coalesce(text, lit(""))),
      "[0-9]", "0"), "\\p{Punct}", ""), "\\s+", " "))

  /** The bounded composite quality score of [[QualityScorePipe]] as one
    * scalar expression in [0, 1] — shared by the pipe and the
    * `graft_quality` SQL function.
    *
    * Computed as an EXACT fixed-point rational: quality·1e4 is an integer
    * ratio of BIGINT products (each x·1e4 term has denominator nt·nc ≤
    * ~4e6, numerator ≤ ~4e10 < 2^53), rounded half-up via
    * floor((2·num+den)/(2·den)). The earlier `round(double, 4)` form
    * diverged across engines whenever the true value landed on a .00005
    * boundary (Java BigDecimal rounds the shortest-decimal repr of the
    * double, DuckDB rounds its binary value — measured on 3/50k rows at
    * the sf1 audit); the rational form has no double rounding step at
    * all, so it is bit-identical at any scale in any engine.
    */
  def qualityScore(text: Column): Column = {
    val tokens = toks(text)
    val nt = size(tokens).cast("long") // split('') = [''] → always >= 1
    val nc = greatest(length(text).cast("long"), lit(1L))
    val allStop = stopwords.flatMap(_._2).distinct
    val s = stopwordHits(tokens, allStop).cast("long")
    val ld = length(regexp_replace(text, lit("[0-9]"), lit(""))).cast("long")
    val lu = length(regexp_replace(text, lit("[A-Z]"), lit(""))).cast("long")
    // quality·1e4 = 80·min(nt,50) + 4000·min(4s,nt)/nt + 1000·ld/nc
    //             + 1000·lu/nc, over the common denominator nt·nc
    val num = lit(80L) * least(nt, lit(50L)) * nt * nc +
      lit(4000L) * least(s * 4, nt) * nc +
      lit(1000L) * ld * nt + lit(1000L) * lu * nt
    val den = nt * nc
    floor((num * 2 + den) / (den * 2)) / 10000d
  }

  /** The language-ID vote of [[LanguageIdPipe]] as one scalar expression
    * (argmax of per-language stopword hits, first-listed wins ties,
    * 'und' on zero hits) — shared by the pipe and the `graft_langid` SQL
    * function so both surfaces emit identical values.
    */
  def languageId(text: Column): Column = {
    val tokens = toks(text)
    val scores = stopwords.map { case (lang, words) =>
      lang -> stopwordHits(tokens, words)
    }
    val best = greatest(scores.map(_._2): _*)
    // foldRight means earlier-listed langs overwrite later ones on ties
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** The order-sensitive rolling document fingerprint of
    * [[FingerprintPipe]] as one scalar expression (per-token polynomial
    * char fold, then a polynomial fold over token hashes — bounded
    * modular integer arithmetic, engine-reproducible) — shared by the
    * pipe and the `graft_fingerprint` SQL function.
    */
  def fingerprint(text: Column): Column = {
    def tokHash(t: Column): Column =
      aggregate(filter(split(t, ""), c => length(c) > 0), lit(7L),
        (h, c) => pmod(h * 31 + ascii(c).cast("long"), lit(1000003L)))
    aggregate(arrTransform(toks(text), t => tokHash(t)), lit(0L),
      (h, t) => pmod(h * 131 + t, lit(1000000007L)))
  }
}

/** Language ID by function-word voting: predicted = argmax over per-lang
  * stopword hit counts, first-listed language wins ties (fixed order en,
  * de, es, fr, zh; 'und' = no hits at all).
  */
case class LanguageIdPipe(textCol: String, outputCol: String = "lang_pred")
    extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "out" -> outputCol)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    // (widen: the stopword-hit HOFs are interpreted; single-row-group
    // parquet plans one task — no-op at real input split counts)
    finish(Pipe.widen(df),
      Seq(outputCol -> TextAnalysisOps.languageId(qcol(textCol))))
}

/** Quality scoring: structural ratios a curation pipeline filters on.
  * Emits n_tokens, mean_token_len, stopword_ratio, digit_ratio,
  * upper_ratio and a bounded composite quality in [0, 1].
  */
case class QualityScorePipe(textCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = qcol(textCol)
    val tokens = TextAnalysisOps.toks(text)
    val nTok = size(tokens).cast("double")
    val nChars = length(text).cast("double")
    val meanLen = (nChars - (nTok - 1)) / nTok
    val allStop = TextAnalysisOps.stopwords.flatMap(_._2).distinct
    val stopRatio = TextAnalysisOps.stopwordHits(tokens, allStop).cast("double") / nTok
    val digitRatio = (nChars - length(regexp_replace(text, lit("[0-9]"), lit("")))) / nChars
    val upperRatio = (nChars - length(regexp_replace(text, lit("[A-Z]"), lit("")))) / nChars
    // composite: reward moderate length and stopword presence, punish
    // digit/upper noise; clamped to [0,1] — the shared scalar kernel
    // (also SQL-exposed as `graft_quality`)
    val outs = Seq(
      "n_tokens" -> nTok.cast("int"),
      "mean_token_len" -> round(meanLen, 4),
      "stopword_ratio" -> round(stopRatio, 4),
      "digit_ratio" -> round(digitRatio, 4),
      "upper_ratio" -> round(upperRatio, 4),
      "quality" -> TextAnalysisOps.qualityScore(text))
    finish(Pipe.widen(df), outs.map { case (k, c) => k -> (c: Column) })
  }
}

/** Token counting: whitespace tokens, word-ish tokens (letter/digit runs —
  * a BPE-ish lower bound), and the chars/4 BPE estimate used for LLM
  * budget planning.
  */
case class TokenCountPipe(textCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = qcol(textCol)
    val outs = Seq(
      "ws_tokens" -> size(TextAnalysisOps.toks(text)).cast("int"),
      "word_tokens" -> size(filter(split(text, "[^A-Za-z0-9]+"),
        t => length(t) > 0)).cast("int"),
      "est_bpe_tokens" -> ceil(length(text) / 4d).cast("int"))
    finish(Pipe.widen(df), outs.map { case (k, c) => k -> (c: Column) })
  }
}

/** Document fingerprinting: order-sensitive polynomial rolling hash over
  * token-content hashes — engine-reproducible (bounded modular
  * arithmetic, no platform hash), so equal-content docs collide and
  * near-equal docs don't.
  */
case class FingerprintPipe(textCol: String, outputCol: String = "fingerprint")
    extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    // token hash: fold (h*31 + codepoint) % 1000003, seed 7 (same scheme
    // as graft.text.TokenizerPipe ids) — the shared scalar kernel, also
    // SQL-exposed as `graft_fingerprint`. The per-char fold is
    // interpreted HOF work: parallelize past the input's file splits
    // (single-row-group parquet scans one task; at real scale inputs
    // carry >= parallelism splits and this no-ops)
    finish(Pipe.widen(df),
      Seq(outputCol -> TextAnalysisOps.fingerprint(qcol(textCol))))
}

/** CCNet-style text normalization (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", arXiv:1911.00359 —
  * the paper's dedup key is a hash of the NORMALIZED paragraph):
  * lowercase, digits→0, strip punctuation, collapse whitespace. The
  * normalized column is what exact/line dedup should key on, so trivial
  * case/punctuation/number variants of the same content collide.
  *
  * All steps are codegen'd string expressions (lower + three
  * regexp_replace, optionally the native [[graft.functions.FoldAccents]]
  * expression first) — map-only, zero shuffle, linear at any scale.
  * Accent folding is the `foldAccents` toggle (off by default so the
  * base gate stays replayable by engines without an accent-strip
  * function; DuckDB's `strip_accents` matches it when on).
  * Punctuation = the ASCII class `\p{Punct}`, which matches RE2/POSIX
  * `[[:punct:]]` so external engines can replay the exact output.
  */
case class TextNormalizePipe(
    textCol: String,
    outputCol: String = "text_norm",
    lowercase: Boolean = true,
    digitsToZero: Boolean = true,
    stripPunct: Boolean = true,
    collapseWhitespace: Boolean = true,
    /** NFD accent folding via the native [[graft.functions.FoldAccents]]
      * Catalyst expression (codegen'd, ASCII fast path) — off by default
      * so the base gate stays replayable by engines without an
      * accent-strip function; DuckDB's `strip_accents` matches it.
      */
    foldAccents: Boolean = false) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "out" -> outputCol,
    "lower" -> lowercase.toString, "digits0" -> digitsToZero.toString,
    "punct" -> stripPunct.toString, "ws" -> collapseWhitespace.toString,
    "accents" -> foldAccents.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    var c: Column = coalesce(qcol(textCol), lit(""))
    if (foldAccents) c = graft.functions.FoldAccents.expr(c)
    if (lowercase) c = lower(c)
    if (digitsToZero) c = regexp_replace(c, "[0-9]", "0")
    if (stripPunct) c = regexp_replace(c, "\\p{Punct}", "")
    if (collapseWhitespace) c = trim(regexp_replace(c, "\\s+", " "))
    finish(df, Seq(outputCol -> c))
  }
}
