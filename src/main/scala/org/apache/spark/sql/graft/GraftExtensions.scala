package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of graft's custom expressions.
  *
  * Two entry points for the two deployment shapes:
  *   - cluster config: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     (applied at session instantiation — the standard extension hook);
  *   - an existing session: `GraftExtensions.register(spark)` adds the
  *     functions to the session's registry directly (what the specs and
  *     notebooks use, since `getOrCreate` ignores extensions on an
  *     already-built session).
  *
  * After either, `SELECT fold_accents(text)` works in `spark.sql` and
  * the parser resolves the function to the codegen'd
  * [[FoldAccentsExpr]] — no UDF registration involved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => BoundLevenshteinRule)
  }
}

object GraftExtensions {
  private type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(args: Seq[Expression], name: String)
      (f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression = {
    require(args.size == 1, s"$name expects exactly one argument")
    // EAGER conversion: the builder must hand the analyzer a catalyst
    // tree (builtins as resolvable UnresolvedFunctions), not a lazily
    // wrapped ColumnNode only the Dataset API knows how to unwrap
    ColumnBridge.resolvedExpression(f(ColumnBridge.column(args.head)))
  }

  private val functions: Seq[Description] = Seq(
    (new FunctionIdentifier("fold_accents"),
      new ExpressionInfo(classOf[FoldAccentsExpr].getName, "fold_accents"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "fold_accents expects exactly one argument")
        FoldAccentsExpr(args.head)
      }),
    // the CCNet dedup-key normalization chain (TextNormalizePipe default
    // toggles) — lower + digits→0 + strip ASCII punct + collapse ws
    (new FunctionIdentifier("ccnet_normalize"),
      new ExpressionInfo("graft.llm.TextAnalysisOps", "ccnet_normalize"),
      (args: Seq[Expression]) => unary(args, "ccnet_normalize")(
        graft.llm.TextAnalysisOps.normalizeCCNet)),
    // the bounded composite quality score of QualityScorePipe
    (new FunctionIdentifier("graft_quality"),
      new ExpressionInfo("graft.llm.TextAnalysisOps", "graft_quality"),
      (args: Seq[Expression]) => unary(args, "graft_quality")(
        graft.llm.TextAnalysisOps.qualityScore)),
    // C4-lineage HTML -> running-text extraction (HtmlExtractPipe chain)
    (new FunctionIdentifier("html_extract"),
      new ExpressionInfo("graft.llm.TextExtractOps", "html_extract"),
      (args: Seq[Expression]) => unary(args, "html_extract")(
        graft.llm.TextExtractOps.htmlExtract)),
    // function-word-vote language ID (LanguageIdPipe prediction)
    (new FunctionIdentifier("graft_langid"),
      new ExpressionInfo("graft.llm.TextAnalysisOps", "graft_langid"),
      (args: Seq[Expression]) => unary(args, "graft_langid")(
        graft.llm.TextAnalysisOps.languageId)),
    // order-sensitive rolling document fingerprint (FingerprintPipe)
    (new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo("graft.llm.TextAnalysisOps", "graft_fingerprint"),
      (args: Seq[Expression]) => unary(args, "graft_fingerprint")(
        graft.llm.TextAnalysisOps.fingerprint)),
    // the Gopher §A1.1 rule battery folded to its keep flag
    // (GopherQualityPipe's gopher_keep — shared kernel, two front ends)
    (new FunctionIdentifier("graft_gopher_keep"),
      new ExpressionInfo("graft.llm.GopherQualityOps", "graft_gopher_keep"),
      (args: Seq[Expression]) => unary(args, "graft_gopher_keep")(
        graft.llm.GopherQualityOps.keep)),
    // the C4 §2.2 line battery folded to the cleaned page text
    // (C4CleanPipe's rewrite — shared kernel, two front ends)
    (new FunctionIdentifier("graft_c4_clean"),
      new ExpressionInfo("graft.llm.C4CleanOps", "graft_c4_clean"),
      (args: Seq[Expression]) => unary(args, "graft_c4_clean")(
        graft.llm.C4CleanOps.clean)),
    // the crawl-key normalizer folded to its canonical form, NULL for
    // non-URLs (UrlCanonicalizePipe's outputCol — shared kernel)
    (new FunctionIdentifier("graft_url_canonical"),
      new ExpressionInfo("graft.llm.UrlCanonicalOps", "graft_url_canonical"),
      (args: Seq[Expression]) => unary(args, "graft_url_canonical")(
        graft.llm.UrlCanonicalOps.canonicalOrNull)),
    // Morton z-value: graft_zvalue(bits, dim1[, dim2...]) — bits must be
    // a literal; dims must be pre-bucketed non-negative ints (ZOrder doc)
    (new FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo("graft.operators.ZOrder", "graft_zvalue"),
      (args: Seq[Expression]) => {
        require(args.size >= 2,
          "graft_zvalue(bits, dim1[, dim2...]) needs a bits literal and at least one dim")
        require(args.head.foldable, "graft_zvalue: bits must be a literal")
        val bits = args.head.eval().asInstanceOf[Number].intValue()
        ColumnBridge.resolvedExpression(graft.operators.ZOrder.zvalue(
          args.tail.map(ColumnBridge.column), bits))
      }),
    // BPE subword encode with a literal merge table:
    // bpe_encode(text, 'a b|c d|...') — pairs separated by '|', symbols
    // by one space, applied in list order ([[BpeEncodeExpr]] semantics)
    (new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "bpe_encode"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "bpe_encode(text, merges) expects exactly two arguments")
        require(args(1).foldable,
          "bpe_encode: the merge table must be a string literal")
        val spec = String.valueOf(args(1).eval())
        val merges = spec.split('|').toSeq.filter(_.nonEmpty).map { m =>
          val parts = m.split(' ')
          require(parts.length == 2,
            s"bpe_encode: malformed merge '$m' (want 'left right')")
          (parts(0), parts(1))
        }
        BpeEncodeExpr(args.head, merges)
      }))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    // live-session analogue of injectOptimizerRule (getOrCreate ignores
    // extensions on an already-built session); idempotent
    if (!spark.experimental.extraOptimizations.contains(BoundLevenshteinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BoundLevenshteinRule
  }
}
