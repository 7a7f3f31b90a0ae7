package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first step of the C4/CCNet web-corpus
  * lineage (WARC payloads are markup; every downstream curation operator
  * wants running text). Deliberately REGEX-TIER, not a DOM parser: the
  * semantics a 100 TB pass can afford and an external engine can replay
  * byte-for-byte —
  *
  *   1. drop `<script>`/`<style>` elements WITH their contents
  *      (`(?s)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>` —
  *      non-greedy, dot-matches-newline; RE2-compatible, so Spark's Java
  *      regex and DuckDB/RE2 agree),
  *   2. drop comments `(?s)<!--.*?-->`,
  *   3. strip remaining tags `<[^>]*>` → a space (block boundaries must
  *      not glue words),
  *   4. decode the six entities running text actually carries
  *      (&lt; &gt; &quot; &#39; &nbsp; and LAST &amp; — decoding &amp;
  *      first would double-decode `&amp;lt;`),
  *   5. collapse whitespace, trim.
  *
  * All five steps are codegen'd string expressions — map-only, zero
  * shuffle, linear at any scale. Not a sanitizer (malformed markup
  * degrades to text noise, never to an error) and not a boilerplate
  * remover — that is [[LineDedupPipe]]'s job downstream.
  */
case class HtmlExtractPipe(
    htmlCol: String,
    outputCol: String = "text_extracted") extends Pipe {
  override def update: Boolean = true
  override def params = Map("html" -> htmlCol, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    finish(df, Seq(outputCol -> TextExtractOps.htmlExtract(qcol(htmlCol))))
}

object TextExtractOps {
  /** The five-step extraction chain of [[HtmlExtractPipe]] as one scalar
    * expression — shared by the pipe and the `html_extract` SQL function
    * so both surfaces emit identical bytes.
    */
  def htmlExtract(html: Column): Column = {
    var c: Column = coalesce(html, lit(""))
    c = regexp_replace(c,
      "(?s)<(?:script|style)\\b[^>]*>.*?</(?:script|style)\\s*>", " ")
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    c = regexp_replace(c, "<[^>]*>", " ")
    // entity names carry no regex metacharacters — plain patterns, so an
    // external oracle replays the identical pattern strings
    for ((ent, ch) <- Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"))
      c = regexp_replace(c, ent, ch)
    trim(regexp_replace(c, "\\s+", " "))
  }
}
