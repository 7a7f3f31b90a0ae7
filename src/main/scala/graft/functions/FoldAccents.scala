package graft.functions

import org.apache.spark.sql.Column

/** Accent folding — the CCNet normalization step Spark has no builtin
  * for (NFD-decompose, then strip Unicode combining marks: café→cafe,
  * Zürich→Zurich; non-decomposable letters like ø/œ pass through,
  * matching DuckDB's `strip_accents`). The Catalyst expression itself is
  * [[org.apache.spark.sql.graft.FoldAccentsExpr]] (codegen'd, null-safe);
  * this object holds the public column builder and the scalar kernel the
  * generated code calls.
  *
  * The ASCII fast path returns the input string object untouched, which
  * at 100 TB (overwhelmingly ASCII web text) makes the fold nearly
  * free; only rows that actually carry non-ASCII pay the NFD + regex
  * pass.
  */
object FoldAccents {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** NFD + strip combining marks; ASCII input returns the SAME string
    * (no allocation, no normalizer pass).
    */
  def fold(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else Marks.matcher(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD))
      .replaceAll("")
  }

  /** UTF8String-level kernel for the codegen'd/interpreted expression
    * paths: the ASCII check runs on the BYTES (all-ASCII ⇔ numBytes ==
    * numChars — any multibyte codepoint makes chars < bytes) and returns
    * the input UTF8String object itself, so ASCII rows pay no
    * UTF8String→String decode and no String→UTF8String re-encode. Only
    * rows actually carrying non-ASCII enter the String round-trip.
    */
  def foldUTF8(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    if (u.numBytes() == u.numChars()) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(fold(u.toString))

  /** Column builder: `FoldAccents.expr(col("text"))`. */
  def expr(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.FoldAccentsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
