package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whole-text n-gram dual-fold hashing — the compiled form of
  * [[graft.llm.BloomOps]]'s tokenFold31/tokenFold131/gramHashes chain
  * (bit-identical integer arithmetic, verified by the unchanged DuckDB
  * oracle replay): whitespace tokens of the trimmed text, two
  * independent per-token code-point polynomial folds, then per n-gram
  * the same two fold families over the token hashes, combined as
  * `g1 * 1000000007 + g2`.
  *
  * Exists for the same reason as [[BpeEncodeExpr]]: the higher-order
  * `aggregate` folds are interpreted and pay expression-walk overhead
  * per character; this kernel is one compiled loop inside whole-stage
  * codegen (each char folds exactly twice, each gram folds n token
  * hashes twice — same work, none of the interpreter tax).
  */
case class BloomGramHashExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    BloomGramKernel.gramHashArray(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BloomGramKernel.gramHashArray($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): BloomGramHashExpr =
    copy(child = newChild)
}

/** [[BloomGramHashExpr]] fused with the k affine bit positions per gram
  * (`[g0p0..g0p{k-1}, g1p0..]` — the layout [[BloomProbeExpr]] consumes):
  * pos_j = ((h mod P)·a_j + b_j mod P) mod m over the M31 prime, the
  * exact arithmetic of [[graft.llm.BloomOps.positions]].
  */
case class BloomGramPositionsExpr(child: Expression, n: Int, mBits: Int,
    coeffs: Array[Long]) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"ngram size must be >= 1, got $n")
  require(coeffs.nonEmpty && coeffs.length % 2 == 0,
    "coeffs must be flat (a, b) pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_gram_positions"

  private lazy val coeffsFp: Long = {
    var h = 0xcbf29ce484222325L
    coeffs.foreach(c => h = (h ^ c) * 0x100000001b3L)
    h
  }
  override def flatArguments: Iterator[Any] = Iterator(child, n, mBits, coeffsFp)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"n=$n", s"m=$mBits", s"k=${coeffs.length / 2}",
      f"fp=$coeffsFp%016x")

  override def nullSafeEval(input: Any): Any =
    BloomGramKernel.positionsArray(input.asInstanceOf[UTF8String], n, mBits,
      coeffs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCoeffs", coeffs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BloomGramKernel.positionsArray($c, $n, $mBits, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomGramPositionsExpr =
    copy(child = newChild)
}

object BloomGramKernel {
  private val P = 2147483647L // M31

  /** Dual token-hash arrays of the trimmed text's whitespace tokens:
    * h1 = fold 31 mod 1000003 seed 7, h2 = fold 131 mod 1000000007 seed
    * 11, over CODE POINTS (`split("") + ascii` keeps surrogate pairs
    * whole and yields the code point — codePoints match exactly).
    */
  private def tokenHashes(text: UTF8String): (Array[Long], Array[Long]) = {
    val s = text.toString.trim
    val t1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < len) {
        var h1 = 7L
        var h2 = 11L
        while (i < len && !Character.isWhitespace(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h1 = (h1 * 31 + cp) % 1000003L
          h2 = (h2 * 131 + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        t1 += h1
        t2 += h2
      }
    }
    (t1.toArray, t2.toArray)
  }

  private def gramHashes(text: UTF8String, n: Int): Array[Long] = {
    val (t1, t2) = tokenHashes(text)
    val count = t1.length - n + 1
    if (count <= 0) return Array.emptyLongArray
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var g1 = 7L
      var g2 = 11L
      var j = 0
      while (j < n) {
        g1 = (g1 * 31 + t1(i + j)) % 1000003L
        g2 = (g2 * 131 + t2(i + j)) % 1000000007L
        j += 1
      }
      out(i) = g1 * 1000000007L + g2
      i += 1
    }
    out
  }

  def gramHashArray(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(gramHashes(text, n))

  def positionsArray(text: UTF8String, n: Int, mBits: Int,
      coeffs: Array[Long]): ArrayData = {
    val hs = gramHashes(text, n)
    val k = coeffs.length / 2
    val out = new Array[Long](hs.length * k)
    var i = 0
    while (i < hs.length) {
      val hp = hs(i) % P // gram hashes are non-negative: % == pmod
      var j = 0
      while (j < k) {
        out(i * k + j) = (hp * coeffs(2 * j) + coeffs(2 * j + 1)) % P % mBits
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
