package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** All-`k`-bits Bloom probe over a flat position array — the scan side of
  * [[graft.llm.BloomDecontaminatePipe]]. The input is the row's bit
  * positions laid out k-per-ngram (`[g0p0..g0p{k-1}, g1p0..]`); the
  * result is true iff ANY k-group has every bit set in `bits` — i.e. at
  * least one n-gram possibly occurs in the corpus the filter was built
  * from.
  *
  * A native expression, not a UDF: the bitmap rides the expression tree
  * as a plain `Array[Long]` (shipped once per stage inside the broadcast
  * task binary, registered via `addReferenceObj` in codegen), and the
  * probe is a branch-light bit test inside whole-stage codegen — no
  * closure serialization, no per-row boxing of the positions array.
  *
  * Plan strings must not embed (or unstably render) the bitmap, so
  * `stringArgs`/`flatArguments` show a content fingerprint instead —
  * canonicalized-plan cache keys stay stable AND content-sensitive.
  */
case class BloomProbeExpr(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"bloom probe needs k >= 1 hash positions, got $k")
  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
    s"bloom bitmap must be a power-of-two number of words, got ${bits.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  private lazy val bitsFp: Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bits.length) { h = (h ^ bits(i)) * 0x100000001b3L; i += 1 }
    h
  }
  override def flatArguments: Iterator[Any] = Iterator(child, bitsFp, k)
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"m=${bits.length * 64}", f"fp=$bitsFp%016x", s"k=$k")

  override def nullSafeEval(input: Any): Any =
    BloomProbeExpr.probe(input.asInstanceOf[ArrayData], bits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.BloomProbeExpr.probe($c, $ref, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

object BloomProbeExpr {
  /** True iff any complete k-group of positions is fully set. Positions
    * are assumed in-range (the builder takes them mod m); a trailing
    * partial group (impossible by construction) is ignored.
    */
  def probe(arr: ArrayData, bits: Array[Long], k: Int): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i + k <= n) {
      var j = 0
      var all = true
      while (all && j < k) {
        val p = arr.getLong(i + j)
        if ((bits((p >>> 6).toInt) & (1L << (p & 63L).toInt)) == 0L) all = false
        j += 1
      }
      if (all) return true
      i += k
    }
    false
  }
}
