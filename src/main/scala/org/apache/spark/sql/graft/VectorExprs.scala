package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd one-pass twins of the interpreted higher-order-function
  * vector kernels in [[graft.llm.DedupOps]] /
  * [[graft.llm.ClusterBalancedSamplePipe]]. HOF chains
  * (`aggregate(zip_with(...))`) never enter whole-stage codegen and
  * allocate one intermediate array per zip_with per row — on the
  * within-cell pairwise cosine join and the nearest-centroid assignment
  * map stage those are THE per-row hot kernels at scale. Each expression
  * below documents, and its spec proves, bit-exact value parity with the
  * HOF form it replaces, including null/length-mismatch semantics and
  * IEEE accumulation order (same index-order left fold).
  */
private object VecUtil {
  /** Element getter honoring the HOF forms' `cast("double")` on float
    * inputs (exact widening).
    */
  def getD(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with
  * dot(x,y) = aggregate(zip_with(x, y, (p,q) => double(p)*double(q)),
  * 0d, _+_). Parity with the HOF form:
  *   - null `a` or `b` propagates null (null-safe binary expression);
  *   - length mismatch → zip_with pads with null → the fold poisons →
  *     null result;
  *   - any null ELEMENT in the shared range → null result;
  *   - accumulation is the same index-order left fold (bit-identical
  *     IEEE sums), division/sqrt identical, so 0-norm inputs produce
  *     the same Infinity/NaN the relational form does.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // the relational form's final Divide honors ANSI: a 0.0 divisor
  // (zero-norm input) raises DIVIDE_BY_ZERO when ansi is on (the Spark 4
  // default this repo runs under) and yields the IEEE result when off —
  // captured at construction exactly like Spark's own DivModLike
  private val failOnDivByZero =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def cos(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dab = 0d; var daa = 0d; var dbb = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VecUtil.getD(a, i, leftIsFloat)
      val y = VecUtil.getD(b, i, rightIsFloat)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = java.lang.Math.sqrt(daa) * java.lang.Math.sqrt(dbb)
    if (denom == 0d && failOnDivByZero) {
      throw org.apache.spark.sql.errors.QueryExecutionErrors
        .divideByZeroError(origin.context)
    }
    dab / denom
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSimExpr", this,
      classOf[CosineSimExpr].getName)
    val r = ctx.freshName("cosRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $ref.cos($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Squared-L2 distances of a vector to each of k literal centroids —
  * the codegen'd twin of
  * `transform(typedLit(centroids), c => aggregate(zip_with(v, c,
  * (x,y) => (x-y)*(x-y)), 0d, _+_))`. Parity:
  *   - the output ARRAY is never null (transform over a non-null
  *     literal): a null input vector, a length != dim vector, or a
  *     vector containing a null element yields an array of k NULL
  *     slots, exactly like the zip_with/fold poisoning;
  *   - per-centroid accumulation is the same index-order left fold of
  *     (x-y)*(x-y) — bit-identical IEEE sums.
  */
case class SquaredDistsExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "squared_dists"
  override def stringArgs: Iterator[Any] =
    Iterator(child, centroids.length, centroids.head.length)

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private val dim = centroids.head.length

  def dists(v: ArrayData): ArrayData = {
    val k = centroids.length
    var ok = v != null && v.numElements() == dim
    if (ok) {
      var i = 0
      while (ok && i < dim) { if (v.isNullAt(i)) ok = false; i += 1 }
    }
    if (!ok) return new GenericArrayData(new Array[Any](k))
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var acc = 0d
      var i = 0
      while (i < dim) {
        val d = VecUtil.getD(v, i, childIsFloat) - c(i)
        acc += d * d
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    dists(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("squaredDistsExpr", this,
      classOf[SquaredDistsExpr].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.dists(${childGen.isNull} ? null : ${childGen.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SquaredDistsExpr =
    copy(child = newChild)
}

/** 64-bit SimHash fold over a per-token hash array — the codegen'd twin
  * of the vote fold in [[graft.llm.DedupOps.simhash64]]:
  * `aggregate(th, zeros, (acc,h) => zip_with(acc, powers, (a,p) =>
  * a + when(h&p =!= 0, 1).otherwise(-1)))` then OR of powers with
  * positive votes. Parity:
  *   - null hash ARRAY → null (null-safe unary);
  *   - a null hash ELEMENT votes -1 on every bit (when(null, 1)
  *     .otherwise(-1) takes the otherwise branch);
  *   - empty array → all votes 0, no bit set → 0L — exactly the
  *     relational fold's zero-iteration result.
  * Pure integer arithmetic, so parity is exact, not approximate.
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  def fold(th: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = th.numElements()
    var i = 0
    while (i < n) {
      if (th.isNullAt(i)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val h = th.getLong(i)
        var b = 0
        while (b < 64) {
          votes(b) += (if ((h & (1L << b)) != 0) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash64Expr", this,
      classOf[Simhash64Expr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}
