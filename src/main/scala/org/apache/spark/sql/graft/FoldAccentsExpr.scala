package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding as a native Catalyst expression — see
  * [[graft.functions.FoldAccents]] for the public builder and the scalar
  * kernel. Lives in the `org.apache.spark.sql` shim package because the
  * expression-contract types (`AbstractDataType` for
  * [[ImplicitCastInputTypes]]) are `private[sql]`.
  *
  * A `UnaryExpression` with `doGenCode`, NOT a Scala UDF: codegen emits
  * a direct static call inside the generated code, so the projection
  * stays within whole-stage codegen — no UDF closure serialization, no
  * per-row encoder boxing, and the null check is the generated one.
  */
case class FoldAccentsExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_accents"

  override def nullSafeEval(input: Any): Any =
    graft.functions.FoldAccents.foldUTF8(input.asInstanceOf[UTF8String])

  // byte-level kernel: all-ASCII rows return the input UTF8String object
  // untouched (no String decode/re-encode — 2 allocations/row saved on
  // mostly-ASCII corpora); only non-ASCII rows enter the String path
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FoldAccents.foldUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldAccentsExpr =
    copy(child = newChild)
}
