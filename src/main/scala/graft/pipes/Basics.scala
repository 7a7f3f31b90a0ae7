package graft.pipes

import graft.core.{Condition, Pipe, SchemaOps}
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Basic column/projection pipes.
  * Reference: warp_pipes/pipes/basics.py (B1-B12 in SURVEY §2.2).
  * All are pure `select` logic — Catalyst prunes and pushes them down.
  */

/** B1 `Identity` (basics.py:19-30). Also stands in for B11 `CopyBatch`
  * (basics.py:266-289): DataFrames are immutable, a mutation guard is moot.
  */
case class IdentityPipe() extends Pipe {
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = df
}

/** B2 `Lambda` (basics.py:33-63): arbitrary frame transform. The closure is
  * not content-hashable (same caveat as dill in the reference) — callers give
  * a stable `tag` that stands in for it in the fingerprint.
  */
case class LambdaPipe(f: DataFrame => DataFrame, tag: String,
    isUpdate: Boolean = false) extends Pipe {
  override def params = Map("tag" -> tag, "isUpdate" -> isUpdate.toString)
  override def update: Boolean = isUpdate
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = f(df)
}

/** B3 `GetKey` (basics.py:66-78). */
case class GetKey(key: String) extends Pipe {
  override def params = Map("key" -> key)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(qcol(key))
}

/** B4 `FilterKeys` (basics.py:81-92): projection by name predicate. */
case class FilterKeys(condition: Condition) extends Pipe {
  override def params = Map("condition" -> condition.repr)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(df.columns.filter(condition).map(qcol).toSeq: _*)
}

/** B5 `DropKeys` (basics.py:95-126). */
case class DropKeys(keys: Seq[String]) extends Pipe {
  override def params = Map("keys" -> keys.sorted.mkString(","))
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    df.drop(keys: _*)
}

/** B6 `AddPrefix` (basics.py:129-143): rename every matched `k -> prefix+k`. */
case class AddPrefix(prefix: String, override val inputFilter: Option[Condition] = None)
    extends Pipe {
  override def params = Map("prefix" -> prefix)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(df.columns.map { k =>
      if (keys.contains(k)) qcol(k).as(prefix + k) else qcol(k)
    }.toSeq: _*)
}

/** B7 `ReplaceInKeys` (basics.py:146-166): substring replace in names. */
case class ReplaceInKeys(a: String, b: String) extends Pipe {
  override def params = Map("a" -> a, "b" -> b)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(df.columns.map(k => qcol(k).as(k.replace(a, b))).toSeq: _*)
}

/** B8 `RenameKeys` (basics.py:169-186): rename per map, keep only renamed. */
case class RenameKeys(mapping: Map[String, String]) extends Pipe {
  override def params =
    Map("mapping" -> mapping.toSeq.sorted.map { case (a, b) => s"$a->$b" }.mkString(","))
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(mapping.toSeq.map { case (from, to) => qcol(from).as(to) }: _*)
}

/** B9 `Apply` (basics.py:189-220): per-column expression transform.
  * `elementWise` recurses into nested arrays with higher-order `transform`
  * (the reference recurses into Python lists).
  */
case class ApplyToCols(
    op: Column => Column,
    opTag: String,
    keys: Seq[String],
    elementWise: Boolean = false) extends Pipe {
  override def params =
    Map("op" -> opTag, "keys" -> keys.sorted.mkString(","), "elementWise" -> elementWise.toString)
  override def update: Boolean = true
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val outs = keys.map { k =>
      val depth = if (elementWise) SchemaOps.nestingLevel(df.schema(k).dataType) else 0
      k -> ApplyToCols.applyAtDepth(qcol(k), op, depth)
    }
    finish(df, outs)
  }
}

object ApplyToCols {
  /** Push a scalar op through `depth` levels of ArrayType. */
  def applyAtDepth(c: Column, op: Column => Column, depth: Int): Column =
    if (depth <= 0) op(c)
    else transform(c, x => applyAtDepth(x, op, depth - 1))
}

/** B10 `ApplyToAll` (basics.py:223-263): same op on every matched column. */
case class ApplyToAllCols(
    op: Column => Column,
    opTag: String,
    elementWise: Boolean = false,
    override val inputFilter: Option[Condition] = None) extends Pipe {
  override def params = Map("op" -> opTag, "elementWise" -> elementWise.toString)
  override def update: Boolean = true
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val outs = keys.map { k =>
      val depth = if (elementWise) SchemaOps.nestingLevel(df.schema(k).dataType) else 0
      k -> ApplyToCols.applyAtDepth(qcol(k), op, depth)
    }
    finish(df, outs)
  }
}

/** B12 `Partial` (basics.py:292-328) needs no runtime class in Scala —
  * constructor currying binds parameters; kept as a named alias for parity.
  */
object Partial {
  def apply[A](make: A => Pipe)(a: A): Pipe = make(a)
}
