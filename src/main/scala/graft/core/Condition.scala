package graft.core

import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Predicates over column NAMES, used to route/filter columns through pipes.
  *
  * Reference: warp_pipes/core/condition.py:16-116 (`Condition`, `Contains`,
  * `In`, `HasPrefix`, `Reduce`, `Not`, `Static`). These are plan-time
  * predicates — they look at `df.columns`, never at data.
  */
sealed trait Condition extends (String => Boolean) with Serializable {
  def apply(key: String): Boolean
  def &&(other: Condition): Condition = Condition.All(Seq(this, other))
  def ||(other: Condition): Condition = Condition.Any(Seq(this, other))
  def unary_! : Condition = Condition.Not(this)
  /** Stable repr for fingerprinting. */
  def repr: String
}

object Condition {
  /** key contains the given substring (condition.py `Contains`). */
  case class Contains(pattern: String) extends Condition {
    def apply(key: String): Boolean = key.contains(pattern)
    def repr = s"Contains($pattern)"
  }
  /** key is a member of the allowed set (condition.py `In`). */
  case class In(keys: Seq[String]) extends Condition {
    private val set = keys.toSet
    def apply(key: String): Boolean = set(key)
    def repr = s"In(${keys.sorted.mkString(",")})"
  }
  /** key starts with the prefix (condition.py `HasPrefix`) — the workhorse
    * for the dotted `field.key` namespace convention.
    */
  case class HasPrefix(prefix: String) extends Condition {
    def apply(key: String): Boolean = key.startsWith(prefix)
    def repr = s"HasPrefix($prefix)"
  }
  /** AND-fold (condition.py `Reduce` with `all`). */
  case class All(conds: Seq[Condition]) extends Condition {
    def apply(key: String): Boolean = conds.forall(_(key))
    def repr = s"All(${conds.map(_.repr).mkString(",")})"
  }
  /** OR-fold (condition.py `Reduce` with `any`). */
  case class Any(conds: Seq[Condition]) extends Condition {
    def apply(key: String): Boolean = conds.exists(_(key))
    def repr = s"Any(${conds.map(_.repr).mkString(",")})"
  }
  case class Not(cond: Condition) extends Condition {
    def apply(key: String): Boolean = !cond(key)
    def repr = s"Not(${cond.repr})"
  }
  /** Constant condition (condition.py `Static`). */
  case class Static(value: Boolean) extends Condition {
    def apply(key: String): Boolean = value
    def repr = s"Static($value)"
  }
  /** Custom predicate — NOT fingerprint-stable; callers must supply a repr. */
  case class Fn(f: String => Boolean, name: String) extends Condition {
    def apply(key: String): Boolean = f(key)
    def repr = s"Fn($name)"
  }
}

/** Predicates over a whole schema (reference `BatchCondition`,
  * condition.py:119-184). Plan-time: evaluated against `df.schema`, which is
  * the Spark analogue of inspecting the batch's key set / value types.
  */
sealed trait SchemaCondition extends (StructType => Boolean) with Serializable {
  def repr: String
}

object SchemaCondition {
  /** batch has ≥1 key with this prefix (condition.py `HasKeyWithPrefix`). */
  case class HasKeyWithPrefix(prefix: String) extends SchemaCondition {
    def apply(s: StructType): Boolean = s.fieldNames.exists(_.startsWith(prefix))
    def repr = s"HasKeyWithPrefix($prefix)"
  }
  /** batch has all of these keys (condition.py `HasKeys`). */
  case class HasKeys(keys: Seq[String]) extends SchemaCondition {
    def apply(s: StructType): Boolean = {
      val names = s.fieldNames.toSet
      keys.forall(names)
    }
    def repr = s"HasKeys(${keys.sorted.mkString(",")})"
  }
  /** every column has the given type (condition.py `AllValuesOfType`). */
  case class AllValuesOfType(tpe: DataType) extends SchemaCondition {
    def apply(s: StructType): Boolean = s.fields.forall(_.dataType == tpe)
    def repr = s"AllValuesOfType(${tpe.simpleString})"
  }
  case class Static(value: Boolean) extends SchemaCondition {
    def apply(s: StructType): Boolean = value
    def repr = s"Static($value)"
  }
  case class Not(c: SchemaCondition) extends SchemaCondition {
    def apply(s: StructType): Boolean = !c(s)
    def repr = s"Not(${c.repr})"
  }
}

/** Schema helpers shared by nesting ops: the reference infers nesting level
  * from DATA (support/shapes.py:162-179); in Spark it is a pure function of
  * the static schema — the ArrayType depth of a column.
  */
object SchemaOps {
  def nestingLevel(dt: DataType): Int = dt match {
    case ArrayType(elem, _) => 1 + nestingLevel(elem)
    case _ => 0
  }
}
