package graft.pipes

import graft.core.{Condition, Pipe, SchemaCondition}
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline combinators. Reference: warp_pipes/pipes/pipelines.py (P1-P5).
  * Combinators are Scala-level plan builders — "dead branch elimination"
  * (Gate's static folding) happens at plan construction, and Catalyst
  * collapses the chained selects afterwards.
  */

/** P1 `Sequential` (pipelines.py:90-108): chain pipes left-to-right.
  * Errors are wrapped with the failing stage's name (the reference wraps
  * into `PipeProcessError` with a batch repr, pipelines.py:22-51 — here the
  * plan is lazy, so we wrap at plan-build time only).
  */
case class SequentialPipe(pipes: Seq[Pipe], override val inputFilter: Option[Condition] = None)
    extends Pipe {
  override def children: Seq[Pipe] = pipes
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val in = if (keys == df.columns.toSeq) df else df.select(keys.map(qcol): _*)
    pipes.zipWithIndex.foldLeft(in) { case (acc, (p, i)) =>
      try p(acc)
      catch {
        case e: Exception =>
          throw new RuntimeException(
            s"Pipe error in Sequential stage $i (${p.name}); input columns: " +
              acc.columns.mkString(", "), e)
      }
    }
  }
}

object SequentialPipe {
  def of(pipes: Pipe*): SequentialPipe = SequentialPipe(pipes.toSeq)
}

/** P2 `Parallel` (pipelines.py:111-142): run each branch on the same input,
  * merge output columns; name conflicts across branches are an error (the
  * reference asserts value equality at runtime — we fail faster).
  *
  * Alignment: the reference relies on in-memory row order. Spark rows carry
  * no order, so branch outputs are re-aligned positionally (zipWithIndex +
  * join) against the cached input. That is a real shuffle per branch — for
  * narrow column logic prefer update-mode pipes in a [[SequentialPipe]],
  * which stays inside one whole-stage-codegen select. Branches must be
  * row-count- and row-order-preserving (same contract as the reference).
  */
case class ParallelPipe(pipes: Seq[Pipe]) extends Pipe {
  override def children: Seq[Pipe] = pipes
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    // Cache so every branch reads the identical row layout.
    val in = df.cache()
    val outs = pipes.map(p => p(in))
    val allNames = in.columns.toSeq ++ outs.flatMap(_.columns.filterNot(in.columns.contains))
    val dup = allNames.diff(allNames.distinct).distinct
    require(dup.isEmpty, s"Parallel branches both produce column(s): ${dup.mkString(", ")}")
    outs.foldLeft(in) { (acc, out) =>
      val fresh = out.columns.toSeq.filterNot(acc.columns.contains)
      if (fresh.isEmpty) acc
      else PipeUtils.zipByPosition(acc, out.select(fresh.map(qcol): _*))
    }
  }
}

/** Positional frame utilities shared by combinators and nesting ops. */
object PipeUtils {
  /** Zip two row-aligned frames column-wise (reference: in-memory dict
    * merge; `concatenate_datasets(axis=1)`, support/datasets_utils.py:130-147).
    * Uses RDD zipWithIndex (one pass, no skew) + an equi-join on position.
    */
  def zipByPosition(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val spark = a.sparkSession
    val aIdx = a.rdd.zipWithIndex().map(_.swap)
    val bIdx = b.rdd.zipWithIndex().map(_.swap)
    val zipped = aIdx.join(bIdx).values
      .map { case (ra, rb) => Row.fromSeq(ra.toSeq ++ rb.toSeq) }
    spark.createDataFrame(zipped, StructType(a.schema.fields ++ b.schema.fields))
  }
}

object ParallelPipe {
  def of(pipes: Pipe*): ParallelPipe = ParallelPipe(pipes.toSeq)
}

/** P3 `Gate` (pipelines.py:145-196): schema-conditional routing with static
  * folding at construction (158-166). Conditions are plan-time predicates
  * over `df.schema` (SURVEY C8), so the untaken branch never enters the plan.
  */
case class Gate(condition: SchemaCondition, pipe: Pipe, alt: Option[Pipe] = None)
    extends Pipe {
  override def params = Map("condition" -> condition.repr)
  override def children: Seq[Pipe] = pipe +: alt.toSeq
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    condition match {
      case SchemaCondition.Static(true) => pipe(df)
      case SchemaCondition.Static(false) => alt.fold(df)(_(df))
      case c => if (c(df.schema)) pipe(df) else alt.fold(df)(_(df))
    }
}

/** P4 `BlockSequential` (pipelines.py:199-223): named stages, optional
  * schema print between stages (the reference prints the batch; printing
  * data would force the lazy plan, so we log plan/schema only).
  */
case class BlockSequential(stages: Seq[(String, Pipe)], printStages: Boolean = false)
    extends Pipe {
  override def children: Seq[Pipe] = stages.map(_._2)
  override def params = Map("stages" -> stages.map(_._1).mkString(","))
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    stages.foldLeft(df) { case (acc, (stageName, p)) =>
      val out = p(acc)
      if (printStages) {
        println(s"--- stage: $stageName ---")
        out.printSchema()
      }
      out
    }
}

/** P5 `ParallelbyField` (pipelines.py:226-239): route each `field.` prefix
  * to its own pipe. Prefix groups are disjoint, so this lowers to a
  * shuffle-free overlay when each branch is row-preserving: every branch
  * sees only its prefix columns and its outputs overwrite them in place.
  */
case class ParallelByField(fieldPipes: Map[String, Pipe]) extends Pipe {
  override def children: Seq[Pipe] = fieldPipes.toSeq.sortBy(_._1).map(_._2)
  override def params = Map("fields" -> fieldPipes.keys.toSeq.sorted.mkString(","))
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    ParallelPipe(fieldPipes.toSeq.sortBy(_._1).map { case (field, p) =>
      SequentialPipe(Seq(p), inputFilter = Some(Condition.HasPrefix(s"$field.")))
    })(df)
}
