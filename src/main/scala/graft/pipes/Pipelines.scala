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
  * merge output columns. The reference asserts equal values on key
  * conflicts (pipelines.py:124-133); default here is later-writer-wins
  * (documented divergence — under the reference's contract the values
  * would be equal anyway), and `strict = true` restores the reference
  * semantics with a LAZY per-row equality check (`raise_error` on
  * disagreement) so plan construction stays action-free.
  *
  * Two lowerings (cf. round-1 verdict: the old RDD zipWithIndex positional
  * join was both a correctness hazard under shuffling branches and a
  * codegen-exiting scale-killer; gone):
  *
  *   - FAST PATH (all branches `update`): one select stack, zero joins,
  *     zero shuffles — with true per-branch-on-a-copy reads. The original
  *     column values ride in hidden `__pp_orig__` slots; every branch sees
  *     the universe names rebound to those originals (so a branch NEVER
  *     reads an earlier branch's overlay — the reference hands each
  *     Parallel branch a copy of the input batch, pipelines.py:111-142);
  *     a branch's written columns (detected by canonical-plan comparison
  *     against its presented input) move to hidden `__pp_w__` slots, later
  *     writers overwriting earlier ones, and the final select stitches
  *     originals + last-writer values back under the real names.
  *
  *   - GENERAL PATH: stamp a row id, run each branch on the stamped frame,
  *     and equi-join branch outputs back by id. Branches must carry
  *     `__row_idx__` through (row-count-preserving); branches that drop it
  *     fail fast with guidance. Joins shuffle, but correctly — broadcast /
  *     AQE pick the physical strategy at scale.
  */
case class ParallelPipe(pipes: Seq[Pipe], strict: Boolean = false) extends Pipe {
  import ParallelPipe.{hid, wslot}
  override def children: Seq[Pipe] = pipes

  /** Plan-time passthrough test: does `out`'s column `c` compute exactly
    * `presented`'s column `c`? Cheap check first: if `out`'s attribute for
    * `c` IS `presented`'s attribute (same exprId on the analyzed plans),
    * the branch never touched it — no optimizer round needed. Only columns
    * a branch rebuilt (re-aliased, rewritten) fall through to the
    * optimized-plan comparison: `finish` re-aliases even passthrough
    * columns, and only CollapseProject (run by the optimizer, not
    * analysis) folds those pure alias chains away so canonical equality
    * sees through them. No execution is triggered either way.
    */
  private def passthrough(presented: DataFrame, out: DataFrame, c: String): Boolean = {
    val pa = presented.queryExecution.analyzed.output.find(_.name == c)
    val oa = out.queryExecution.analyzed.output.find(_.name == c)
    (pa.nonEmpty && oa.nonEmpty && pa.get.exprId == oa.get.exprId) ||
      out.select(qcol(c)).queryExecution.optimizedPlan
        .sameResult(presented.select(qcol(c)).queryExecution.optimizedPlan)
  }

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val universe = df.columns.toSeq
    if (pipes.forall(_.update)) {
      var acc = df.select(universe.map(c => qcol(c).as(hid(c))): _*)
      var written = Vector.empty[String]
      for (p <- pipes) {
        val presented = acc.select(
          universe.map(c => qcol(hid(c)).as(c)) ++
            universe.map(c => qcol(hid(c))) ++
            written.map(n => qcol(wslot(n))): _*)
        val out = p.applyWithUniverse(presented, universe)
        val visible = out.columns.filterNot(_.startsWith("__pp_")).toSeq
        val writes = visible.filter(c =>
          !universe.contains(c) || !passthrough(presented, out, c))
        // reference Parallel asserts conflicting keys carry EQUAL values
        // (pipelines.py:124-133); default here is later-writer-wins
        // (documented divergence), strict=true restores the reference
        // contract lazily: a row where two branches disagree raises at
        // execution, so no eager comparison job runs at plan-build time
        val conflicts = if (strict) writes.filter(written.contains) else Nil
        written = written.filterNot(writes.contains) ++ writes
        acc = out.select(
          universe.map(c => qcol(hid(c))) ++
            written.map { n =>
              val v =
                if (!writes.contains(n)) qcol(wslot(n))
                else if (conflicts.contains(n))
                  when(qcol(n) <=> qcol(wslot(n)), qcol(n)).otherwise(raise_error(
                    concat(lit(s"Parallel branches disagree on '$n': "),
                      qcol(wslot(n)).cast("string"), lit(" vs "),
                      qcol(n).cast("string"))))
                else qcol(n)
              v.as(wslot(n))
            }: _*)
      }
      val extras = written.filterNot(universe.contains)
      acc.select(
        universe.map(c =>
          (if (written.contains(c)) qcol(wslot(c)) else qcol(hid(c))).as(c)) ++
          extras.map(n => qcol(wslot(n)).as(n)): _*)
    } else {
      val rid = NestingOps.RowIdx
      val stamped = NestingOps.withRowIdx(df)
      pipes.foldLeft(stamped) { (acc, p) =>
        val out = p.applyWithUniverse(stamped, universe)
        require(out.columns.contains(rid),
          s"Parallel branch ${p.name} dropped $rid — non-update branches must " +
            "preserve the row-id column (or use update-mode pipes)")
        val fresh = out.columns.toSeq.filterNot(c => c != rid && acc.columns.contains(c))
        if (fresh == Seq(rid)) acc
        else acc.join(out.select(fresh.map(qcol): _*), Seq(rid))
      }.drop(rid)
    }
  }
}

object ParallelPipe {
  def of(pipes: Pipe*): ParallelPipe = ParallelPipe(pipes.toSeq)
  private def hid(c: String) = s"__pp_orig__$c"
  private def wslot(c: String) = s"__pp_w__$c"
}

/** P3 `Gate` (pipelines.py:145-196): schema-conditional routing with static
  * folding at construction (158-166). Conditions are plan-time predicates
  * over `df.schema` (SURVEY C8), so the untaken branch never enters the plan.
  */
case class Gate(condition: SchemaCondition, pipe: Pipe, alt: Option[Pipe] = None)
    extends Pipe {
  override def params = Map("condition" -> condition.repr)
  override def children: Seq[Pipe] = pipe +: alt.toSeq
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    // reference contract (pipelines.py:168-185, tests/pipes/
    // test_pipelines.py): a taken branch with NO pipe yields the EMPTY
    // batch {}, not the input unchanged
    def off: DataFrame = alt.fold(df.sparkSession.emptyDataFrame)(_(df))
    condition match {
      case SchemaCondition.Static(true) => pipe(df)
      case SchemaCondition.Static(false) => off
      case c => if (c(df.schema)) pipe(df) else off
    }
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
  * shuffle-free overlay: every branch's `inputFilter`/keys are evaluated
  * against only its own `field.` columns of the ORIGINAL frame, and its
  * outputs overlay in place ([[Pipe.applyWithUniverse]] chaining — same
  * reasoning as [[ParallelPipe]]'s fast path, which is always safe here
  * because prefixes are disjoint).
  */
case class ParallelByField(fieldPipes: Map[String, Pipe]) extends Pipe {
  override def children: Seq[Pipe] = fieldPipes.toSeq.sortBy(_._1).map(_._2)
  override def params = Map("fields" -> fieldPipes.keys.toSeq.sorted.mkString(","))
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val universe = df.columns.toSeq
    fieldPipes.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (field, p)) =>
      require(p.update,
        s"ParallelByField branch for '$field' (${p.name}) must be an " +
          "update-mode pipe so its outputs overlay the frame in place")
      p.applyWithUniverse(acc, universe.filter(_.startsWith(s"$field.")))
    }
  }
}
