package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** The atomic unit of computation: a pure `DataFrame => DataFrame`.
  *
  * Mirrors the reference's `Pipe` contract (warp_pipes/core/pipe.py:39-333):
  *   - `inputFilter`: a [[Condition]] over column names; non-matching columns
  *     are hidden from the kernel (core/pipe.py:44-45, 305-309).
  *   - `update`: kernel output columns OVERLAY the unfiltered input batch
  *     instead of replacing it (core/pipe.py:112-114).
  *   - `fingerprint`: deterministic content hash of the pipe tree
  *     (core/fingerprintable.py:32-260) — the key for [[CachedStage]].
  *
  * Where the reference dispatches one eager kernel over in-memory batches,
  * dataset shards, and multiprocess workers (core/pipe.py:83-283), here a
  * pipe only DECLARES plan fragments: Spark owns batching, partitioning and
  * parallelism, and Catalyst owns column pruning / pushdown, so the whole
  * `_call_dataset` machinery collapses into `df.transform(pipe)`.
  */
trait Pipe extends (DataFrame => DataFrame) with Serializable {

  def name: String = {
    val n = getClass.getSimpleName
    if (n.endsWith("$")) n.dropRight(1) else n
  }

  /** Fingerprintable parameters. Restrict to primitives rendered as strings
    * so hashing is stable across JVMs (cf. SURVEY §7.4 risk 5).
    */
  def params: Map[String, String] = Map.empty

  /** Child pipes (for combinators); folded into the fingerprint. */
  def children: Seq[Pipe] = Nil

  /** Hide non-matching columns from the kernel. */
  def inputFilter: Option[Condition] = None

  /** If true, kernel outputs overlay the full input instead of replacing it.
    * Update pipes must be row-preserving (same contract as the reference,
    * where `batch.update(output)` requires equal batch size).
    */
  def update: Boolean = false

  /** The kernel. `keys` = columns matched by [[inputFilter]] (all columns if
    * none). `df` is the FULL input frame — kernels should read only `keys`
    * and use [[finish]] to honor the update/replace contract. Row-shape-
    * changing kernels (explode/generate) build their output directly.
    */
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame

  final def apply(df: DataFrame): DataFrame = {
    val all = df.columns.toSeq
    val kept = inputFilter.fold(all)(c => all.filter(c))
    transform(df, kept)
  }

  /** Apply with [[inputFilter]] evaluated against an explicit column
    * universe instead of `df.columns`. Lets combinators hand every branch
    * the ORIGINAL column set even when branches are chained onto one frame
    * (see `ParallelPipe`'s shuffle-free fast path) — the reference gives
    * each `Parallel` branch a copy of the input batch
    * (warp_pipes/pipes/pipelines.py:111-142); restricting `keys` to the
    * original universe reproduces that without materializing copies.
    */
  final def applyWithUniverse(df: DataFrame, universe: Seq[String]): DataFrame = {
    val kept = inputFilter.fold(universe)(c => universe.filter(c))
    transform(df, kept)
  }

  /** Assemble the output frame from named column expressions over `df`:
    * update → overlay onto all input columns; replace → exactly the outputs.
    * Keeps input column order, appends new names in given order (matches the
    * reference's dict-update semantics).
    */
  protected final def finish(df: DataFrame, outCols: Seq[(String, Column)]): DataFrame = {
    val outMap = outCols.toMap
    if (update) {
      val existing = df.columns.toSeq
      val overlaid = existing.map(k => outMap.getOrElse(k, Pipe.qcol(k)).as(k))
      val appended = outCols.collect { case (k, c) if !existing.contains(k) => c.as(k) }
      df.select(overlaid ++ appended: _*)
    } else {
      df.select(outCols.map { case (k, c) => c.as(k) }: _*)
    }
  }

  def fingerprint: String = Fingerprint.ofStruct(
    name,
    params ++ Map(
      "update" -> update.toString,
      "inputFilter" -> inputFilter.map(_.repr).getOrElse("")),
    children.map(_.fingerprint))

  /** Chain: `(a andThenPipe b)(df) == b(a(df))`. */
  def andThenPipe(next: Pipe): Pipe = graft.pipes.SequentialPipe(Seq(this, next))
}

object Pipe {
  /** Column ref that treats dots as literal name chars (the reference's
    * `field.key` convention), not struct access.
    */
  def qcol(name: String): Column = col(s"`$name`")

  /** Round-robin repartition up to the session's default parallelism when
    * the incoming plan has FEWER partitions — a single small parquet file
    * plans 1-2 input splits, which serializes per-row expression-heavy
    * stages (tokenize, shingle, minhash) on 1-2 of N cores.
    * No-op on already-wide inputs (at 100 TB a scan has thousands of
    * splits, so this never down-shuffles) and on streaming frames (whose
    * partitioning the source owns).
    *
    * POLICY (r20): only EXPRESSION-HEAVY kernels may call this — stages
    * whose per-byte compute (tokenize, regex batteries, shingle/minhash,
    * BPE merge loops) dwarfs the cost of moving the row once. Cheap
    * flag-only / byte-slicing map pipes (Gopher/C4 rule batteries, bloom
    * flagging, byte resamples, vocab encode) must NOT widen: the
    * round-robin exchange ships the full document text to buy a linear
    * pass that is already I/O-bound — measured in r19 as a 1.5-2x
    * regression on exactly those gates (t2/vb/mm/bloom cluster), and it
    * breaks the map-only plan contract their specs pin. Pipes that
    * aggregate or join immediately after the map stage also must not
    * widen — the aggregation's own exchange already redistributes.
    *
    * The partition count comes from [[estimatePartitions]] over the
    * LOGICAL plan: the previous `df.rdd.getNumPartitions` forced a full
    * physical-planning pass (plus an RDD lineage) per widened pipe just
    * to read a number the planner would derive again for the real action.
    */
  def widen(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      if (estimatePartitions(df) < par) df.repartition(par) else df
    }

  /** Partition-count estimate from the logical plan — no physical
    * planning. Mirrors how partitioning propagates through the physical
    * tree: shuffle-inducing operators emit `spark.sql.shuffle.partitions`
    * (AQE may coalesce lower, but never below what widen needs to know:
    * "session-width already"), repartition/coalesce pin their own count,
    * file scans split by Spark's size formula, checkpointed RDDs carry
    * their materialized count, unions concatenate, map-like nodes inherit
    * the widest child. Unknown leaves report session width so widen never
    * adds a shuffle it cannot justify (the conservative direction: a
    * missed widen costs a narrow stage; a wrong widen costs an exchange
    * at 100 TB).
    */
  private def estimatePartitions(df: DataFrame): Long = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism.toLong
    val shufflePart =
      try spark.conf.get("spark.sql.shuffle.partitions").toLong
      catch { case _: NumberFormatException => par }
    def bytesConf(key: String, dflt: Long): Long =
      try org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(spark.conf.get(key))
      catch { case _: Throwable => dflt }
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", 128L << 20)
    val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L << 20)
    // "-1" (auto-broadcast disabled) is not a byte string — handle it
    // before byteStringAsBytes, which would throw and mask it as 10MB
    val autoBcThreshold: Long = {
      val raw =
        try spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        catch { case _: Throwable => "10MB" }
      if (raw.trim.startsWith("-")) -1L
      else
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        catch { case _: Throwable => 10L << 20 }
    }
    def scanSplits(rel: HadoopFsRelation): Long = {
      // Spark's own split sizing (FilePartition.maxSplitBytes): small
      // totals bin at openCost, large totals at maxPartitionBytes
      val total = math.max(rel.location.sizeInBytes, 1L)
      val maxSplit = math.min(maxPartitionBytes,
        math.max(openCost, total / math.max(par, 1L)))
      math.max(1L, (total + maxSplit - 1) / math.max(maxSplit, 1L))
    }
    def est(plan: LogicalPlan): Long = plan match {
      case Repartition(n, true, _) => n.toLong
      case Repartition(n, false, child) => math.min(n.toLong, est(child)) // coalesce
      case r: RepartitionByExpression =>
        r.optNumPartitions.map(_.toLong).getOrElse(shufflePart)
      case j: Join =>
        // a broadcast-hash join shuffles NOTHING and inherits the streamed
        // side's partitioning — treating it as a shuffle would report
        // session width for e.g. small-file-scan ⋈ broadcast(tiny) plans
        // and widen() would skip the repartition they need (r9 advice).
        // Broadcast-ability mirrors the planner's test: an explicit hint,
        // or logical stats under autoBroadcastJoinThreshold.
        def hintedBc(h: Option[HintInfo]): Boolean =
          h.exists(_.strategy.contains(BROADCAST))
        // On the pre-optimized plan widen sees, a functions.broadcast()
        // hint is NOT in j.hint yet — it sits as a Resolved/UnresolvedHint
        // NODE wrapping the child (EliminateResolvedHint folds it into the
        // join only during optimization). Missing it reported shufflePart
        // for scan ⋈ broadcast(tiny) plans, skipping exactly the widen the
        // r9 advice added — measured as a ONE-task 335 s gram stage on a
        // single-row-group 500k-doc parquet at the r17 sf10 rung (the
        // broadcast side contributes no partitions; the narrow stream side
        // needed the repartition).
        def hintedBcNode(p: LogicalPlan): Boolean = p match {
          case h: ResolvedHint => h.hints.strategy.contains(BROADCAST)
          case u: UnresolvedHint =>
            Set("broadcast", "broadcastjoin", "mapjoin")
              .contains(u.name.toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
        def sizedBc(p: LogicalPlan): Boolean = autoBcThreshold > 0 &&
          (try p.stats.sizeInBytes <= autoBcThreshold
           catch { case _: Throwable => false })
        val leftBc = hintedBc(j.hint.leftHint) || hintedBcNode(j.left) ||
          sizedBc(j.left)
        val rightBc = hintedBc(j.hint.rightHint) || hintedBcNode(j.right) ||
          sizedBc(j.right)
        if (rightBc && !leftBc) est(j.left)
        else if (leftBc && !rightBc) est(j.right)
        // both broadcastable: the planner streams ONE side but which is
        // its pick — report the wider child (the conservative direction:
        // an overestimate skips a widen, never adds a wrong exchange)
        else if (leftBc && rightBc) math.max(est(j.left), est(j.right))
        else shufflePart
      case _: Aggregate | _: Sort | _: Window | _: Deduplicate =>
        shufflePart
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => scanSplits(fs)
        case _ => par
      }
      case l: LogicalRDD => l.rdd.getNumPartitions.toLong // already materialized
      case _: LocalRelation | _: OneRowRelation => 1L
      case u: Union => u.children.map(est).sum
      case n if n.children.nonEmpty => n.children.map(est).max
      case _ => par // unknown leaf: assume session-wide
    }
    // Spark 4 reads are lazily analyzed: df.queryExecution.logical for a
    // fresh spark.read.parquet(...) is an UnresolvedDataSource LEAF (no
    // HadoopFsRelation yet), which est() conservatively reports as
    // session width — widen() then silently no-opped on every raw scan
    // (measured in r19: t1_tokenizer 1.40 -> 0.72 s, dd_substring
    // 3.58 -> 3.11 s, qc_hash_score 1.54 -> 1.06 s at sf0.1 once the
    // estimate sees the real relation again). The ANALYZED plan resolves
    // it to LogicalRelation; analysis is rule-based only, no physical
    // planning, so the r16 cheap-estimate contract still holds.
    est(df.queryExecution.analyzed)
  }
}
