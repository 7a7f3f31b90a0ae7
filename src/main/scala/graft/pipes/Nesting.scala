package graft.pipes

import graft.core.{Condition, Pipe, SchemaOps}
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Nesting / reshaping pipes — the reference's explode/flatten/reshape layer.
  * Reference: warp_pipes/pipes/nesting.py + warp_pipes/support/nesting.py
  * (N1-N7 in SURVEY §2.4).
  *
  * Two lowering strategies, picked per call site:
  *   - ARRAY path (preferred): nested data stays inside `ArrayType` columns
  *     and is reshaped with higher-order functions (`transform`, `filter`,
  *     `flatten`, `array_repeat`) — no shuffle, stays in whole-stage codegen.
  *   - EXPLODE path (general): `posexplode` rows out, apply arbitrary inner
  *     pipes, re-nest with `groupBy(row id) + sort_array(collect_list(...))`.
  *     One shuffle on re-nest; row ids are stamped locally (partition-salted)
  *     so the groupBy distributes evenly at any scale.
  */
object NestingOps {

  val RowIdx = "__row_idx__"
  val Pos = "__pos__"

  /** Stamp a stable per-row id (reference threads absolute `idx`,
    * core/pipe.py:277; SURVEY §1.4). monotonically_increasing_id is
    * partition-prefixed, so ids are unique and spread across partitions —
    * safe as a groupBy key at scale (no single hot key).
    */
  def withRowIdx(df: DataFrame): DataFrame =
    df.withColumn(RowIdx, monotonically_increasing_id())

  /** N1 row-multiplying flatten: explode `arrayKeys` in lockstep, one output
    * row per inner element; other columns are carried (repeated). Kernel of
    * the reference's `flatten_nested` (support/nesting.py:19-56).
    *
    * Lockstep columns of unequal length are a LOUD runtime error (the
    * reference's batch invariant, support/shapes.py; `arrays_zip` alone
    * would silently null-pad — round-1 verdict item 5).
    */
  def flattenOnce(df: DataFrame, arrayKeys: Seq[String]): DataFrame = {
    require(arrayKeys.nonEmpty, "flattenOnce needs at least one array column")
    arrayKeys.foreach { k =>
      require(df.schema(k).dataType.isInstanceOf[ArrayType], s"$k is not an array column")
    }
    val others = df.columns.toSeq.filterNot(arrayKeys.contains)
    val sizes = arrayKeys.map(k => size(qcol(k)))
    val lockstep = sizes.tail.foldLeft(lit(true))((acc, s) => acc && s === sizes.head)
    val zipped =
      if (arrayKeys.size == 1) arrays_zip(arrayKeys.map(qcol): _*)
      else when(lockstep, arrays_zip(arrayKeys.map(qcol): _*))
        .otherwise(raise_error(concat(
          lit(s"flatten: ragged lockstep arrays [${arrayKeys.mkString(",")}]: sizes "),
          concat_ws(",", sizes.map(_.cast("string")): _*))))
    val exploded = df
      .select(others.map(qcol) :+ posexplode(zipped).as(Seq(Pos, "__z__")): _*)
    exploded.select(
      (others.map(qcol) :+ col(Pos)) ++
        arrayKeys.map(k => col(s"__z__.`$k`").as(k)): _*)
  }

  /** N7 `nest_idx` (support/nesting.py:135-138): flat index of element
    * `pos` inside group `grp` for a nesting of stride `size` —
    * `grp * size + pos`, as column arithmetic.
    */
  def nestIdx(grp: Column, pos: Column, size: Int): Column = grp * size + pos

  /** Scale-safe 0-based global rank by `orderCol`: range-partitioned
    * distributed sort + RDD `zipWithIndex` (one counting job over the
    * sorted partitions, then per-partition offsets applied in place).
    * Replaces `row_number().over(Window.orderBy(...))`, which moves ALL
    * rows to one partition (round-1 verdict item 4). Ties in `orderCol`
    * get an arbitrary-but-stable order within a partition; use a unique
    * order column for fully deterministic results.
    *
    * WHY zipWithIndex and not a `spark_partition_id()` offset join: range
    * bounds are SAMPLED per exchange instance, and the earlier two-branch
    * design (window positions in one branch, per-pid counts in another)
    * only agreed when Catalyst happened to reuse the exchange — when it
    * planned two exchanges, each sampled its own bounds, pids meant
    * different row ranges in each branch, and ranks silently collided
    * (caught by an sf0.1 write-path audit in round 6; `.count()` actions
    * pruned into a shape that masked it). zipWithIndex's counting job and
    * the downstream job share ONE RDD lineage, hence one partitioner and
    * one shuffle — agreement is structural, not best-effort.
    */
  def withGlobalRank(df: DataFrame, orderCol: String, rankCol: String): DataFrame =
    withGlobalRank(df, Seq(qcol(orderCol)), rankCol)

  /** Multi-column overload: rank in lexicographic `orderCols` order —
    * the way to get a DETERMINISTIC rank over a non-unique primary key
    * (pass the tie-break column explicitly, e.g. Seq(score, id)) without
    * first packing a composite into one column.
    */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column], rankCol: String): DataFrame =
    withGlobalRankCounted(df, orderCols, rankCol)._1

  /** [[withGlobalRank]] that ALSO returns the total row count — for
    * free: the rank already needs one per-partition counting job (the
    * [[withGlobalPrefixSum]] design; `zipWithIndex` runs the same job
    * internally but hides the sizes), and a caller that needs the total
    * (e.g. [[graft.llm.CurriculumOrderPipe]]'s `rank·B div n` bucket
    * cut) would otherwise pay a WHOLE extra pass over the upstream
    * lineage for a `count()`.
    */
  def withGlobalRankCounted(df: DataFrame, orderCols: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val rdd = sorted.rdd // ONE instance: both jobs share its partitioner
    val partCounts = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L
      it.foreach(_ => n += 1)
      Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row =>
        val pre = r
        r += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ pre)
      }
    }
    (spark.createDataFrame(ranked, schema), offsets.last)
  }

  /** Scale-safe 0-based EXCLUSIVE global prefix sum of `valueCol` in
    * `orderCol` order — the [[withGlobalRank]] design generalized from
    * counts to sums (rank is the valueCol=1 special case): range-partition
    * sort, one per-partition-sums job (numPartitions values to the
    * driver), then running sums applied in place on the SAME RDD lineage
    * — the structural-agreement argument of [[withGlobalRank]] applies
    * verbatim. A plain `sum().over(Window.orderBy(...))` would move ALL
    * rows to one partition. Ties in `orderCol` get an arbitrary-but-stable
    * order; use a unique order column for fully deterministic results.
    */
  def withGlobalPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val vc = "__gps_v__"
    val sorted = df
      .withColumn(vc, coalesce(qcol(valueCol).cast("long"), lit(0L)))
      .repartitionByRange(qcol(orderCol))
      .sortWithinPartitions(qcol(orderCol))
    val vIdx = sorted.schema.fieldIndex(vc)
    val rdd = sorted.rdd // ONE instance: both jobs share its partitioner
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { r =>
        val pre = run
        run += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pre)
      }
    }
    spark.createDataFrame(out, schema).drop(vc)
  }

  /** Inverse of [[flattenOnce]]: group by `parent`, re-assemble each array
    * column ordered by `order` (defaults to the flatten position).
    */
  def nestBack(df: DataFrame, parent: Seq[String], arrayKeys: Seq[String],
      order: String = Pos): DataFrame = {
    val others = df.columns.toSeq
      .filterNot(c => parent.contains(c) || arrayKeys.contains(c) || c == order)
    val aggs =
      arrayKeys.map(k =>
        sort_array(collect_list(struct(col(order), qcol(k).as("v")))).as(k)) ++
        others.map(k => first(qcol(k)).as(k))
    val grouped = df.groupBy(parent.map(qcol): _*).agg(aggs.head, aggs.tail: _*)
    grouped.select(
      parent.map(qcol) ++
        arrayKeys.map(k => transform(qcol(k), x => x.getField("v")).as(k)) ++
        others.map(qcol): _*)
  }
}

/** N1 `Flatten(level)` (nesting.py:41-62): `(b, n, …) -> (b*n, …)` for all
  * matched array columns, `level` times.
  */
case class FlattenPipe(level: Int = 1, override val inputFilter: Option[Condition] = None)
    extends Pipe {
  override def params = Map("level" -> level.toString)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    (1 to level).foldLeft(df) { (acc, _) =>
      val arrayKeys = keys.filter(k =>
        acc.columns.contains(k) && acc.schema(k).dataType.isInstanceOf[ArrayType])
      NestingOps.flattenOnce(acc, arrayKeys).drop(NestingOps.Pos)
    }
  }
}

/** N2 `Nest` (nesting.py:65-115): reshape flat rows back into fixed-size
  * groups of `size` (np.reshape semantics require a total order — supplied
  * by `orderCol`). `-1`-style inference is the caller's division.
  */
case class NestPipe(size: Int, keys: Seq[String], orderCol: String) extends Pipe {
  override def params = Map("size" -> size.toString, "keys" -> keys.sorted.mkString(","),
    "orderCol" -> orderCol)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val rank = "__rank__"
    val ranked = NestingOps.withGlobalRank(df, orderCol, rank)
    val grouped = ranked.withColumn("__grp__", floor(col(rank) / size))
      .withColumn(NestingOps.Pos, col(rank) % size)
      .drop(rank)
    NestingOps.nestBack(grouped, Seq("__grp__"), keys).drop("__grp__")
  }
}

/** N3 `ApplyAsFlatten(pipe, level)` (nesting.py:118-335): flatten → inner
  * pipe → re-nest by parent row. The reference asserts the inner pipe keeps
  * shape (nesting.py:223-233); re-nesting by row id instead makes
  * group-internal drops/re-orders legal, which is exactly what `Nested`
  * needs (SURVEY §7.4 risk 1). Inner pipes that change order should rewrite
  * the `__pos__` column; re-nest sorts by it.
  */
case class ApplyAsFlatten(pipe: Pipe, level: Int = 1,
    override val inputFilter: Option[Condition] = None) extends Pipe {
  override def children = Seq(pipe)
  override def params = Map("level" -> level.toString)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val stamped = NestingOps.withRowIdx(df)
    // flatten `level` times, accumulating one pos column + the set of keys
    // actually flattened per level (only those get re-nested — scalar
    // carried columns stay group constants)
    val init = (stamped, Seq.empty[String], List.empty[Seq[String]])
    val (flat, posCols, levelKeys) = (1 to level).foldLeft(init) {
      case ((acc, ps, ks), lvl) =>
        val arrayKeys = keys.filter(k =>
          acc.columns.contains(k) && acc.schema(k).dataType.isInstanceOf[ArrayType])
        val posName = s"${NestingOps.Pos}$lvl"
        (NestingOps.flattenOnce(acc, arrayKeys)
          .withColumnRenamed(NestingOps.Pos, posName), ps :+ posName, ks :+ arrayKeys)
    }
    val inner = pipe(flat)
    require(inner.columns.contains(NestingOps.RowIdx),
      s"inner pipe of ApplyAsFlatten must preserve ${NestingOps.RowIdx}")
    // re-nest innermost-out
    val renested = posCols.reverse.zip(levelKeys.reverse).zipWithIndex
      .foldLeft(inner) { case (acc, ((posName, lvlKeys), i)) =>
        val parents = Seq(NestingOps.RowIdx) ++ posCols.dropRight(i + 1)
        val nestKeys = lvlKeys.filter(acc.columns.contains)
        NestingOps.nestBack(acc, parents, nestKeys, order = posName)
      }
    renested.drop(NestingOps.RowIdx)
  }
}

/** N4/N5 `Nested(pipe, level)` (nesting.py:338-403): apply the inner pipe
  * independently within each row's nested group (inner pipe may drop or
  * re-order elements inside its group).
  */
case class NestedPipe(pipe: Pipe, level: Int = 1,
    override val inputFilter: Option[Condition] = None) extends Pipe {
  override def children = Seq(pipe)
  override def params = Map("level" -> level.toString)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    ApplyAsFlatten(pipe, level, inputFilter)(df)
}

/** N6 `Expand(axis, n)` (nesting.py:406-426; kernel support/nesting.py:99-133):
  * insert a new axis at depth `axis` and repeat n×. Depth 0 wraps the whole
  * per-row value; deeper axes lower to nested `transform` + `array_repeat` —
  * pure array math, no row multiplication, no shuffle.
  */
case class ExpandPipe(axis: Int, n: Int, keys: Seq[String]) extends Pipe {
  override def params =
    Map("axis" -> axis.toString, "n" -> n.toString, "keys" -> keys.sorted.mkString(","))
  override def update: Boolean = true
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val outs = keys.map { k =>
      k -> ApplyToCols.applyAtDepth(qcol(k), x => array_repeat(x, n), axis)
    }
    finish(df, outs)
  }
}
