package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * lever for 100 TB scan pruning.
  *
  * A table range-partitioned and sorted on ONE column gets tight per-file
  * min/max statistics (and therefore footer-level file skipping) on that
  * column only; filters on a second dimension still scan everything.
  * Interleaving the bits of several dimensions into one z-value and laying
  * the data out by it gives every participating dimension locality: each
  * output file covers a small hyper-rectangle, so parquet min/max pruning
  * works for filters on ANY of the layout dims (the Delta/Iceberg
  * `ZORDER BY` capability, rebuilt from builtin bit arithmetic).
  *
  * [[zvalue]] is pure `shiftright`/`shiftleft`/`bitwiseAND` composition —
  * whole-stage-codegen'd, no UDF; [[layout]] is one range exchange (the
  * same shuffle a plain sort-by-one-column layout pays) plus an in-partition
  * sort, so z-ordering costs nothing extra over naive clustering at any
  * scale.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit `j` of column `i`
    * lands at output position `j * n + i` (LSB-first round-robin). Inputs
    * must be non-negative after bucketing; callers bucket unbounded or
    * signed dims first (e.g. `col % 1024`, a width bucket, or a rank).
    */
  def zvalue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zvalue needs at least one dimension")
    require(bits > 0 && bits * dims.size <= 63,
      s"bits*dims must fit a signed long, got $bits*${dims.size}")
    val n = dims.size
    val terms = for {
      (c, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` for multi-dim scan pruning: range-partition on the
    * z-value of `dims` and sort within partitions, so each written file
    * covers a tight z-range — i.e. a tight min/max on EVERY layout dim.
    * `partitions` sizes the output files (at 100 TB: total bytes / target
    * file size, NOT the shuffle default).
    */
  def layout(df: DataFrame, dims: Seq[Column], bits: Int, partitions: Int): DataFrame = {
    val withZ = df.withColumn("__z__", zvalue(dims, bits))
    withZ.repartitionByRange(partitions, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
  }
}
