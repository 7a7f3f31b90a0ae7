package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * LATEST right row with the same key and `rightTs <= leftTs` (the
  * point-in-time lookup behind feature joins, price snapshots, and
  * "last event before X" analytics).
  *
  * Spark-first lowering: instead of the naive key-join + per-pair filter
  * (quadratic in per-key row count), both sides are TAGGED and UNION'd,
  * then a single window pass per key — sorted by (ts, side-tag,
  * payload) — carries the last-seen right payload forward with
  * `last(_, ignoreNulls = true)`. One shuffle on the key, linear work
  * per key, AQE-splittable if a key is hot; the plan shape survives a
  * 100x scale-up where the join+filter+argmax shape would not.
  *
  * Tie semantics: a right row at exactly `leftTs` IS visible (<=), by
  * sorting the right tag first at equal ts; ties among right rows at the
  * same (key, ts) resolve deterministically to the greatest payload
  * struct (field-wise comparison).
  */
object AsOfJoin {

  /** @param payloadCols right-side columns carried to the left rows,
    *        emitted as `asof_<name>` (null when no prior right row);
    *        `asof_n_prior` counts the visible right rows per left row.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val leftCols = left.columns.toSeq
    val pay = struct(payloadCols.map(col): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts__"), lit(1).as("__side__"),
        lit(null).cast(right.select(pay).schema.head.dataType).as("__pay__"),
        struct(leftCols.map(col): _*).as("__row__")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__ts__"), lit(0).as("__side__"),
        pay.as("__pay__"), lit(null).cast(l.schema("__row__").dataType)
          .as("__row__")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts__"), col("__side__"), col("__pay__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = l.unionByName(r)
      .withColumn("__last__", last(col("__pay__"), ignoreNulls = true).over(w))
      .withColumn("__nprior__", count(col("__pay__")).over(w))
      .filter(col("__side__") === 1)
    val out = leftCols.map(c => col(s"__row__.`$c`").as(c)) ++
      payloadCols.map(c => col(s"__last__.`$c`").as(s"asof_$c")) :+
      col("__nprior__").cast("long").as("asof_n_prior")
    scanned.select(out: _*)
  }
}
