package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the LATEST right
  * row with the same key and `rightTs <= leftTs` (backward — the
  * point-in-time lookup behind feature joins, price snapshots, and "last
  * event before X" analytics), or the EARLIEST right row with
  * `rightTs >= leftTs` (forward).
  *
  * Spark-first lowering: instead of the naive key-join + per-pair filter
  * (quadratic in per-key row count), both sides are TAGGED and UNION'd,
  * then a single window pass per key — sorted by (ts, side-tag,
  * payload) — carries the last-seen right payload forward with
  * `last(_, ignoreNulls = true)`. One shuffle on the key, linear work
  * per key, AQE-splittable if a key is hot; the plan shape survives a
  * 100x scale-up where the join+filter+argmax shape would not.
  *
  * Tie semantics: a right row at exactly `leftTs` IS visible (<= / >=),
  * by sorting the right tag first at equal ts; ties among right rows at
  * the same (key, ts) resolve deterministically to the greatest payload
  * struct (field-wise comparison) in both directions.
  */
object AsOfJoin {

  /** Latest right row at or before each left row's ts.
    *
    * @param payloadCols right-side columns carried to the left rows,
    *        emitted as `asof_<name>` (null when no visible right row);
    *        `asof_n_prior` counts the visible right rows per left row.
    * @param within optional tolerance predicate `(leftTs, rightTs) =>
    *        boolean`: a matched payload outside it is nulled (e.g.
    *        `(l, r) => unix_micros(l) - unix_micros(r) <= 60000000L` for
    *        "within the last minute"). `asof_n_prior` deliberately keeps
    *        counting ALL visible rows — a running tolerance-count is not
    *        expressible in one pass, and the total is the useful stat.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      within: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, keyCols, leftTsCol, rightTsCol, payloadCols, within,
      forwardDir = false)

  /** Earliest right row at or after each left row's ts; emits
    * `asof_n_next` (visible right rows at/after) instead of
    * `asof_n_prior`. Same machinery as [[backward]] on the reversed
    * timeline.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      within: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, keyCols, leftTsCol, rightTsCol, payloadCols, within,
      forwardDir = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      within: Option[(Column, Column) => Column],
      forwardDir: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val leftCols = left.columns.toSeq
    // the carried struct leads with the right ts so a tolerance can be
    // checked against the matched row (prepending it cannot change the
    // tie-break: ties only compete at equal ts anyway)
    val pay = struct(
      col(rightTsCol).as("__rts__") +: payloadCols.map(col): _*)
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
    val tsOrd = if (forwardDir) col("__ts__").desc else col("__ts__").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("__side__"), col("__pay__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nName = if (forwardDir) "asof_n_next" else "asof_n_prior"
    val scanned = l.unionByName(r)
      .withColumn("__last__", last(col("__pay__"), ignoreNulls = true).over(w))
      .withColumn("__n__", count(col("__pay__")).over(w))
      .filter(col("__side__") === 1)
    val matched = within match {
      case None => col("__last__")
      case Some(p) =>
        when(p(col("__ts__"), col("__last__.__rts__")), col("__last__"))
    }
    val out = leftCols.map(c => col(s"__row__.`$c`").as(c)) ++
      payloadCols.map(c => matched.getField(c).as(s"asof_$c")) :+
      col("__n__").cast("long").as(nName)
    scanned.select(out: _*)
  }
}
