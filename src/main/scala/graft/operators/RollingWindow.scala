package graft.operators

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key rolling-window features: at every row, the count and sum of
  * `valueCol` over the trailing `windowSize` units of `orderCol`
  * (inclusive both ends: rows with `ord >= current - windowSize`) — the
  * "events in the last hour" / "spend in the last 30 days" feature
  * family.
  *
  * A RANGE frame (not ROWS): ties in `orderCol` all see the same frame,
  * so results are deterministic without a unique order column, and the
  * window is defined by the VALUE distance, not row count.
  *
  * Scale shape: one shuffle on the key; each key's rows sort once and
  * the frame slides linearly (Spark's range-frame window is
  * two-pointer, not re-scan). Skewed keys split under AQE. `orderCol`
  * is integer units (epoch micros, days, ...) — callers convert.
  */
case class RollingWindowPipe(
    keyCols: Seq[String],
    orderCol: String,
    valueCol: String,
    windowSize: Long,
    countCol: String = "rolling_cnt",
    sumCol: String = "rolling_sum") extends Pipe {
  require(keyCols.nonEmpty, "RollingWindowPipe needs at least one key column")
  require(windowSize >= 0, "windowSize must be non-negative")
  override def update: Boolean = true
  override def params = Map("keys" -> keyCols.mkString(","),
    "order" -> orderCol, "value" -> valueCol, "window" -> windowSize.toString,
    "cnt" -> countCol, "sum" -> sumCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(qcol): _*)
      .orderBy(qcol(orderCol))
      .rangeBetween(-windowSize, Window.currentRow)
    df.withColumn(countCol, count(lit(1)).over(w))
      .withColumn(sumCol, round(sum(qcol(valueCol)).over(w), 4))
  }
}
