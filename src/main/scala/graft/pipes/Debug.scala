package graft.pipes

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, NumericType}

/** Debug/pretty operators (reference: warp_pipes/pipes/pprint.py D1-D2).
  * Both are pass-through pipes with a logging side effect; the summaries
  * are computed as ONE aggregate job (no per-column actions).
  */

/** D1 `PrintBatch` (pprint.py:22-72 + support/pretty.py:105-203): log a
  * per-column table of type / nesting depth / null count / min-max length
  * for array columns / NaN count for numeric columns.
  */
case class PrintBatch(header: String = "", sink: String => Unit = println(_))
    extends Pipe {
  override def params = Map("header" -> header)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = qcol(f.name)
      val base = Seq(sum(when(c.isNull, 1).otherwise(0)).as(s"${f.name}__nulls"))
      f.dataType match {
        case _: ArrayType => base ++ Seq(
          min(size(c)).as(s"${f.name}__minlen"), max(size(c)).as(s"${f.name}__maxlen"))
        case _: NumericType => base ++ Seq(
          sum(when(isnan(c.cast("double")), 1).otherwise(0)).as(s"${f.name}__nans"))
        case _ => base
      }
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    sink(s"=== PrintBatch $header: ${df.count()} rows ===")
    df.schema.fields.foreach { f =>
      val extras = f.dataType match {
        case _: ArrayType =>
          s" len=[${stats.getAs[Any](s"${f.name}__minlen")}..${stats.getAs[Any](s"${f.name}__maxlen")}]"
        case _: NumericType => s" nans=${stats.getAs[Any](s"${f.name}__nans")}"
        case _ => ""
      }
      sink(f"  ${f.name}%-28s ${f.dataType.simpleString}%-22s " +
        s"nulls=${stats.getAs[Any](s"${f.name}__nulls")}$extras")
    }
    df
  }
}

/** Zero-cost pipeline observability: attach named metrics (row count,
  * null counts, sums...) to a frame via Spark's `observe`/CollectMetrics.
  * Unlike [[PrintBatch]] (which runs its own aggregate job), observed
  * metrics ride along with whatever action the caller runs — NO extra
  * pass over the data, which at 100 TB is the difference between "free
  * accounting" and "double the job". Metrics arrive via the returned
  * [[org.apache.spark.sql.Observation]] after the first action.
  */
object ObserveTap {
  import org.apache.spark.sql.{Column, Observation}

  /** Attach a row-count (plus optional extra aggregates) observation.
    * Returns the tapped frame and the Observation to read after an
    * action: `val (df2, obs) = ObserveTap.attach(df, "post_filter")`.
    */
  def attach(df: DataFrame, name: String, extra: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("rows") +: extra
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

/** D2 `PrintContent` (pprint.py:75-127): log the first `n` rows. */
case class PrintContent(n: Int = 5, header: String = "", sink: String => Unit = println(_))
    extends Pipe {
  override def params = Map("n" -> n.toString, "header" -> header)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    sink(s"=== PrintContent $header ===")
    df.limit(n).collect().foreach(r => sink("  " + r.toString))
    df
  }
}
