package graft.tools

import org.apache.spark.sql.SparkSession

/** Split a query's cost into plan-build / optimize / execute:
  * runMain graft.tools.PlanTime <name> <sfDir> [reps]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = if (args.length > 2) args(2).toInt else 2
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.Queries.queries(args(0))(spark, args(1))
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[plantime $i] ${args(0)} build=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
