package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one driver query:
  * runMain graft.tools.ExplainOne <name> <sfDir>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Queries.queries(args(0))(spark, args(1))
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
  }
}
