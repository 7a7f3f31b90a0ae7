package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single driver query standalone: runMain graft.tools.OneQuery <name> <sfDir>. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.Queries.queries(args(0))(spark, args(1))
      .write.format("noop").mode("overwrite").save()
    println(f"[onequery] ${args(0)} ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
