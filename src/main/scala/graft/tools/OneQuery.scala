package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one or more driver queries standalone (one shared session):
  * runMain graft.tools.OneQuery <name>[,<name>...] <sfDir>.
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0).split(',').foreach { name =>
      val t0 = System.nanoTime()
      graft.Queries.queries(name)(spark, args(1))
        .write.format("noop").mode("overwrite").save()
      println(f"[onequery] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
