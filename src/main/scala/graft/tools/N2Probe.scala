package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object N2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.Queries.queries("n2_nest")(spark, "/root/testdata/sf0.1")
    // write WITHOUT Scalarize and WITHOUT coalesce
    out.write.mode("overwrite").parquet("/tmp/n2p_raw")
    println(s"[p] raw-write rows=${spark.read.parquet("/tmp/n2p_raw").count()}")
    // with coalesce only
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/n2p_co")
    println(s"[p] coalesce-write rows=${spark.read.parquet("/tmp/n2p_co").count()}")
    // with Scalarize only
    graft.Scalarize(out).write.mode("overwrite").parquet("/tmp/n2p_sc")
    println(s"[p] scalarize-write rows=${spark.read.parquet("/tmp/n2p_sc").count()}")
    spark.stop()
  }
}
