package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for driver gates to files:
  * runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <gate> [gate...]
  * writes <outDir>/<gate>_<suffix>.txt for each gate.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val gates = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.debug.maxToStringFields", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    gates.foreach { g =>
      try {
        val df = graft.Queries.queries(g)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${g}_$suffix.txt"), txt)
        println(s"[plandump] $g -> $outDir/${g}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $g FAILED: $e")
      }
    }
    spark.stop()
  }
}
