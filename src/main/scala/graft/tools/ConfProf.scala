package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** StageProf with ad-hoc conf overrides:
  * runMain graft.tools.ConfProf <name> <sfDir> [k=v;k=v...]
  */
object ConfProf {
  def main(args: Array[String]): Unit = {
    val builder0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    val spark = args.lift(2).map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(builder0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        if (wall > 0.05 || run > 0.05)
          println(f"[cstage ${si.stageId}%3d] wall=$wall%6.2f run=$run%7.2f tasks=${si.numTasks}%3d")
      }
    })
    val t0 = System.nanoTime()
    graft.Queries.queries(args(0))(spark, args(1))
      .write.format("noop").mode("overwrite").save()
    println(f"[confprof] ${args(0)} total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
