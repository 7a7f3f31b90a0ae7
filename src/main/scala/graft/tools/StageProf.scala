package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/CPU profile of one driver query:
  * runMain graft.tools.StageProf <name> <sfDir>
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val run = si.taskMetrics.executorRunTime / 1e3
        if (wall > 0.05 || run > 0.05)
          println(f"[stage ${si.stageId}%3d] wall=$wall%6.2f run=$run%7.2f cpu=$cpu%7.2f tasks=${si.numTasks}%3d  ${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    val t0 = System.nanoTime()
    graft.Queries.queries(args(0))(spark, args(1))
      .write.format("noop").mode("overwrite").save()
    println(f"[stageprof] ${args(0)} total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
