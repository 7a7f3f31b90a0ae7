package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Footer-only parquet layout audit: per-file row counts and column
  * min/max ranges read from the FOOTERS — no data pages touched, so
  * auditing a 100 TB table costs one small read per file, distributed
  * over the executors (the file list is parallelized; each partition
  * opens only footers).
  *
  * This is the observability half of the layout operators: after
  * [[graft.operators.ZOrder.layout]] or a partitioned/compacted write,
  * `fileStats` shows exactly the min/max ranges the engine's scan
  * pruning will consult — tight ranges = real file skipping.
  *
  * Integral (int32/int64) columns only: min/max surface as longs, which
  * covers the id/bucket/date-int layout dims that matter for pruning.
  */
object ParquetStats {

  /** One row per (file, column): rows in the file, min and max from the
    * footer statistics (null stats → row dropped for that column).
    */
  def fileStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    // Executors must open footers with the SESSION Hadoop configuration —
    // a bare `new Configuration()` drops filesystem settings/credentials
    // (S3A keys, endpoints, GCS connectors), so the audit would work on
    // local FS and fail on the object stores 100 TB tables live on.
    val confBc = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism).max(1))
      .flatMap { p =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(p), confBc.value.value))
        try {
          import scala.jdk.CollectionConverters._
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          cols.flatMap { c =>
            val ranges = blocks.flatMap { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == c).flatMap { cc =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue) None
                else Some((st.genericGetMin, st.genericGetMax))
              }
            }
            if (ranges.isEmpty) None
            else {
              def asLong(v: Any): Long = v match {
                case l: java.lang.Long => l
                case i: java.lang.Integer => i.toLong
                case other => throw new IllegalArgumentException(
                  s"fileStats supports integral columns; '$c' min/max is " +
                    other.getClass.getSimpleName)
              }
              Some((p, rows, c,
                ranges.map(r => asLong(r._1)).min,
                ranges.map(r => asLong(r._2)).max))
            }
          }
        } finally reader.close()
      }
      .toDF("file", "rows", "col", "min", "max")
  }
}
