package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables for co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of both
  * sides. Writing each side bucketed (hash-partitioned into a fixed
  * number of files) AND sorted by the join key lets every later join on
  * that key plan as a SortMergeJoin with NO Exchange and NO per-query
  * Sort — the co-location is paid once at write time and amortized over
  * every downstream query. This is Spark's native analogue of the
  * reference's persisted engine state dirs (build once, query many), at
  * the table layer.
  *
  * Bucket-count choice: both sides of a join must agree (or be integer
  * multiples, with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  * size buckets so one bucket's worth of one side fits in executor memory
  * — at 100 TB and 512 MB targets that is ~200k buckets, well within the
  * catalog's range.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def write(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, overwrite: Boolean = true): Unit = {
    val spark = df.sparkSession
    if (overwrite) {
      // mode("overwrite") only replaces tables THIS catalog knows about; a
      // table dir left by a previous session is an orphan location the
      // in-memory catalog can't drop, and CREATE refuses to reuse it —
      // drop the entry if registered, then clear any orphaned directory
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val parts = table.split('.')
      val loc = if (parts.length == 2) s"$wh/${parts(0)}.db/${parts(1)}"
                else s"$wh/${parts(0)}"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val w = df.write.format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides in the catalog —
    * a raw `spark.read.parquet` of the same files would NOT know the
    * layout and would shuffle again).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two tables bucketed on the same key with matching bucket
    * counts: plans shuffle-free (assert via `.explain` — no Exchange on
    * either side).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, on: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
