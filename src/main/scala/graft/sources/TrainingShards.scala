package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a sharded training order as the layout a trainer actually
  * reads: ONE parquet file per shard, rows inside each file in
  * `posCol` order — the on-disk completion of the
  * [[graft.llm.ShardAssignPipe]] /
  * `pp_train_order_v1` epilogue, which computes the (shard, pos) columns
  * but leaves materialization to the caller.
  *
  * Layout contract:
  *   - `dir/shard_id=<k>/part-*.parquet` — exactly one data file per
  *     shard (spec-checked), so a data-loader worker maps shard → file;
  *   - within a file, rows are ascending `posCol` (parquet preserves
  *     writer row order; spec-checked per file);
  *   - a read of the whole dir recovers the exact frame (gate-checked:
  *     `io_train_shards` replays content through the DuckDB oracle).
  *
  * Scale shape: one hash repartition ON THE SHARD COLUMN (each task
  * holds whole shards, so `partitionBy` emits one file per shard) +
  * an in-partition sort — no global single-partition sort, no driver
  * collect. Shards are fixed-size by construction (the upstream
  * [[graft.llm.ShardAssignPipe]]), so tasks are balanced by `shardSize`,
  * not data skew. For a 100 TB corpus pick shardSize so one shard ≈ one
  * HDFS/object block; the write is then one balanced map-side pass
  * after the upstream rank's range exchange.
  *
  * Returns the shard MANIFEST — (shard_id, n_rows, min_pos, max_pos) —
  * computed from the WRITTEN data (read back, not echoed from the
  * input), so a manifest row is evidence the shard landed: a training
  * job schedules off the manifest, and `max_pos = n_rows - 1` per shard
  * certifies the positions are dense.
  */
object TrainingShards {

  def write(
      df: DataFrame,
      dir: String,
      shardCol: String = "shard_id",
      posCol: String = "pos_in_shard"): DataFrame = {
    require(df.columns.contains(shardCol) && df.columns.contains(posCol),
      s"TrainingShards.write needs the ($shardCol, $posCol) layout columns " +
        "— run ShardAssignPipe (or the epilogue chain) first")
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write.mode("overwrite")
      .partitionBy(shardCol)
      .parquet(dir)
    // empty input: the write lands only _SUCCESS (no shard dirs), so the
    // read-back manifest would die on schema inference — a vacuously
    // successful materialization should return an EMPTY manifest (with
    // the input-derived schema), not a confusing crash
    if (hasShardDirs(df.sparkSession, dir))
      manifest(df.sparkSession, dir, shardCol, posCol)
    else
      df.limit(0).groupBy(col(shardCol))
        .agg(count(lit(1)).as("n_rows"),
          min(col(posCol)).as("min_pos"),
          max(col(posCol)).as("max_pos"))
  }

  /** Does the written dir hold any shard partition (not just markers)? */
  private def hasShardDirs(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.isDirectory)
  }

  /** The manifest of a written shard dir, from the data itself. */
  def manifest(spark: SparkSession, dir: String,
      shardCol: String = "shard_id",
      posCol: String = "pos_in_shard"): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        min(col(posCol)).as("min_pos"),
        max(col(posCol)).as("max_pos"))
      .orderBy(col(shardCol))
}
