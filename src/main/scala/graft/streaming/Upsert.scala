package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC maintenance: apply a stream of change batches onto a
  * persisted table with [[graft.operators.UpsertMerge]], keeping the
  * table continuously queryable.
  *
  * Each micro-batch writes a FULL new version under `stateDir/v<id>` and
  * then flips a `_LATEST` pointer file — readers follow the pointer, so
  * a crash after the version write but before the flip simply leaves the
  * previous version live, and a replayed batch (foreachBatch is
  * at-least-once) rewrites the same `v<id>` idempotently before flipping
  * the pointer to the value it would have had. This is the poor man's
  * snapshot-isolation table format: versions are immutable, the pointer
  * is the only mutable cell, old versions remain for time travel until
  * vacuumed.
  *
  * Scale shape: the rewrite cost is one [[graft.operators.UpsertMerge]]
  * — a broadcast anti-join of the batch's keys against the base plus the
  * union — so each micro-batch streams the base through once without
  * shuffling it. (A format with file-level deletes — Delta/Iceberg —
  * beats a full rewrite when batches are tiny relative to the table;
  * rebuilding THAT is out of scope, the operator contract here is the
  * merge semantics + pointer protocol.)
  */
object StreamingUpsert {

  /** Seed the versioned table with its initial contents. */
  def seed(base: DataFrame, stateDir: String): Unit =
    commit(base, stateDir, "vinit")

  /** Start the maintenance query. `changes` must be a streaming frame
    * carrying the base schema plus the optional delete-flag column.
    */
  def run(
      changes: DataFrame,
      stateDir: String,
      keys: Seq[String],
      deleteCol: Option[String],
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cur = latest(spark, stateDir).getOrElse(
          throw new IllegalStateException(
            s"StreamingUpsert.run before seed: no _LATEST under $stateDir"))
        val merged = graft.operators.UpsertMerge(cur, batch, keys, deleteCol)
        commit(merged, stateDir, s"v$id")
      }
      .start()

  /** The current table: the version the `_LATEST` pointer names. */
  def latest(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val fs = path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = path(s"$stateDir/_LATEST")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      Some(spark.read.parquet(s"$stateDir/$v"))
    }
  }

  /** Drop all but the `keep` newest versions — never the one `_LATEST`
    * points at. Returns the deleted version names. Versions order as
    * `vinit` < `v0` < `v1` < ...; run it on whatever cadence bounds the
    * table's storage ≤ keep × table size.
    */
  def vacuum(spark: SparkSession, stateDir: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, "vacuum must keep at least one version")
    val fs = path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = path(s"$stateDir/_LATEST")
    val current =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        try Some(scala.io.Source.fromInputStream(in).mkString.trim)
        finally in.close()
      }
    def ordinal(v: String): Long =
      if (v == "vinit") -1L else v.drop(1).toLong
    val versions = fs.listStatus(path(stateDir)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n == "vinit" || n.matches("v\\d+"))
      .sortBy(ordinal)
    val doomed = versions.dropRight(keep).filterNot(current.contains)
    doomed.foreach(v => fs.delete(path(s"$stateDir/$v"), true))
    doomed
  }

  private def commit(df: DataFrame, stateDir: String, version: String): Unit = {
    df.write.mode("overwrite").parquet(s"$stateDir/$version")
    val fs = path(stateDir).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path(s"$stateDir/_LATEST"), true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
  }

  private def path(p: String) = new org.apache.hadoop.fs.Path(p)
}
