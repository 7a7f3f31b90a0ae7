package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Fingerprint-keyed cross-run materialization — the reference's signature
  * feature (HF datasets' fingerprint cache, warp_pipes/core/pipe.py:223-243;
  * vector cache, support/caching.py:144-170; engine state dirs,
  * pipes/index.py:65-99).
  *
  * Catalyst has no cross-run memoization, so this wraps any expensive stage
  * as read-if-exists Parquet keyed by
  * `hash(upstream fingerprint, pipe fingerprint)`. Writes go to a temp path
  * and are renamed in, so a crashed writer never leaves a half-cache that a
  * later run would trust. At cluster scale the cacheDir lives on the shared
  * FS (HDFS/object store) and the parquet keeps the producing stage's
  * partitioning.
  */
object CachedStage {

  def cacheKey(upstreamFingerprint: String, pipeFingerprint: String): String =
    Fingerprint.combine(upstreamFingerprint, pipeFingerprint)

  /** Run `compute` (or reuse a previous run's result) under
    * `cacheDir/<key>`.
    */
  def apply(spark: SparkSession, cacheDir: String, key: String)(
      compute: => DataFrame): DataFrame = {
    val dir = new Path(cacheDir, key)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new Path(dir, "_SUCCESS")
    if (fs.exists(done)) {
      // refresh the entry's mtime on every hit: reads never update a
      // directory's modification time on any FS, so without this a
      // warm entry in daily use looks as stale to [[vacuum]] as an
      // abandoned one and gets evicted at TTL age. Best-effort — an FS
      // that refuses setTimes (some object stores) degrades to the
      // time-since-write TTL, and a false eviction is a re-compute,
      // never a correctness event.
      try fs.setTimes(dir, System.currentTimeMillis(), -1)
      catch { case _: Exception => () }
      spark.read.parquet(dir.toString)
    } else {
      val tmp = new Path(cacheDir, s"_tmp_$key")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      compute.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      if (fs.exists(dir)) fs.delete(dir, true)
      fs.rename(tmp, dir)
      spark.read.parquet(dir.toString)
    }
  }

  /** Cache the result of applying `pipe` to `df`, keyed by the pipe tree's
    * fingerprint and a caller-supplied fingerprint of the input data (e.g.
    * source path + snapshot version).
    */
  def through(pipe: Pipe, cacheDir: String, upstreamFingerprint: String)(
      df: DataFrame): DataFrame =
    apply(df.sparkSession, cacheDir, cacheKey(upstreamFingerprint, pipe.fingerprint))(pipe(df))

  /** Retention for a cache dir — the repo's own medicine applied to its
    * standing state: content-keyed entries accumulate one dir per
    * (fixture fingerprint × engine config) FOREVER on a long-lived host
    * (a refreshed corpus gets a new fingerprint; nothing ever deletes
    * the old key). Deletes every entry whose last modification is older
    * than `maxAgeMs` (stale `_tmp_` staging dirs from crashed writers
    * included — completed entries are never half-deleted because the
    * rename-in commit makes each entry atomic). The TTL is
    * time-since-last-USE, not time-since-write: [[apply]] refreshes the
    * entry dir's mtime on every cache hit, so entries in active use
    * survive indefinitely while abandoned keys age out. On an FS that
    * refuses setTimes the cheap-to-rebuild contract of a fingerprint
    * cache makes the occasional false eviction a re-compute, never a
    * correctness event. Returns the names of entries actually deleted —
    * a dir whose delete fails (permissions, concurrent writer) is NOT
    * reported dropped.
    */
  def vacuum(spark: SparkSession, cacheDir: String,
      maxAgeMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val dir = new Path(cacheDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else {
      val cutoff = System.currentTimeMillis() - maxAgeMs
      fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getModificationTime < cutoff)
        .filter(s => fs.delete(s.getPath, true))
        .map(_.getPath.getName)
    }
  }
}
