package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Single-writer lease for CDC state dirs ([[StreamingUpsert]] /
  * [[PartitionedUpsert]]). The pointer-flip protocol assumes ONE
  * maintenance query per stateDir — two concurrent `run()`s would
  * interleave version writes and pointer flips silently (each flip is
  * individually atomic, so neither writer ever notices the other). The
  * lease makes the second writer fail LOUDLY instead:
  *
  * - `acquire` creates `_WRITER_LOCK` create-exclusively (atomic on HDFS;
  *   the local-FS window is negligible for a lease) with
  *   `{token, pid, app, host, label, ts}`.
  * - A lock held by a SAME-HOST process whose pid is no longer alive is
  *   reclaimed (r16): on one host `ProcessHandle.of(pid)` is a reliable
  *   liveness probe, so a crashed writer self-heals instead of blocking
  *   every successor until manual intervention. Cross-host (or a legacy
  *   payload without `host`) liveness can't be probed portably, so a
  *   crashed FOREIGN-host writer still needs an explicit [[forceRelease]]
  *   (the error message says so).
  * - A lock held by THIS process is reclaimed iff its query is no longer
  *   active (stopped or crashed mid-session) — sequential `run()`s over
  *   one stateDir in one JVM need no manual step.
  * - `release` is token-guarded: a late release (e.g. the termination
  *   listener firing after a successor already re-acquired) can never
  *   delete the successor's lease.
  */
object WriterLock {

  /** In-JVM registry: stateDir -> (token, bound query). Lets acquire
    * distinguish an ACTIVE same-JVM writer (refuse) from a stopped one
    * (reclaim).
    */
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, (String, StreamingQuery)]()

  private lazy val hostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  private def path(p: String) = new org.apache.hadoop.fs.Path(p)
  private def lockPath(stateDir: String) = path(s"$stateDir/_WRITER_LOCK")
  private def fsOf(spark: SparkSession, stateDir: String) =
    path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current lease payload, if any. */
  def holder(spark: SparkSession, stateDir: String): Option[String] = {
    val fs = fsOf(spark, stateDir)
    if (!fs.exists(lockPath(stateDir))) None
    else {
      val in = fs.open(lockPath(stateDir))
      Some(try scala.io.Source.fromInputStream(in).mkString finally in.close())
    }
  }

  /** Take the lease; returns the token [[release]] needs. Throws
    * IllegalStateException naming the holder when the stateDir already
    * has a live writer.
    */
  def acquire(spark: SparkSession, stateDir: String, label: String): String = {
    Option(live.get(stateDir)).foreach { case (_, q) =>
      if (q != null && q.isActive)
        throw new IllegalStateException(
          s"state dir $stateDir already has an ACTIVE writer in this " +
            s"session (query ${q.id}) — one maintenance query per " +
            "stateDir; stop it before starting another")
    }
    val fs = fsOf(spark, stateDir)
    fs.mkdirs(path(stateDir))
    val lp = lockPath(stateDir)
    val ourPid = ProcessHandle.current().pid()
    if (fs.exists(lp)) {
      val payload = holder(spark, stateDir).getOrElse("")
      val heldPid = "\"pid\":(\\d+)".r
        .findFirstMatchIn(payload).map(_.group(1).toLong)
      val heldApp = "\"app\":\"([^\"]*)\"".r
        .findFirstMatchIn(payload).map(_.group(1))
      val heldHost = "\"host\":\"([^\"]*)\"".r
        .findFirstMatchIn(payload).map(_.group(1))
      // Reclaim only when BOTH pid and applicationId match: on a shared
      // filesystem (HDFS) a pid collides across hosts, so pid alone would
      // let a foreign process delete a LIVE lease — exactly the dual-writer
      // interleaving the lock exists to prevent.
      val ours = heldPid.contains(ourPid) &&
        heldApp.contains(spark.sparkContext.applicationId)
      // r16: a SAME-HOST holder whose pid is dead is a crashed writer —
      // ProcessHandle is a reliable liveness probe on one host, so the
      // lease self-heals instead of blocking every successor. A live
      // same-host pid, any foreign host, or a legacy payload without
      // `host` still refuses.
      val staleSameHost = !ours && hostName != "unknown-host" &&
        heldHost.contains(hostName) &&
        heldPid.exists(p => ProcessHandle.of(p).isEmpty)
      if (!ours && !staleSameHost)
        throw new IllegalStateException(
          s"state dir $stateDir already has a writer: $payload — two " +
            "concurrent maintenance queries would interleave pointer " +
            "flips silently. Stop the other writer; after a crash, " +
            s"WriterLock.forceRelease(spark, \"$stateDir\") reclaims it")
      // ours and (per the live-registry check above) not active — a
      // stopped or crashed query in this very process — or a dead
      // same-host holder: reclaim ATOMICALLY. A bare delete would race a
      // concurrent successor (both observe the stale lock, both delete —
      // the second delete removing the FIRST successor's fresh lease →
      // dual live writers). Rename-to-tombstone is atomic: exactly one
      // claimer's rename succeeds; the loser fails loudly here (or at
      // the create-exclusive below if it raced past the exists check).
      val tomb = path(s"$stateDir/._WRITER_LOCK.claimed." +
        java.util.UUID.randomUUID().toString)
      val claimed = try fs.rename(lp, tomb) catch { case _: Exception => false }
      if (!claimed)
        throw new IllegalStateException(
          s"state dir $stateDir: lost the stale-lease reclaim race to a " +
            "concurrent successor — retry acquire against its live lease")
      fs.delete(tomb, false)
    }
    val token = java.util.UUID.randomUUID().toString
    val payload = s"""{"token":"$token","pid":$ourPid,""" +
      s""""app":"${spark.sparkContext.applicationId}",""" +
      s""""host":"$hostName",""" +
      s""""label":"$label","ts":${System.currentTimeMillis()}}"""
    val out = fs.create(lp, false) // create-exclusive
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    live.put(stateDir, (token, null))
    token
  }

  /** Bind the started query to its lease so a later [[acquire]] can see
    * whether the holder is still active, and auto-release the lease when
    * the query terminates (token-guarded, so a late event can't touch a
    * successor's lease).
    */
  def bind(spark: SparkSession, stateDir: String, token: String,
      q: StreamingQuery): Unit = {
    live.put(stateDir, (token, q))
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == q.id) {
          try release(spark, stateDir, token)
          finally spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
  }

  /** Drop the lease iff the on-disk lock still carries `token`. */
  def release(spark: SparkSession, stateDir: String, token: String): Unit = {
    Option(live.get(stateDir)).foreach { case (t, _) =>
      if (t == token) live.remove(stateDir)
    }
    if (holder(spark, stateDir).exists(_.contains(s""""token":"$token"""")))
      fsOf(spark, stateDir).delete(lockPath(stateDir), false)
  }

  /** Operator escape hatch: unconditionally delete the lock after a
    * crashed foreign writer. NEVER run while a writer is live.
    */
  def forceRelease(spark: SparkSession, stateDir: String): Unit = {
    live.remove(stateDir)
    fsOf(spark, stateDir).delete(lockPath(stateDir), false)
  }
}
