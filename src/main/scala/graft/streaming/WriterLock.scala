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
  *   `{token, pid, app, host, ns, label, ts, ttlMs}`.
  * - A lock held by a process in the SAME pid namespace (host name AND
  *   `ns` = kernel boot_id + /proc/self/ns/pid both match — hostname
  *   alone is spoofable by containers sharing a network filesystem,
  *   where `ProcessHandle.of(pid)` would probe the WRONG namespace and
  *   report a live foreign writer dead) whose pid is no longer alive is
  *   reclaimed: a crashed writer self-heals instead of blocking every
  *   successor until manual intervention.
  * - A lease that declares `ttlMs` is heartbeat-kept: the holder
  *   refreshes `_WRITER_HEARTBEAT` every ttl/4, and a successor on ANY
  *   host reclaims once the newest liveness signal (heartbeat ts, its FS
  *   mtime, lease ts) is older than the ttl the HOLDER declared — a live
  *   writer is never reclaimed because it refreshes 4× faster than it
  *   expires. This closes the crashed-FOREIGN-host case that previously
  *   needed a manual [[forceRelease]]. Clock skew between hosts must be
  *   well under the ttl (default 10 min); leases written with `ttlMs <=
  *   0` (and legacy payloads without it) are never TTL-reclaimed.
  * - A lock held by THIS process is reclaimed iff its query is no longer
  *   active (stopped or crashed mid-session) — sequential `run()`s over
  *   one stateDir in one JVM need no manual step.
  * - `release` is token-guarded: a late release (e.g. the termination
  *   listener firing after a successor already re-acquired) can never
  *   delete the successor's lease.
  */
object WriterLock {

  /** Default lease ttl: generous against GC pauses, driver stalls and
    * cross-host clock skew, small against a human noticing a wedged
    * pipeline. `acquire(ttlMs = 0)` opts out (lease never expires).
    */
  val DefaultLeaseTtlMs: Long = 10L * 60 * 1000

  /** In-JVM registry: stateDir -> (token, bound query). Lets acquire
    * distinguish an ACTIVE same-JVM writer (refuse) from a stopped one
    * (reclaim).
    */
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, (String, StreamingQuery)]()

  /** stateDir -> (token, heartbeat refresher) for leases this JVM holds. */
  private val beats = new java.util.concurrent.ConcurrentHashMap[
    String, (String, java.util.concurrent.ScheduledFuture[_])]()

  private lazy val beatPool = {
    val p = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-writer-lease-heartbeat")
        t.setDaemon(true); t
      })
    p
  }

  private lazy val hostName: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "unknown-host" }

  /** Pid-namespace identity: kernel boot_id (random per boot, so two
    * MACHINES never collide) + the pid-namespace inode (so two CONTAINERS
    * on one kernel never collide, while `--pid=host` siblings — which DO
    * share a probe-able namespace — match). Unreadable (non-Linux) →
    * "unknown-ns", which never matches and simply disables pid-probe
    * self-heal in favor of the ttl path.
    */
  private[streaming] lazy val namespaceId: String =
    try {
      val boot = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/sys/kernel/random/boot_id")),
        "UTF-8").trim
      val pidNs = java.nio.file.Files.readSymbolicLink(
        java.nio.file.Paths.get("/proc/self/ns/pid")).toString
      s"$boot:$pidNs"
    } catch { case _: Exception => "unknown-ns" }

  private def path(p: String) = new org.apache.hadoop.fs.Path(p)
  private def lockPath(stateDir: String) = path(s"$stateDir/_WRITER_LOCK")
  private def beatPath(stateDir: String) = path(s"$stateDir/_WRITER_HEARTBEAT")
  private def fsOf(spark: SparkSession, stateDir: String) =
    path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some(try scala.io.Source.fromInputStream(in).mkString finally in.close())
    }

  private def strField(payload: String, name: String): Option[String] =
    s""""$name":"([^"]*)"""".r.findFirstMatchIn(payload).map(_.group(1))
  private def longField(payload: String, name: String): Option[Long] =
    s""""$name":(-?\\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)

  /** The current lease payload, if any. */
  def holder(spark: SparkSession, stateDir: String): Option[String] =
    readFile(fsOf(spark, stateDir), lockPath(stateDir))

  /** Newest liveness signal for the held lease: the heartbeat ts (iff the
    * heartbeat names the same token), the heartbeat file's FS mtime (the
    * shared filesystem's clock — the one signal both parties see through
    * the same skew on HDFS), and the lease payload's own ts as the floor.
    */
  private def lastAliveMs(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, heldToken: Option[String], payload: String): Long = {
    val leaseTs = longField(payload, "ts").getOrElse(0L)
    val bp = beatPath(stateDir)
    val hb = readFile(fs, bp) match {
      case Some(b) if strField(b, "token") == heldToken && heldToken.nonEmpty =>
        val fileTs =
          try fs.getFileStatus(bp).getModificationTime
          catch { case _: Exception => 0L }
        math.max(longField(b, "ts").getOrElse(0L), fileTs)
      case _ => 0L
    }
    math.max(leaseTs, hb)
  }

  /** Atomically (temp + rename-overwrite) refresh the heartbeat. */
  private def writeBeat(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      stateDir: String, token: String): Unit = {
    val tmp = path(s"$stateDir/._WRITER_HEARTBEAT.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"token":"$token","ts":${System.currentTimeMillis()}}"""
        .getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, beatPath(stateDir),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def stopBeat(stateDir: String, token: Option[String]): Unit =
    Option(beats.get(stateDir)).foreach { case (t, fut) =>
      if (token.forall(_ == t)) { fut.cancel(false); beats.remove(stateDir) }
    }

  /** Take the lease; returns the token [[release]] needs. Throws
    * IllegalStateException naming the holder when the stateDir already
    * has a live writer. `ttlMs > 0` declares the lease heartbeat-kept
    * (see class doc); 0 opts out of expiry entirely.
    */
  def acquire(spark: SparkSession, stateDir: String, label: String,
      ttlMs: Long = DefaultLeaseTtlMs): String = {
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
      val heldPid = longField(payload, "pid")
      val heldApp = strField(payload, "app")
      val heldHost = strField(payload, "host")
      val heldNs = strField(payload, "ns")
      val heldTtl = longField(payload, "ttlMs").getOrElse(0L)
      // Reclaim only when BOTH pid and applicationId match: on a shared
      // filesystem (HDFS) a pid collides across hosts, so pid alone would
      // let a foreign process delete a LIVE lease — exactly the dual-writer
      // interleaving the lock exists to prevent.
      val ours = heldPid.contains(ourPid) &&
        heldApp.contains(spark.sparkContext.applicationId)
      // r16/r17: a holder in the SAME pid namespace (host + boot_id +
      // ns/pid inode — hostname alone is not proof of a shared namespace:
      // two containers with identical hostnames on a network FS would
      // probe the wrong namespace and "see" a live foreign writer dead)
      // whose pid is dead is a crashed writer — ProcessHandle is a
      // reliable probe inside one namespace, so the lease self-heals. A
      // live pid, a foreign/unknown namespace, or a legacy payload
      // without `ns` still refuses (the ttl path below covers those).
      val staleSameNs = !ours && namespaceId != "unknown-ns" &&
        heldHost.contains(hostName) && heldNs.contains(namespaceId) &&
        heldPid.exists(p => ProcessHandle.of(p).isEmpty)
      // A lease that DECLARED a ttl and whose newest liveness signal is
      // older than it: the holder crashed (anywhere) — a live holder
      // refreshes every ttl/4. Legacy/opted-out leases never expire.
      val staleTtl = !ours && heldTtl > 0L &&
        System.currentTimeMillis() -
          lastAliveMs(fs, stateDir, strField(payload, "token"), payload) > heldTtl
      if (!ours && !staleSameNs && !staleTtl)
        throw new IllegalStateException(
          s"state dir $stateDir already has a writer: $payload — two " +
            "concurrent maintenance queries would interleave pointer " +
            "flips silently. Stop the other writer; a crashed one " +
            "self-heals after its lease ttl expires, or " +
            s"WriterLock.forceRelease(spark, \"$stateDir\") reclaims now")
      // ours and (per the live-registry check above) not active — a
      // stopped or crashed query in this very process — or a dead
      // same-namespace holder, or an expired lease: reclaim ATOMICALLY.
      // A bare delete would race a concurrent successor (both observe the
      // stale lock, both delete — the second delete removing the FIRST
      // successor's fresh lease → dual live writers). Rename-to-tombstone
      // is atomic: exactly one claimer's rename succeeds; the loser fails
      // loudly here (or at the create-exclusive below if it raced past
      // the exists check).
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
    val ttlPart = if (ttlMs > 0L) s""","ttlMs":$ttlMs""" else ""
    val payload = s"""{"token":"$token","pid":$ourPid,""" +
      s""""app":"${spark.sparkContext.applicationId}",""" +
      s""""host":"$hostName","ns":"$namespaceId",""" +
      s""""label":"$label","ts":${System.currentTimeMillis()}$ttlPart}"""
    val out = fs.create(lp, false) // create-exclusive
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    live.put(stateDir, (token, null))
    if (ttlMs > 0L) {
      val conf = spark.sparkContext.hadoopConfiguration
      writeBeat(fs, conf, stateDir, token)
      val every = math.max(ttlMs / 4, 1000L)
      val fut = beatPool.scheduleWithFixedDelay(
        () => try writeBeat(fs, conf, stateDir, token)
          catch { case _: Exception => () }, // transient FS error: next
        every, every, java.util.concurrent.TimeUnit.MILLISECONDS)
      beats.put(stateDir, (token, fut))
    }
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
    stopBeat(stateDir, Some(token))
    Option(live.get(stateDir)).foreach { case (t, _) =>
      if (t == token) live.remove(stateDir)
    }
    if (holder(spark, stateDir).exists(_.contains(s""""token":"$token""""))) {
      val fs = fsOf(spark, stateDir)
      fs.delete(lockPath(stateDir), false)
      fs.delete(beatPath(stateDir), false)
    }
  }

  /** Operator escape hatch: unconditionally delete the lock after a
    * crashed foreign writer. NEVER run while a writer is live.
    */
  def forceRelease(spark: SparkSession, stateDir: String): Unit = {
    stopBeat(stateDir, None)
    live.remove(stateDir)
    val fs = fsOf(spark, stateDir)
    fs.delete(lockPath(stateDir), false)
    fs.delete(beatPath(stateDir), false)
  }
}
