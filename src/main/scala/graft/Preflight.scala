package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType

/** Fixture preflight: print each table's file schema and surface reader-
  * assumption breaks BEFORE any gate runs. Motivated by the r8 drift: the
  * driver regenerated `events.parquet` with a different physical timestamp
  * encoding after the last in-round audit, and the breakage surfaced only
  * in the driver's own correctness run. A schema print + one adapted-read
  * probe in Verify/Bench makes the next drift a one-line diagnosis.
  */
object Preflight {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Throws with a readable message on the first broken assumption.
    *
    * `strict = false` (a Verify/Bench subset run via `only`): a MISSING /
    * unreadable table degrades to a warning — a partial fixture dir can
    * still verify the queries it has, and a query that does need the
    * absent table fails with its own message. DRIFT stays fatal in both
    * modes: a table that IS readable but breaks a reader assumption
    * (events.ts adapting to a non-timestamp, an implausible bare-INT64
    * unit) means answers would be silently wrong, not merely absent.
    */
  def run(spark: SparkSession, dir: String, strict: Boolean = true): Unit = {
    def missing(t: String, e: Throwable): Unit =
      if (strict)
        sys.error(s"[preflight] $t unreadable at $dir/$t.parquet: ${e.getMessage}")
      else
        println(s"[preflight] WARNING: $t unreadable at $dir/$t.parquet " +
          s"(subset run, continuing): ${e.getMessage}")
    // events first: its reader owns the physical-encoding adaptation (and
    // sets the nanos legacy conf when needed — required before the plain
    // schema reads below can even load a TIMESTAMP(NANOS) file)
    val evExists = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(dir + "/"), spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
    if (!strict && !evExists) {
      println(s"[preflight] WARNING: events absent at $dir/events.parquet " +
        "(subset run, continuing)")
    } else {
      // file present (or strict): adaptation/probe failures are DRIFT
      val ev =
        try graft.streaming.EventStream.readBatch(spark, dir)
        catch { case e: Throwable =>
          sys.error(s"[preflight] events reader failed to adapt to " +
            s"$dir/events.parquet: ${e.getMessage}")
        }
      val tsType = ev.schema("ts").dataType
      if (tsType != TimestampType)
        sys.error(s"[preflight] events.ts adapted to ${tsType.simpleString}, " +
          "expected timestamp — EventStream.adaptTs needs a new branch for " +
          "this file encoding")
      ev.select("ts").limit(1).collect() // force one real row through the scan
    }
    tables.foreach { t =>
      try {
        val schema = spark.read.parquet(s"$dir/$t.parquet").schema
        println(s"[preflight] $t: " + schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      } catch { case e: Throwable => missing(t, e) }
    }
  }
}
