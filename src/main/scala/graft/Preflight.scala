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

  /** Throws with a readable message on the first broken assumption. */
  def run(spark: SparkSession, dir: String): Unit = {
    // events first: its reader owns the physical-encoding adaptation (and
    // sets the nanos legacy conf when needed — required before the plain
    // schema reads below can even load a TIMESTAMP(NANOS) file)
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
    tables.foreach { t =>
      val path = s"$dir/$t.parquet"
      val schema =
        try spark.read.parquet(path).schema
        catch { case e: Throwable =>
          sys.error(s"[preflight] $t unreadable at $path: ${e.getMessage}")
        }
      println(s"[preflight] $t: " + schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
  }
}
