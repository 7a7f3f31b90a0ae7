package graft.streaming

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Similarity search on ARRIVING queries: a STANDING index serves each
  * micro-batch of query vectors via `foreachBatch` — the per-batch body
  * is exactly the batch engine, so every retrieval semantic (probe
  * pruning, fill, merge) is inherited rather than re-implemented, and
  * the index state (centroids + tagged lists under the engine's
  * `stateDir`) is built ONCE before the stream starts, never per batch.
  * Stateless by construction: each query row is answered independently,
  * so there is no watermark, no state store, and a replayed batch
  * re-derives identical results (search is deterministic).
  *
  * Two entry points:
  *   - [[runSearchStreamTo]] — the PRODUCTION shape: per-batch results
  *     go straight to the caller's sink (parquet append, upsert, queue)
  *     and never touch the driver; returns the live [[StreamingQuery]].
  *   - [[runSearchStream]] — the TEST/gate harness: drains every batch
  *     into a bounded driver buffer (k rows per query per batch) and
  *     returns one batch frame for the oracle. Do NOT point this at an
  *     unbounded production stream — the buffer grows with total
  *     queries served.
  */
object SearchStream {

  /** Production variant: serve each arriving micro-batch with `engine`
    * and hand the result frame to `sink` (executed on the cluster —
    * e.g. `_.write.mode("append").parquet(out)`). Results scale with the
    * stream, not with driver memory. The returned query is LIVE: the
    * caller owns its lifecycle (`awaitTermination`/`stop`); pass a
    * `checkpointDir` so a restart resumes from the committed source
    * offsets. foreachBatch delivery is AT-LEAST-ONCE — a batch replayed
    * after a crash reaches the sink again with the same `batchId`, so
    * make the sink idempotent per batch id (as
    * [[runSearchStreamToParquet]] does) for end-to-end exactly-once.
    */
  def runSearchStreamTo(
      engine: DataFrame => DataFrame,
      queries: DataFrame,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(engine(batch), batchId)
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Parquet convenience over [[runSearchStreamTo]]: per-batch top-k
    * results land under `outDir/batch=<id>` as they are computed —
    * batch-id-keyed OVERWRITE, not a flat append, so a micro-batch
    * replayed after a crash (foreachBatch is at-least-once) rewrites its
    * own directory instead of duplicating rows; `spark.read.parquet(
    * outDir)` reads everything with `batch` as a partition column.
    */
  def runSearchStreamToParquet(
      engine: DataFrame => DataFrame,
      queries: DataFrame,
      outDir: String,
      checkpointDir: Option[String] = None): StreamingQuery =
    runSearchStreamTo(engine, queries,
      (res, id) => res.write.mode("overwrite").parquet(s"$outDir/batch=$id"),
      checkpointDir)

  /** TEST/GATE harness variant: process everything currently available,
    * stop, and return ALL results as one batch frame via a driver-side
    * buffer. Bounded only by (queries seen) × k — fine for gates and
    * specs, wrong for unbounded production streams; use
    * [[runSearchStreamTo]] there.
    */
  def runSearchStream(engine: DataFrame => DataFrame,
      queries: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    val buf = ArrayBuffer[Row]()
    var schema: StructType = null
    val q = queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = engine(batch)
        if (schema == null) schema = res.schema
        buf ++= res.collect()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    require(schema != null, "stream produced no micro-batch")
    spark.createDataFrame(buf.asJava, schema)
  }
}
