package graft.streaming

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
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
  * At scale the per-batch results stream straight to a sink; the gate
  * harness drains them into a driver buffer (bounded: k rows per query
  * per batch) to hand the oracle one batch frame — the memory-sink
  * analogue, same as the other ev_* gates.
  */
object SearchStream {

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
