package graft.streaming

import graft.llm.DomainMixturePipe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Domain-mixture expansion on a long-running ingest with a REFRESHABLE
  * quota plan — the plan-refresh story the stream-static-broadcast form
  * ([[graft.streaming.EventStream.runDomainMixtureStream]]) deliberately
  * lacks: there the |domains|-row plan is pinned into the query's plan at
  * start (corpus statistics known up front), so drifted domain counts
  * need a query restart.
  *
  * Here the stream runs through `foreachBatch` and the quota plan is
  * RE-READ from `planPath` at every micro-batch boundary, so a planner
  * job that recomputes per-domain statistics and overwrites `planPath`
  * takes effect at the next batch without touching the query. Output
  * lands as parquet under `outDir/batch=<id>` with per-batch OVERWRITE —
  * a retried micro-batch replaces its own partial output, so the emitted
  * corpus is exactly-once (the standard idempotent-foreachBatch
  * contract); read it back with [[emitted]].
  *
  * Semantics per batch are EXACTLY [[DomainMixturePipe.expand]] against
  * the plan in force: a row arriving under plan A and the same row under
  * plan B expand differently — by design, that is what a refresh means.
  * The plan read is a |domains|-row parquet scan per micro-batch: noise
  * at any batch interval a mixing ingest would run.
  *
  * Scale shape: unchanged from the pipe — broadcast plan join + bounded
  * explode + partial-epoch filter, zero streaming state; the refresh
  * adds one tiny scan per batch, never a big-side shuffle.
  */
object StreamingMixture {

  def runRefreshable(
      stream: DataFrame,
      planPath: String,
      idCol: String,
      domainCol: String,
      outDir: String,
      checkpointDir: String,
      seed: Long = 23L,
      epochCol: String = "epoch"): StreamingQuery = {
    require(stream.isStreaming,
      "runRefreshable drives a streaming frame; use DomainMixturePipe on a batch")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // fresh read INSIDE the batch body: the listing happens per
        // micro-batch, so an overwritten plan is picked up here
        val plan = spark.read.parquet(planPath)
        DomainMixturePipe.expand(batch, plan, idCol, domainCol, seed, epochCol)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Everything emitted so far, with the micro-batch id as a `batch`
    * partition column (parquet partition discovery over `outDir`).
    */
  def emitted(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
