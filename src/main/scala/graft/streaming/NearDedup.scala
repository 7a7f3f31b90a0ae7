package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** MinHash-LSH near-duplicate detection OVER A STREAM — the streaming
  * twin of [[graft.llm.MinHashLSHDedupPipe]]: each arriving document is
  * checked against the recent (watermark-bounded) corpus and verified
  * pairs `(id_a, id_b, jaccard)` are emitted as they are discovered.
  * This is the shape an ingestion pipeline needs: duplicates are caught
  * on arrival instead of by a nightly batch sweep.
  *
  * Lowering:
  *   1. map-only per row: distinct shingle hashes, minhash signature
  *      (the SAME fixed-seed linear permutations as the batch pipe, so
  *      both bucket identically), band bucket hashes;
  *   2. explode to one row per band and group by (band, bucket);
  *   3. `flatMapGroupsWithState` keeps the bucket's recent members —
  *      (id, shingle set, event time) — verifies EXACT Jaccard of each
  *      arrival against them, emits pairs >= threshold, appends the
  *      arrival, and prunes/expires state by event-time watermark, so
  *      per-bucket state is bounded by the watermark window, never the
  *      stream length.
  *
  * A pair found by several bands is emitted once per finding band
  * (exactly-once pair output would need cross-bucket coordination no
  * streaming engine gives you cheaply); compose a downstream
  * `dropDuplicates(id_a, id_b)` — batch, or
  * `dropDuplicatesWithinWatermark` on the pair stream — as the gate
  * does.
  *
  * At 100 TB-scale ingestion: state is (watermark-window docs) x
  * (shingle-set bytes) spread over bucket keys — sized by the window,
  * not the corpus; the map side is pure per-row expression work.
  */
object StreamingNearDedup {

  case class BandRow(band: Int, bh: Long, id: Long, sh: Seq[Long],
      tsMicros: Long, ts: java.sql.Timestamp)
  case class Member(id: Long, sh: Seq[Long], tsMicros: Long)
  case class Bucket(members: Seq[Member])
  /** `ts` is the finding arrival's event time: the same pair found by
    * several bands carries the SAME ts, so a downstream watermark-scoped
    * dedup (see [[unique]]) sees exact duplicates within one delay bound.
    */
  case class Pair(id_a: Long, id_b: Long, jaccard: Double,
      ts: java.sql.Timestamp)

  /** The per-band duplicate emissions removed INSIDE the streaming query:
    * chains a second stateful operator — a watermark-scoped key dedup on
    * (id_a, id_b) — onto the pair stream, making the "compose a
    * downstream dedup" contract executable rather than advisory. Every
    * band's copy of a pair carries the identical finding-arrival `ts`, so
    * any watermark ≥ the source's delay bound catches them all; dedup
    * state is (pair-rate × window) keys, watermark-expired, never the
    * stream length. On a batch frame the same call degenerates to a plain
    * key dedup (`withWatermark` is a no-op and
    * `dropDuplicatesWithinWatermark` deduplicates the whole frame).
    */
  def unique(pairs: Dataset[Pair], watermark: String = "1 hour"): DataFrame =
    pairs.toDF()
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("id_a", "id_b")

  /** Run `body` (a streaming-query start + drain over a [[unique]] plan)
    * with Spark's global-watermark correctness check disabled. The checker
    * refuses ANY stateful operator downstream of flatMapGroupsWithState,
    * because an arbitrary user function COULD emit event times older than
    * the watermark — rows the downstream operator would silently drop as
    * late. This pipeline provably cannot: every pair is stamped with the
    * FINDING ARRIVAL's event time ([[Pair.ts]]), and that arrival just
    * passed the upstream watermark filter, so pair event times are always
    * >= (watermark - delay) and are never late for the chained dedup.
    * Session-conf mutation, restored on exit — single-writer assumption,
    * same caveat as the drain helpers' shuffle-width scoping.
    */
  def withChainedStatefulQuery[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, old)
  }

  def apply(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tsCol: String,
      watermark: String = "1 hour",
      numHashes: Int = 64,
      bands: Int = 32,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5): Dataset[Pair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val ops = graft.llm.DedupOps
    val wm0 = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    // spread the interpreted per-row signature work (shingles + 64
    // array_min permutations) across cores — computed on the source's
    // 1-2 file splits it serializes (8.4 s -> 3.7 s at sf0.1); the
    // stateless repartition carries only the raw text
    val wm = wm0.repartition(df.sparkSession.sparkContext.defaultParallelism)
    // the watermarked event-time COLUMN must survive every projection
    // down to the stateful operator — dropping it strips the watermark
    // tag and EventTimeTimeout refuses to plan
    val staged = wm.select(
      col(idCol).cast("long").as("id"),
      unix_micros(col(tsCol)).as("tsMicros"),
      col(tsCol).as("ts"),
      ops.shingleHashes(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", ops.minhashSignatureLinear(col("sh"), numHashes))
    val banded = staged.select(
      col("id"), col("tsMicros"), col("ts"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until r).map(j =>
          element_at(col("sig"), b * r + j + 1)): _*)): _*))
        .as(Seq("band", "bh")))
      .select("band", "bh", "id", "sh", "tsMicros", "ts")

    implicit val rowEnc = Encoders.product[BandRow]
    implicit val stEnc = Encoders.product[Bucket]
    implicit val outEnc = Encoders.product[Pair]

    val streaming = df.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.as[BandRow]
      .groupByKey(row => (row.band, row.bh))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[Bucket, Pair](
        OutputMode.Append(), timeout) {
        (_, rows: Iterator[BandRow], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wmMicros =
              if (streaming && state.getCurrentWatermarkMs() > 0)
                state.getCurrentWatermarkMs() * 1000L
              else Long.MinValue
            // survivors of the previous window + deterministic arrival order
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(_.tsMicros >= wmMicros).toList
            val arrivals = rows.toSeq.sortBy(a => (a.tsMicros, a.id))
            val out = Seq.newBuilder[Pair]
            arrivals.foreach { a =>
              val aset = a.sh.toSet
              members.foreach { m =>
                val mset = m.sh.toSet
                val inter = aset.intersect(mset).size
                val j = inter.toDouble / (aset.size + mset.size - inter)
                if (j >= jaccardThreshold && a.id != m.id)
                  out += Pair(math.min(a.id, m.id), math.max(a.id, m.id), j,
                    a.ts)
              }
              members = Member(a.id, a.sh, a.tsMicros) :: members
            }
            state.update(Bucket(members))
            if (streaming) {
              // expire the bucket once the watermark passes its newest
              // member (older members are already pruned on entry)
              val newest = members.map(_.tsMicros).max / 1000L
              state.setTimeoutTimestamp(math.max(newest + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
