package graft.streaming

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-Streaming layer. The reference has NO streaming (SURVEY §1.1)
  * — this is a capability extension for the `events` feed: the SAME pipes
  * run on a batch frame and on a `readStream` frame (Spark's unified
  * Dataset model), so every batch oracle doubles as the streaming
  * correctness baseline.
  */
object EventStream {
  import org.apache.hadoop.fs.Path
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.schema.LogicalTypeAnnotation
  import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Physical encoding of the events `ts` column, decided from the parquet
    * FOOTER, not from Spark's inferred schema: a TIMESTAMP(NANOS) column
    * cannot even be loaded by Spark without the session-level
    * `nanosAsLong` legacy conf, so the footer is the only place the
    * decision can be made without mutating session state for everyone.
    * A 100 TB lake has mixed writers (arrow/pandas default to micros,
    * older feeds carry nanos or raw INT64 epochs) — the reader adapts to
    * the file, never the other way around.
    */
  private sealed trait TsEncoding
  private case object TsNanosLong extends TsEncoding // INT64 TIMESTAMP(NANOS) or bare INT64 epoch-nanos
  private case object TsNative extends TsEncoding    // TIMESTAMP(MICROS/MILLIS) (tz or ntz) / INT96

  private def tsEncoding(spark: SparkSession, file: String): TsEncoding = {
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      val schema = reader.getFileMetaData.getSchema
      if (!schema.containsField("ts")) return TsNative
      val ts = schema.getType(schema.getFieldIndex("ts"))
      ts.getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS =>
          TsNanosLong
        case _: TimestampLogicalTypeAnnotation => TsNative
        case _ if ts.isPrimitive &&
            ts.asPrimitiveType().getPrimitiveTypeName == PrimitiveTypeName.INT64 =>
          // bare INT64, no annotation: documented as epoch-nanos (the
          // shape a nanosAsLong reader round-trips through a long writer).
          // The unit claim is UNVERIFIABLE from the schema alone — a
          // writer emitting epoch-micros/-millis as plain INT64 would be
          // silently off by 1e3/1e6 (the exact drift class the footer
          // probe exists to catch) — so sanity-check the footer's column
          // MIN/MAX statistics against the plausible epoch-nanos range
          // (1973..2096 ≈ [1e17, 4e18]) and fail LOUDLY on a mismatch
          // instead of corrupting every downstream timestamp.
          probeNanosMagnitude(reader)
          TsNanosLong
        case _ => TsNative // INT96 et al: Spark reads these natively
      }
    } finally reader.close()
  }

  /** Plausible-epoch-nanos bounds: 1e17 ns ≈ 1973-03, 4e18 ns ≈ 2096-09.
    * Epoch-micros for the same era sit near 1.7e15 and millis near 1.7e12
    * — three-plus orders below the floor — so a stats range outside these
    * bounds means the bare column is NOT nanos and must not be read as
    * such.
    */
  private val NanosFloor = 1e17.toLong
  private val NanosCeil = 4e18.toLong

  /** Value-plausibility probe for a bare INT64 `ts` (metadata-only: reads
    * the footer's column-chunk min/max statistics, never data pages).
    * Chunks without statistics are skipped — absence of evidence is not
    * drift — but any chunk whose range falls outside the nanos window
    * fails the read loudly with the unit it looks like instead.
    */
  private def probeNanosMagnitude(reader: ParquetFileReader): Unit = {
    import scala.jdk.CollectionConverters._
    for {
      block <- reader.getFooter.getBlocks.asScala
      chunk <- block.getColumns.asScala
      if chunk.getPath.toDotString == "ts"
      stats = chunk.getStatistics
      if stats != null && !stats.isEmpty && stats.hasNonNullValue
    } {
      val mn = stats.genericGetMin match { case l: java.lang.Long => l.longValue }
      val mx = stats.genericGetMax match { case l: java.lang.Long => l.longValue }
      if (mn < NanosFloor || mx > NanosCeil) {
        val looksLike =
          if (mx in1e (1e15, 1e17)) "epoch-MICROS"
          else if (mx in1e (1e12, 1e15)) "epoch-MILLIS"
          else if (mx in1e (1e9, 1e12)) "epoch-SECONDS"
          else "an unknown unit"
        sys.error(
          s"events.ts: bare INT64 column with stats range [$mn, $mx] is " +
            s"outside the plausible epoch-nanos window [$NanosFloor, " +
            s"$NanosCeil] — it looks like $looksLike. Refusing to read " +
            "it as nanos; fix the writer or annotate the column.")
      }
    }
  }

  private implicit class LongRangeOps(private val v: Long) {
    def in1e(lo: Double, hi: Double): Boolean = v >= lo.toLong && v < hi.toLong
  }

  /** Set the `nanosAsLong` legacy conf ONLY when the file actually needs
    * it (TIMESTAMP(NANOS) is unreadable without it). The conf is
    * session-level with no per-read option; setting it is safe under
    * concurrent queries because it is never toggled back and it has no
    * effect on non-NANOS columns.
    */
  private def prepareSession(spark: SparkSession, file: String): TsEncoding = {
    val enc = tsEncoding(spark, file)
    if (enc == TsNanosLong)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    enc
  }

  /** Normalize the raw `ts` column to session TimestampType micros,
    * whatever the file carried:
    *   - LongType (TIMESTAMP(NANOS) under nanosAsLong, or bare INT64
    *     epoch-nanos): integer `ts div 1000`, not double `/ 1000` —
    *     epoch-nanos ~1.7e18 exceeds a double's 53-bit mantissa, so the
    *     float path could be off by ±1 us; DuckDB truncates ns->us
    *     exactly and the oracle must agree;
    *   - TIMESTAMP_NTZ (arrow/pandas default): cast to the session
    *     timestamp type — value-preserving because every graft session
    *     pins spark.sql.session.timeZone=UTC (Verify/Bench/specs), which
    *     matches how DuckDB reads the same naive column;
    *   - TIMESTAMP: already the session type.
    */
  private def adaptTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        sys.error(s"events.ts: unsupported type $other — expected " +
          "INT64 epoch-nanos, TIMESTAMP(NANOS), TIMESTAMP_NTZ, or TIMESTAMP")
    }

  /** Batch read of the events table, schema-adaptive (see [[adaptTs]]). */
  def readBatch(spark: SparkSession, dir: String): DataFrame = {
    prepareSession(spark, s"$dir/events.parquet")
    adaptTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Streaming read over the event parquet files. The schema must be
    * pinned to the RAW file schema (pinning the post-transform schema
    * would make the parquet reader reject a nanos column) and the same
    * [[adaptTs]] normalization as [[readBatch]] is applied on top, so
    * batch and stream plans see identical frames.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    prepareSession(spark, s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source only accepts directories; filter the
    // events file out of the shared fixtures dir by name
    adaptTs(spark.readStream.schema(raw)
      .format("parquet")
      .option("pathGlobFilter", "events.parquet")
      .load(dir))
  }

  /** Execute a streaming frame as a REAL StreamingQuery (memory sink, one
    * micro-batch drain) and return the sink contents as a batch frame.
    * Gate queries route through this so the driver's DuckDB oracle
    * verifies the Structured Streaming path end-to-end, not just the
    * batch twin.
    */
  def runToMemorySink(streamed: DataFrame, outputMode: String,
      statePartitions: Int = 8): DataFrame = {
    val name = "ev_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // Stateful operators open one state store PER shuffle partition per
    // batch (a stream-stream join opens four), so the session's batch
    // shuffle width is pure fixed overhead for a bounded drain — scope it
    // down for the query's lifetime. The first micro-batch pins the width
    // in the offset log, so restoring AFTER stop() is safe; queries here
    // run sequentially (same assumption readBatch documents for
    // nanosAsLong). At production scale the width is sized to state
    // volume, not to this local drain.
    val sess = streamed.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val old = sess.conf.get(key)
    sess.conf.set(key, statePartitions.toString)
    val q = streamed.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    try q.processAllAvailable()
    finally { q.stop(); sess.conf.set(key, old) }
    streamed.sparkSession.table(name)
  }

  /** Windowed aggregation over the event stream (gate `ev_stream_window`). */
  def runWindowedAggStream(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(WindowedEventAgg()(readStream(spark, dir)), "complete")

  /** At-least-once dedup over the event stream (gate `ev_stream_dedup`). */
  def runDedupStream(spark: SparkSession, dir: String,
      keys: Seq[String], watermark: String): DataFrame =
    runToMemorySink(
      StreamingDedupPipe(keys, watermark = watermark)(readStream(spark, dir)),
      "append")

  /** Stream-static enrichment over the event stream (gate
    * `ev_stream_enrich`): events joined to the customer dimension inside
    * a REAL StreamingQuery.
    */
  def runEnrichStream(spark: SparkSession, dir: String): DataFrame = {
    val dim = spark.read.parquet(s"$dir/customer.parquet")
    runToMemorySink(
      StreamStaticEnrichPipe(dim, "user_id", "c_custkey",
        Seq("c_mktsegment", "c_acctbal"))(readStream(spark, dir)),
      "append")
  }

  /** Watermarked stream-stream interval join (gate `ev_stream_join`): the
    * streaming twin of [[graft.operators.RangeJoin]] — clicks matched to
    * same-user error events whose 30-minute incident window contains the
    * click. Both sides carry watermarks and the join condition bounds
    * event-time distance, so Structured Streaming can expire state: state
    * per key is bounded by (watermark + interval), never the stream
    * length. The batch twin (identical frames, identical condition) is
    * what the DuckDB inequality-join oracle checks; the gate runs the
    * streaming plan for real.
    */
  def streamStreamIntervalJoin(clicks: DataFrame, errors: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermark)
             else clicks)
      .select(col("event_id").as("c_eid"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"))
    val e = (if (errors.isStreaming) errors.withWatermark("ts", watermark)
             else errors)
      .select(col("event_id").as("err_id"), col("user_id").as("e_uid"),
        col("ts").as("e_ts"))
    c.join(e, col("c_uid") === col("e_uid") &&
      col("c_ts") >= col("e_ts") &&
      col("c_ts") <= col("e_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_eid").as("event_id"), col("c_uid").as("user_id"),
        unix_micros(col("c_ts")).as("ts_us"), col("err_id"),
        unix_micros(col("e_ts")).as("wstart"))
  }

  def runStreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    def side(tpe: String) =
      readStream(spark, dir).filter(col("event_type") === tpe)
    runToMemorySink(
      streamStreamIntervalJoin(side("click"), side("error")), "append")
  }

  /** Streaming read of any single-file fixture table (schema pinned from
    * a batch read; the glob filter matches FILE names, so the table must
    * be one file, as the driver fixtures are).
    */
  def readStreamTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    val path = s"$dir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    // A table may be a single file (driver fixtures) or a directory of
    // part files (Spark-written fixtures, e.g. the sf1 embeddings).
    // pathGlobFilter matches LEAF file names, so the single-file layout
    // needs it to isolate the table inside `dir`; a directory is loaded
    // directly — its part files wouldn't match the table-name glob.
    // Hadoop FS API, not java.io.File: the layout check must hold on
    // HDFS/S3 paths too, where a local-File probe would always say
    // "not a directory" and the glob branch would load zero files.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath) && fs.getFileStatus(hPath).isDirectory)
      spark.readStream.schema(schema).format("parquet").load(path)
    else
      spark.readStream.schema(schema).format("parquet")
        .option("pathGlobFilter", s"$table.parquet")
        .load(dir)
  }

  /** Decontamination on the stream (gate `ev_stream_decontam`): arriving
    * documents flagged against the static eval corpus inside a REAL
    * StreamingQuery — stateless per-row overlap, so append mode emits
    * every row exactly once.
    */
  def runDecontaminateStream(spark: SparkSession, dir: String): DataFrame = {
    val docs = readStreamTable(spark, dir, "documents").select("doc_id", "text")
    val eval = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 30).select("doc_id", "text")
    runToMemorySink(
      StreamingDecontaminate(docs, eval, "text", "doc_id", ngramSize = 4),
      "append")
  }

  /** Overlap-fraction decontamination on the stream (gate
    * `ev_stream_overlap_frac`): the GPT-3/PaLM fractional protocol on
    * ARRIVING documents — the same planted partial-contamination frame
    * as the batch gate (eval tokens appended to doc_id % 7 == 3 via a
    * stateless broadcast stream-static join), then
    * [[StreamingDecontaminate.fraction]]'s pure per-row projection:
    * counts, bp, and flag bit-identical to the batch pipe and oracle.
    */
  def runOverlapFractionStream(spark: SparkSession, dir: String): DataFrame = {
    val docs = readStreamTable(spark, dir, "documents").select("doc_id", "text")
    val eval = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 30).select("doc_id", "text")
    val evalSide = eval.select(col("doc_id").as("__eid__"),
      col("text").as("__etext__"))
    val planted = docs.withColumn("__eid__", col("doc_id") % 30)
      .join(org.apache.spark.sql.functions.broadcast(evalSide), Seq("__eid__"))
      .withColumn("text", when(col("doc_id") % 7 === 3,
        concat(col("text"), lit(" "), concat_ws(" ",
          slice(graft.llm.TextAnalysisOps.toks(col("__etext__")), 1, 40))))
        .otherwise(col("text")))
      .drop("__eid__", "__etext__")
    runToMemorySink(
      StreamingDecontaminate.fraction(planted, eval, "text", "doc_id",
        ngramSize = 8, thresholdBp = 2000),
      "append")
  }

  /** Domain-mixture expansion on INGEST (gate `ev_stream_domain_mixture`):
    * arriving documents are replicated per the standing quota plan inside
    * a REAL StreamingQuery. The plan (per-domain full-epoch counts +
    * partial-epoch thresholds) is built ONCE from the static corpus —
    * per-domain counts are corpus statistics a mixing deployment knows
    * up front, the same premise as the decontamination eval literal —
    * and the stream side is [[graft.llm.DomainMixturePipe.expand]]'s
    * stateless broadcast join + bounded explode: append mode, ZERO
    * streaming state, every arriving row emits its copies exactly once,
    * rows/epochs bit-identical to the batch pipe — the SAME oracle
    * replays it.
    */
  def runDomainMixtureStream(spark: SparkSession, dir: String): DataFrame = {
    val statics = spark.read.parquet(s"$dir/documents.parquet")
    // ONE corpus scan: the per-domain count aggregate (a |domains|-row
    // frame, localCheckpoint'd so micro-batch re-plans reuse it) also
    // yields the gate's budget = |corpus| — no second count() pass
    val counts = graft.llm.DomainMixturePipe.domainCounts(statics, "source")
      .localCheckpoint()
    // coalesce: sum over an empty counts frame is NULL, and an empty
    // corpus should mean budget 0 (pipe emits nothing), not an NPE
    val budget = counts.agg(coalesce(sum("__mx_n__"), lit(0L)))
      .first().getLong(0)
    val plan = graft.llm.DomainMixturePipe.quotaPlanFromCounts(
      counts, graft.llm.DomainMixturePipe.fixtureGateWeights, budget,
      maxRepeat = 3).localCheckpoint()
    val docs = readStreamTable(spark, dir, "documents")
      .select("doc_id", "source")
    runToMemorySink(
      graft.llm.DomainMixturePipe.expand(docs, plan, "doc_id", "source",
        seed = 23L, epochCol = "epoch"),
      "append")
  }

  /** Weighted sampling on the stream (gate `ev_stream_weighted_sample`):
    * documents flow through [[StreamingWeightedSample]] inside a REAL
    * StreamingQuery; the final reservoir must be BIT-IDENTICAL to the
    * batch [[graft.llm.WeightedSamplePipe]] top-120 — same deterministic
    * key, so the same oracle replays it.
    */
  def runWeightedSampleStream(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = java.nio.file.Files
      .createTempDirectory("ws-stream").toString
    val proto = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    StreamingWeightedSample.seed(proto, stateDir, "n_chars", "doc_id")
    val docs = readStreamTable(spark, dir, "documents")
      .select("doc_id", "n_chars")
    val q = StreamingWeightedSample.run(docs, stateDir, "doc_id", "n_chars",
      k = 120, checkpointDir = s"$stateDir-ckpt")
    try q.processAllAvailable() finally q.stop()
    StreamingWeightedSample.latest(spark, stateDir).get
  }

  /** Count-min accumulation on the stream (gate `ev_stream_heavy_ngrams`):
    * documents flow through [[StreamingCountMin]] inside a REAL
    * StreamingQuery; the accumulated sketch then drives the exact
    * heavy-hitter second pass over the same corpus — the result must
    * equal the all-batch gate `hh_heavy_ngrams` (same GROUP BY HAVING
    * oracle), proving sketch-on-ingest loses nothing.
    */
  def runHeavyNgramsStream(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = java.nio.file.Files
      .createTempDirectory("cms-stream").toString
    StreamingCountMin.seed(spark, s"$stateDir/t")
    val docs = readStreamTable(spark, dir, "documents").select("text")
    val q = StreamingCountMin.run(docs, s"$stateDir/t", "text",
      ngramSize = 2, depth = 4, width = 512,
      checkpointDir = s"$stateDir/ckpt")
    try q.processAllAvailable() finally q.stop()
    val sk = StreamingCountMin.latest(spark, s"$stateDir/t").get
    graft.llm.HeavyHitterPipe.withSketch(
      spark.read.parquet(s"$dir/documents.parquet"), sk, "text",
      ngramSize = 2, minCount = 35L, depth = 4, width = 512)
  }

  /** Bloom-bitmap decontamination on the stream (gate
    * `ev_stream_bloom_decontam`): the eval side compressed to a 2^20-bit
    * bitmap before the stream starts, arriving documents probe it inside
    * a REAL StreamingQuery — map-only, zero state, append mode emits
    * every row exactly once. Same n=4 and eval split as the batch gate
    * `cu_bloom_decontam`, so the same bit-exact oracle replays it.
    */
  def runBloomDecontaminateStream(spark: SparkSession, dir: String): DataFrame = {
    val docs = readStreamTable(spark, dir, "documents").select("doc_id", "text")
    val eval = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 30).select("doc_id", "text")
    runToMemorySink(
      StreamingDecontaminate.bloom(docs, eval, "text", "doc_id",
        ngramSize = 4),
      "append")
  }

  /** Near-dup pairs discovered ON THE STREAM (gate `ev_stream_neardup`):
    * documents (with the dd_minhash_lsh plants, stream-unioned) flow
    * through [[StreamingNearDedup]] inside a REAL StreamingQuery; event
    * time is synthesized from doc_id so the single drain holds every doc
    * inside one watermark window and the pair set equals the batch LSH
    * semantics the DuckDB oracle replays (watermark EVICTION is the
    * multi-batch spec's job — an oracle can't see state internals).
    */
  def runNearDedupStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = readStreamTable(spark, dir, "documents").select("doc_id", "text")
    val toks = split(col("text"), " ")
    val mutated = readStreamTable(spark, dir, "documents")
      .filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
          .as("text"))
    // +1 day: a row whose event time is EXACTLY the initial watermark (0,
    // the epoch) is filtered as late before the stateful operator — doc 0
    // silently lost every pair until the timeline moved off the origin
    val planted = raw.unionByName(mutated)
      .withColumn("ts", timestamp_micros((col("doc_id") + 86400L) * 1000000L))
    runToMemorySink(
      StreamingNearDedup(planted, "text", "doc_id", "ts",
        watermark = "10 hours").toDF(),
      "append")
  }

  /** [[runNearDedupStream]] with the pair dedup INSIDE the StreamingQuery:
    * two chained stateful operators (band-bucket flatMapGroupsWithState →
    * watermark-scoped `dropDuplicatesWithinWatermark` on the pair keys),
    * so the emitted table is already unique — the executable form of the
    * per-band-emission contract (gate `ev_stream_neardup_unique`).
    */
  def runNearDedupUniqueStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = readStreamTable(spark, dir, "documents").select("doc_id", "text")
    val toks = split(col("text"), " ")
    val mutated = readStreamTable(spark, dir, "documents")
      .filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
          .as("text"))
    val planted = raw.unionByName(mutated)
      .withColumn("ts", timestamp_micros((col("doc_id") + 86400L) * 1000000L))
    StreamingNearDedup.withChainedStatefulQuery(spark) {
      runToMemorySink(
        StreamingNearDedup.unique(
          StreamingNearDedup(planted, "text", "doc_id", "ts",
            watermark = "10 hours"),
          watermark = "10 hours"),
        "append")
    }
  }

  /** Stream-vs-corpus near-dup flagging inside a REAL StreamingQuery
    * (gate `ev_stream_corpus_dedup`): arriving mutated documents checked
    * against the static corpus via [[StreamingCorpusDedup]] — stateless
    * stream-static joins, corpus signatures from the shared per-corpus
    * cache (the same frames dd_incremental builds).
    */
  def runCorpusDedupStream(spark: SparkSession, dir: String): DataFrame = {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val toks = split(col("text"), " ")
    val arriving = readStreamTable(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
          .as("text"))
    runToMemorySink(
      StreamingCorpusDedup(arriving, "text", "doc_id",
        corpus, "text", "doc_id", jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/incdedup")),
      "append")
  }

  /** Stream-vs-corpus SEMANTIC dedup (gate `ev_stream_semdedup`):
    * arriving mutated embeddings checked against the static corpus
    * within their centroid cell — SemDeDup's cell scoping as a
    * stream-static inner equi-join, zero streaming state; append mode
    * emits every finding exactly once. Same plant as the batch
    * cu_semdedup_contam gate, so the SAME oracle replays both.
    */
  def runSemDeDupStream(spark: SparkSession, dir: String): DataFrame = {
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 200).select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val arriving = readStreamTable(spark, dir, "embeddings")
      .filter(col("vec_id") < 40)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x.cast("double") + ((i % 5) - 2) * 0.01).as("embedding"))
    runToMemorySink(
      graft.llm.SemDeDupPipe.crossCellPairs(arriving, corpus,
        "embedding", "vec_id", "embedding", "vec_id",
        graft.llm.ClusterBalancedSamplePipe.formulaCentroids(16, 64),
        tau = 0.9),
      "append")
  }
}

/** Stream-static enrichment join: attach dimension attributes to a fact
  * stream (or batch frame — the pipe is twin-agnostic like every other
  * streaming pipe here). The static side is re-read per micro-batch by
  * Structured Streaming, stays broadcast by default (dimensions are small
  * next to a 100 TB fact feed — the join is then map-only and STATELESS,
  * no streaming state at all), and a left join keeps facts whose key has
  * no dimension row yet (late dimension upserts are the static side's
  * problem, not the stream's).
  */
case class StreamStaticEnrichPipe(
    staticDf: DataFrame,
    leftKey: String,
    rightKey: String,
    staticCols: Seq[String],
    broadcastStatic: Boolean = true) extends Pipe {
  override def update: Boolean = true
  override def params = Map("leftKey" -> leftKey, "rightKey" -> rightKey,
    "cols" -> staticCols.mkString(","),
    "broadcastStatic" -> broadcastStatic.toString)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val dim = staticDf.select((rightKey +: staticCols).map(qcol): _*)
    val probe = if (broadcastStatic) broadcast(dim) else dim
    df.join(probe, qcol(leftKey) === qcol(rightKey), "left")
      .drop(rightKey)
  }
}

/** Exact dedup for at-least-once delivery: duplicate rows (by `keys`)
  * arriving within the `watermark` delay bound are dropped, with state
  * expiring as event time advances — `dropDuplicatesWithinWatermark`, the
  * unbounded-stream-safe form (plain streaming dropDuplicates without the
  * event-time column in its keys would accrete state forever). Output is
  * the key columns (first-seen rows' payloads are delivery-order-dependent
  * and so never deterministic on a parallel source).
  *
  * On a batch frame the same pipe is a distinct over the keys, so one
  * DuckDB `SELECT DISTINCT` oracle verifies both twins — provided the
  * fixture's duplicates all recur within the watermark bound (at scale,
  * the watermark is exactly the delivery-delay SLA, so that is the
  * contract anyway).
  */
case class StreamingDedupPipe(
    keys: Seq[String],
    tsCol: String = "ts",
    watermark: String = "2 hours") extends Pipe {
  override def params = Map("keys" -> keys.mkString(","),
    "ts" -> tsCol, "watermark" -> watermark)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val out =
      if (df.isStreaming)
        df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
      else df.dropDuplicates(keys)
    out.select(keys.map(qcol): _*)
  }
}

/** Tumbling event-time window aggregation; on a streaming frame the
  * watermark bounds state. Works identically on batch frames (watermark
  * is a no-op there), so the duckdb `time_bucket` oracle verifies both.
  */
case class WindowedEventAgg(
    tsCol: String = "ts",
    windowLength: String = "1 hour",
    watermark: String = "2 hours",
    groupKeys: Seq[String] = Seq("event_type")) extends Pipe {
  override def params = Map("ts" -> tsCol, "window" -> windowLength,
    "watermark" -> watermark, "keys" -> groupKeys.mkString(","))
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val in = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    in.groupBy(window(qcol(tsCol), windowLength) +: groupKeys.map(qcol): _*)
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws") +:
          groupKeys.map(qcol) :+ col("cnt") :+ col("sv"): _*)
  }
}

/** Gap-timeout sessionization per key: a new session starts when the gap
  * to the previous event exceeds `gapSeconds`. Batch lowering = lag +
  * running sum over a per-key window (shuffles once by key; keys hash
  * uniformly at scale). A streaming deployment swaps this pipe for
  * `flatMapGroupsWithState` with identical session semantics — see
  * [[SessionizeStreaming]].
  */
case class SessionizePipe(
    keyCol: String = "user_id",
    tsCol: String = "ts",
    gapSeconds: Long = 1800) extends Pipe {
  override def update: Boolean = true
  override def params = Map("key" -> keyCol, "ts" -> tsCol,
    "gap" -> gapSeconds.toString)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(qcol(keyCol)).orderBy(qcol(tsCol))
    // exact microseconds: unix_timestamp() truncates to whole seconds, so a
    // gap straddling the threshold only when fractions count would split
    // sessions differently from a fractional-epoch oracle (round-2 hash
    // fail). Ties on equal ts are harmless: gap 0 never opens a session.
    val us = unix_micros(qcol(tsCol))
    val gap = us - lag(us, 1).over(w)
    val newSession =
      when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }
}

/** Streaming sessionization with explicit state:
  * `flatMapGroupsWithState`-based per-key session tracking. Provided as
  * the streaming twin of [[SessionizePipe]]; emits (key, session_start,
  * session_end, n_events) per closed session.
  */
object SessionizeStreaming {
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
  import org.apache.spark.sql.{Dataset, Encoders}

  case class Event(key: Long, tsMicros: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(key: Long, start: Long, end: Long, n: Long)

  def apply(events: Dataset[Event], gapSeconds: Long): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessionState]
    implicit val ce = Encoders.product[ClosedSession]
    val gapMicros = gapSeconds * 1000000L
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.tsMicros)
          var closed = List.empty[ClosedSession]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            st match {
              case null => st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s if e.tsMicros - s.last > gapMicros =>
                closed ::= ClosedSession(key, s.start, s.last, s.n)
                st = SessionState(e.tsMicros, e.tsMicros, 1)
              case s => st = SessionState(s.start, e.tsMicros, s.n + 1)
            }
          }
          if (st != null) state.update(st)
          closed.reverseIterator
      }
  }
}
