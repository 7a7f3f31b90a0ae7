package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates are one-sided and exact without collisions") {
    val occ = Seq.fill(50)("a b") ++ Seq.fill(7)("c d") ++ Seq("e f")
    val df = occ.toDF("gram").withColumn("h", xxhash64(col("gram")))
    val sk = CountMinOps.sketch(df, "h", depth = 4, width = 1 << 12)
    // sketch is bounded: at most depth*width rows, here <= 4*3 distinct
    assert(sk.count() <= 12)
    val est = CountMinOps.withEstimate(df.distinct(), "h", sk, 4, 1 << 12)
      .select("gram", "cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // wide sketch, 3 keys: no collisions — estimates are exact
    assert(est == Map("a b" -> 50L, "c d" -> 7L, "e f" -> 1L), est)
    // a tiny width FORCES collisions: estimates may only grow
    val sk2 = CountMinOps.sketch(df, "h", depth = 2, width = 2)
    val est2 = CountMinOps.withEstimate(df.distinct(), "h", sk2, 2, 2)
      .select("gram", "cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.forall { case (g, n) => est2(g) >= n }, est2)
    // an unseen key estimates from whatever hashed into its buckets —
    // still >= its true count of 0
    val unseen = Seq("zz qq").toDF("gram")
      .withColumn("h", xxhash64(col("gram")))
    val eu = CountMinOps.withEstimate(unseen, "h", sk, 4, 1 << 12)
      .select("cms_est").head().getLong(0)
    assert(eu >= 0L)
  }

  test("heavy hitters equal exact GROUP BY HAVING even under forced collisions") {
    val docs = spark.read.parquet(sf("documents"))
    val exact = docs
      .select(explode(CurationOps.wordNgrams(
        TextAnalysisOps.toks(col("text")), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= 5)
      .collect().map(_.toString).sorted.toSeq
    // width=64 on this corpus guarantees heavy collisions; the two-pass
    // pipe must still return exactly the true heavy hitters
    val got = HeavyHitterPipe("text", ngramSize = 2, minCount = 5L,
      depth = 3, width = 64)(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("sketch linearity: merge of per-shard sketches equals the whole-corpus sketch") {
    val docs = spark.read.parquet(sf("documents"))
    val occ = docs.select(col("doc_id"),
        explode(CurationOps.wordNgrams(
          TextAnalysisOps.toks(col("text")), 2)).as("gram"))
      .withColumn("h", xxhash64(col("gram")))
    val whole = CountMinOps.sketch(occ, "h", 4, 1 << 10)
      .collect().map(_.toString).sorted.toSeq
    val shardA = CountMinOps.sketch(occ.filter(col("doc_id") % 3 === 0), "h", 4, 1 << 10)
    val shardB = CountMinOps.sketch(occ.filter(col("doc_id") % 3 === 1), "h", 4, 1 << 10)
    val shardC = CountMinOps.sketch(occ.filter(col("doc_id") % 3 === 2), "h", 4, 1 << 10)
    val merged = CountMinOps.merge(shardA, shardB, shardC)
      .collect().map(_.toString).sorted.toSeq
    assert(merged == whole)
  }

  test("streaming CMS accumulation equals the one-batch sketch; replay guarded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(sf("documents")).select("text")
    val whole = CountMinOps.sketch(
      HeavyHitterPipe.gramOccurrences(docs, "text", 2), "__hh_h__", 4, 1 << 10)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    graft.streaming.StreamingCountMin.seed(spark, s"$dir/t")
    val mem = MemoryStream[String]
    val q = graft.streaming.StreamingCountMin.run(
      mem.toDF.toDF("text"), s"$dir/t", "text", 2, 4, 1 << 10,
      s"$dir/ckpt")
    val rows = docs.as[String].collect().toSeq
    rows.grouped((rows.size + 2) / 3).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = graft.streaming.StreamingCountMin.latest(spark, s"$dir/t")
      .get.collect().map(_.toString).sorted.toSeq
    assert(streamed == whole)
    // a replayed id is a no-op (no double count)...
    graft.streaming.StreamingCountMin.applyBatch(
      rows.take(5).toDF("text"), 2L, s"$dir/t", "text", 2, 4, 1 << 10)
    val after = graft.streaming.StreamingCountMin.latest(spark, s"$dir/t")
      .get.collect().map(_.toString).sorted.toSeq
    assert(after == whole)
    // ...and a behind-id (fresh checkpoint) throws instead of double-counting
    intercept[IllegalStateException] {
      graft.streaming.StreamingCountMin.applyBatch(
        rows.take(5).toDF("text"), 0L, s"$dir/t", "text", 2, 4, 1 << 10)
    }
    // the streamed sketch drives the exact second pass to the same
    // result as the all-batch pipe
    val viaStream = HeavyHitterPipe.withSketch(
      spark.read.parquet(sf("documents")),
      graft.streaming.StreamingCountMin.latest(spark, s"$dir/t").get,
      "text", 2, 5L, 4, 1 << 10)
      .collect().map(_.toString).sorted.toSeq
    val viaBatch = HeavyHitterPipe("text", 2, 5L, 4, 1 << 10)(
      spark.read.parquet(sf("documents")))
      .collect().map(_.toString).sorted.toSeq
    assert(viaStream == viaBatch && viaBatch.nonEmpty)
  }

  test("estimate side is map-only: broadcast joins, no shuffle of the probed frame") {
    val docs = spark.read.parquet(sf("documents"))
    val occ = docs.select(explode(CurationOps.wordNgrams(
        TextAnalysisOps.toks(col("text")), 2)).as("gram"))
      .withColumn("h", xxhash64(col("gram")))
    val sk = CountMinOps.sketch(occ, "h", 4, 1 << 10).localCheckpoint(true)
    val plan = CountMinOps.withEstimate(occ, "h", sk, 4, 1 << 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges are the broadcast ones — no shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
