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
