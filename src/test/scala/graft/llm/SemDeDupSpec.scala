package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  test("semdedup: hand-built cells, keep-furthest-from-centroid, boundary miss") {
    // centroids (1,0) and (0,1); τ = 0.95
    val df = Seq(
      (1L, Seq(10.0, 0.0)),  // cell 0, cd = 81+0
      (2L, Seq(5.0, 0.0)),   // cell 0, cd = 16; cosine(1,2)=1 → dup of 1
      (3L, Seq(0.0, 3.0)),   // cell 1 singleton
      (4L, Seq(0.5, -0.5)),  // cell 0, cosine ~0.70 with 1/2 → singleton
      (5L, Seq(3.0, 3.01)),  // cell 1 — near-identical to 6 but...
      (6L, Seq(3.01, 3.0))   // ...cell 0: boundary straddle, pair MISSED
    ).toDF("vec_id", "embedding")
    val out = SemDeDupPipe("embedding", "vec_id",
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), tau = 0.95)(df)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((0, 1L, true)))   // furthest from centroid survives
    assert(out(2L) == ((0, 1L, false)))  // nearer dup dropped
    assert(out(3L) == ((1, 3L, true)))
    assert(out(4L) == ((0, 4L, true)))
    // 5 and 6 have cosine ~0.99998 but straddle the cell boundary: both
    // kept as singletons — the paper's documented recall trade
    assert(out(5L) == ((1, 5L, true)))
    assert(out(6L) == ((0, 6L, true)))
  }

  test("semdedup on real embeddings: planted copies pruned, one survivor per group") {
    val raw = spark.read.parquet(sf("embeddings"))
      .filter(col("vec_id") < 200)
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = raw.unionByName(raw.filter(col("vec_id") < 40).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
    val out = SemDeDupPipe("embedding", "vec_id",
      ClusterBalancedSamplePipe.formulaCentroids(16, 64), tau = 0.9)(planted)
    assert(out.count() == planted.count())
    // exactly one survivor per duplicate group
    val bad = out.groupBy("dup_group")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("k"))
      .filter(col("k") =!= 1).count()
    assert(bad == 0)
    // most planted copies co-cluster with their original and get pruned
    // into a 2-member group (a few straddle a cell boundary)
    val twoGroups = out.groupBy("dup_group").count()
      .filter(col("count") === 2).count()
    assert(twoGroups >= 30 && twoGroups <= 40, s"twoGroups=$twoGroups")
  }
}
