package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDeDupCrossSpec extends SparkSpec {
  import spark.implicits._

  test("cross-corpus semantic contamination: hand-built cells, cross pairs only") {
    // centroids (1,0),(0,1); τ = 0.95
    val corpus = Seq(
      (1L, Seq(10.0, 0.0)), // cell 0
      (2L, Seq(0.0, 3.0)),  // cell 1
      (3L, Seq(0.5, -0.5))  // cell 0
    ).toDF("vec_id", "embedding")
    val train = Seq(
      (101L, Seq(5.0, 0.0)),  // cell 0: cosine 1.0 with corpus 1 → hit
      (102L, Seq(0.0, 7.0)),  // cell 1: cosine 1.0 with corpus 2 → hit
      (103L, Seq(2.0, 2.0)),  // cell 0 (tie→first): ~0.7 w/ everything → clean
      (104L, Seq(0.1, 9.9))   // cell 1: vs corpus 2 cosine ~0.9999 → hit
    ).toDF("vec_id", "embedding")
    val out = CrossCorpusSemDeDupPipe(corpus, "embedding", "vec_id",
      "embedding", "vec_id", Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), tau = 0.95)(train)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((101L, 1L), (102L, 2L), (104L, 2L)))
  }

  test("streaming twin equals the batch pipe pair-for-pair on real embeddings") {
    val d = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 200).select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val arriving = corpus.filter(col("vec_id") < 40).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding"))
    val cents = ClusterBalancedSamplePipe.formulaCentroids(16, 64)
    val batch = CrossCorpusSemDeDupPipe(corpus, "embedding", "vec_id",
      "embedding", "vec_id", cents, tau = 0.9)(arriving)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val streamed = graft.streaming.EventStream.runSemDeDupStream(spark, d)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
    assert(batch.nonEmpty)
    // every finding is a mutant meeting its own original
    assert(batch.forall { case (a, b) => a == b + 10000 })
  }
}
