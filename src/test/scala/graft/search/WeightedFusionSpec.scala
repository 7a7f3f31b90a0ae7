package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedFusionSpec extends SparkSpec {
  import spark.implicits._

  test("min-max normalization within each list, weighted sum across") {
    // A: scores 10, 5, 0 for docs 1, 2, 3 -> normalized 1.0, 0.5, 0.0
    // B: scores 2, 1 for docs 3, 1 -> normalized 1.0, 0.0
    val df = Seq((Seq(1L, 2L, 3L), Seq(10.0, 5.0, 0.0),
      Seq(3L, 1L), Seq(2.0, 1.0)))
      .toDF("ai", "as", "bi", "bs")
    val (idx, score) = SearchResultOps.minMaxFuse(Seq(
      (col("ai"), col("as"), 0.7), (col("bi"), col("bs"), 0.3)))
    val row = df.select(idx.as("i"), score.as("s")).head()
    val fused = row.getSeq[Long](0).zip(row.getSeq[Double](1)).toMap
    assert(math.abs(fused(1L) - (0.7 * 1.0 + 0.3 * 0.0)) < 1e-12)
    assert(math.abs(fused(2L) - 0.7 * 0.5) < 1e-12)
    assert(math.abs(fused(3L) - (0.7 * 0.0 + 0.3 * 1.0)) < 1e-12)
    assert(row.getSeq[Long](0) == Seq(1L, 2L, 3L))
  }

  test("degenerate single-candidate list normalizes to 1") {
    val df = Seq((Seq(7L, -1L), Seq(42.0, Double.NegativeInfinity)))
      .toDF("ai", "as")
    val (idx, score) = SearchResultOps.minMaxFuse(Seq((col("ai"), col("as"), 0.5)))
    val row = df.select(idx.as("i"), score.as("s")).head()
    assert(row.getSeq[Long](0) == Seq(7L))
    assert(math.abs(row.getSeq[Double](1).head - 0.5) < 1e-12)
  }

  test("weight count must match engine count") {
    intercept[IllegalArgumentException] {
      WeightedFusionPipe(Seq(TopkEngine()), Seq(0.5, 0.5))
    }
  }
}
