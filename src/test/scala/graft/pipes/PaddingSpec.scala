package graft.pipes

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L6 padding-scope semantics (r9 verdict "What's missing" №1): global
  * mode pads every row to the corpus max (unchanged, gate-compatible);
  * perGroup mode reproduces the reference's per-BATCH max
  * (collate.py:137-178) so one pathological row inflates only its own
  * batch, never the corpus.
  */
class PaddingSpec extends SparkSpec {
  import spark.implicits._

  // ids 1..6 with lengths 1,2,3,1,2,9 — row 6 is the "pathological" one
  private def frame = Seq(
    (1L, Seq(1)), (2L, Seq(1, 2)), (3L, Seq(1, 2, 3)),
    (4L, Seq(4)), (5L, Seq(4, 5)), (6L, Seq.range(0, 9)))
    .toDF("id", "input_ids")

  private def lens(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select(col("id"), size(col("input_ids")).as("n"))
      .as[(Long, Int)].collect().toMap

  test("global scope pads every row to the corpus max (unchanged semantics)") {
    val out = PaddingPipe(Seq("input_ids"))(frame)
    assert(lens(out).values.toSet == Set(9))
    // right-padded with the pad token, prefix preserved
    val r3 = out.filter(col("id") === 3)
      .select(col("input_ids")).as[Seq[Int]].head()
    assert(r3 == Seq(1, 2, 3, 0, 0, 0, 0, 0, 0))
  }

  test("perGroup scope pads to the BATCH max: the outlier inflates only its own batch") {
    val out = PaddingPipe(Seq("input_ids"),
      scope = PadScope.PerGroup(batchSize = 3, orderCol = "id"))(frame)
    // batch 0 = ids 1-3 (max len 3), batch 1 = ids 4-6 (max len 9)
    assert(lens(out) == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 9, 5L -> 9, 6L -> 9))
    val r1 = out.filter(col("id") === 1)
      .select(col("input_ids")).as[Seq[Int]].head()
    assert(r1 == Seq(1, 0, 0))
  }

  test("perGroup respects special padding tokens and mask defaults") {
    val masked = frame
      .withColumn("attention_mask", transform(col("input_ids"), _ => lit(1)))
    val out = PaddingPipe(Seq("input_ids", "attention_mask"), padTokenId = 7,
      scope = PadScope.PerGroup(batchSize = 3, orderCol = "id"))(masked)
    val (ids, mask) = out.filter(col("id") === 1)
      .select(col("input_ids"), col("attention_mask"))
      .as[(Seq[Int], Seq[Int])].head()
    assert(ids == Seq(1, 7, 7))   // pad token fills input_ids
    assert(mask == Seq(1, 0, 0))  // masks always pad with 0
  }
}
