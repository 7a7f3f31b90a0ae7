package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceDedupSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed distances; length prune and threshold are lossless") {
    val df = Seq(
      (1L, "b", "kitten"),
      (2L, "b", "sitting"),   // levenshtein(kitten, sitting) = 3
      (3L, "b", "kitten!"),   // 1 edit from kitten
      (4L, "b", "completely different words"), // len gap prunes vs all
      (5L, "c", "kitten")     // other block: never paired with 1
    ).toDF("doc_id", "blk", "text")
    val out = EditDistanceDedupPipe("text", "doc_id", "blk", maxDistance = 3)(df)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("edit_distance")).toMap
    assert(out == Map((1L, 2L) -> 3, (1L, 3L) -> 1, (2L, 3L) -> 3))
  }

  test("equals unbounded levenshtein filter on real planted tail-edits") {
    val docs = spark.read.parquet(sf("documents"))
    val toks = split(col("text"), " ")
    val mutated = docs.filter(col("doc_id") < 30).select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
        .as("text"), col("lang"))
    val planted = docs.select(col("doc_id"), col("text"), col("lang"))
      .unionByName(mutated)
      .withColumn("blk",
        concat_ws("/", col("lang"), substring(trim(col("text")), 1, 8)))
    val fast = EditDistanceDedupPipe("text", "doc_id", "blk",
      maxDistance = 16)(planted)
    // oracle: full cross within block, unbounded levenshtein
    val s2 = planted.select(col("blk"), col("doc_id"), col("text"))
    val slow = s2.toDF("blk", "id_a", "ta")
      .join(s2.toDF("blk", "id_b", "tb"), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("edit_distance", levenshtein(col("ta"), col("tb")))
      .filter(col("edit_distance") <= 16)
      .select("id_a", "id_b", "edit_distance")
    assert(fast.except(slow).count() == 0)
    assert(slow.except(fast).count() == 0)
    assert(fast.count() >= 30) // every planted mutant pairs with its original
  }

  test("hot block fails fast via the maxBlockRows guard") {
    val df = (1 to 100).map(i => (i.toLong, "same", s"text $i"))
      .toDF("doc_id", "blk", "text")
    val e = intercept[Exception] {
      EditDistanceDedupPipe("text", "doc_id", "blk",
        maxBlockRows = Some(50L))(df).count()
    }
    assert(e.getMessage != null)
  }
}
