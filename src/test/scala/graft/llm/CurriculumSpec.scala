package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private def slot(id: Long, seed: Long = 29L): Long = {
    val s1 = (id * 131 + seed) % P
    ((BigInt(s1) * s1 + s1) % P).toLong
  }

  test("rank-exact buckets and within-phase shuffle, hand-computed") {
    // score = 7 - id, so ascending score order is descending id:
    // rank(id) = 7 - id, bucket = rank*4 div 8
    val df = (0L until 8L).map(id => (id, 7L - id)).toDF("id", "score")
    val out = CurriculumOrderPipe("id", "score")(df)
      .select("id", "curriculum_bucket", "curriculum_pos")
      .as[(Long, Long, Long)].collect()
    val buckets = out.map(r => r._1 -> r._2).toMap
    assert(buckets == Map(7L -> 0L, 6L -> 0L, 5L -> 1L, 4L -> 1L,
      3L -> 2L, 2L -> 2L, 1L -> 3L, 0L -> 3L))
    // positions are the exact (bucket, slot, id) order, a 0..n-1 perm
    val expectedOrder = (0L until 8L)
      .sortBy(id => (buckets(id), slot(id), id))
    val posOf = out.map(r => r._1 -> r._3).toMap
    assert(expectedOrder.zipWithIndex.forall { case (id, p) =>
      posOf(id) == p.toLong
    }, s"pos map $posOf vs expected $expectedOrder")
  }

  test("phases are equal-population and quality ascends phase by phase") {
    val docs = spark.read.parquet(sf("documents"))
    val out = CurriculumOrderPipe("doc_id", "n_chars")(docs)
    val sizes = out.groupBy("curriculum_bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.toSet == Set(125L), sizes.toString) // 500/4 exact
    // every score in phase k is <= every score in phase k+1
    val maxMin = out.groupBy("curriculum_bucket")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
      .orderBy("curriculum_bucket")
      .as[(Long, Long, Long)].collect()
    maxMin.sliding(2).foreach { case Array((_, _, hi), (_, lo2, _)) =>
      assert(hi <= lo2, "phase quality must ascend")
    }
    // within a phase the read order is the shuffle, not the score order:
    // adjacent-position score inversions must exist
    val phase0 = out.filter($"curriculum_bucket" === 0)
      .orderBy("curriculum_pos").select("n_chars").as[Long].collect()
    val inversions = phase0.sliding(2).count { case Array(a, b) => a > b }
    assert(inversions > phase0.length / 10,
      s"phase read order looks score-sorted ($inversions inversions)")
  }

  test("deterministic and partitioning-invariant; ties broken by id") {
    val tied = (0L until 20L).map(id => (id, id % 3)).toDF("id", "score")
    val pipe = CurriculumOrderPipe("id", "score", buckets = 5)
    def run(df: org.apache.spark.sql.DataFrame) =
      pipe(df).select("id", "curriculum_bucket", "curriculum_pos")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(tied) == run(tied.repartition(7)))
  }

  test("config refusals") {
    intercept[IllegalArgumentException] {
      CurriculumOrderPipe("id", "score", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      CurriculumOrderPipe("id", "score", buckets = 1001)
    }
    // a string id would cast to NULL slots and silently degrade the
    // within-phase shuffle to id order — refused at plan time
    val strIds = Seq(("u1", 1L), ("u2", 2L)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      CurriculumOrderPipe("id", "score")(strIds)
    }
  }
}
