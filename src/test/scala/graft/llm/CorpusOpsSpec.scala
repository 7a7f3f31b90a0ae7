package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic shuffle: a permutation, stable across runs and plans") {
    val docs = spark.read.parquet(sf("documents"))
    val a = DeterministicShufflePipe("doc_id")(docs)
    // same rows, nothing dropped or duplicated
    assert(a.count() == docs.count())
    assert(a.select("doc_id").except(docs.select("doc_id")).count() == 0)
    // identical slot assignment on a re-run and under a different layout
    val b = DeterministicShufflePipe("doc_id")(docs.repartition(13))
    assert(a.select("doc_id", "shuffle_slot")
      .except(b.select("doc_id", "shuffle_slot")).count() == 0)
    // actually mixes: adjacent-pair inversions near the random-permutation
    // expectation (50%), and consecutive ids land far apart in slot space
    val slots = a.select("shuffle_slot").orderBy("doc_id").as[Long]
      .collect().toSeq
    val monotone = slots.sliding(2).count { case Seq(x, y) => y > x }
    assert(monotone > slots.size * 2 / 5 && monotone < slots.size * 3 / 5,
      s"not random-like: $monotone/${slots.size} ascending pairs")
    val close = slots.sliding(2).count { case Seq(x, y) => math.abs(y - x) < 1000 }
    assert(close < slots.size / 10, s"locality survives: $close close pairs")
  }

  test("corpus stats: exact quantiles on a hand-checked group") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10))
      .toDF("g", "v")
    val out = CorpusStatsPipe(Seq("g"), "v", Seq(0.5), approx = false)(df)
      .select("g", "n", "mean", "min", "max", "p50").orderBy("g").collect()
    assert(out(0) == Row("a", 4L, 2.5, 1, 4, 2.5)) // interpolated median
    assert(out(1) == Row("b", 1L, 10.0, 10, 10, 10.0))
  }

  test("approx quantiles track exact within tolerance on real data") {
    val docs = spark.read.parquet(sf("documents"))
    val ex = CorpusStatsPipe(Seq("lang"), "n_chars", approx = false)(docs)
      .select("lang", "p50").withColumnRenamed("p50", "exact")
    val ap = CorpusStatsPipe(Seq("lang"), "n_chars", approx = true)(docs)
      .select("lang", "p50").withColumnRenamed("p50", "approx")
    val bad = ex.join(ap, "lang")
      .filter(abs(col("exact") - col("approx")) > col("exact") * 0.05 + 5)
      .count()
    assert(bad == 0)
  }
}
