package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The closed maintenance loop the operators exist for: a drifting ingest
  * piles into one pinned inverted list (addVectors keeps the quantizer),
  * partial-probe recall collapses, the listSizes monitor shows the skew,
  * and REBALANCE recovers recall at the SAME nprobe — measured by
  * [[RecallEval]], not claimed by scaladoc.
  */
class RecallDriftSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(64)(t => (((i * 13 + t * 7) % 19) - 9).toFloat / 9f)

  private val candCfg = SearchConfig(k = 10, fillMaskedIndices = false,
    queryIdCol = Some("qid"))
  private val truthCfg = candCfg.copy(indexField = "truth",
    mergePreviousResults = false)
  private val cents = IVFDenseEngine.formulaCentroids(8, 64)

  test("drifted adds collapse partial-probe recall; rebalance recovers it") {
    // base: spread over the pinned centroids' region; adds: 200 diverse
    // vectors shifted far outside it — under the PINNED quantizer they
    // all collapse into the nearest list (the hot-list failure mode)
    val base = (0 until 100).map(i => (i.toLong, vec(i)))
    val drift = (0 until 200).map(i => (1000L + i, vec(i).map(_ + 10f)))
    val corpus = (base ++ drift).toDF("idx", "vector").localCheckpoint()
    // queries from the BASE region: under dot scoring the +10-shifted
    // vectors dominate their TRUE top-10 (dot gains 10·sum(q) per
    // candidate), but the pinned quantizer hides the whole drifted
    // region inside ONE list whose formula centroid the queries do not
    // rank into their top-2 probes — recall collapses. A retrained
    // quantizer allocates centroids to the drifted mass, those centroids
    // score high for the same queries, and the same nprobe finds the
    // truth again.
    val queries = base.take(12).map { case (id, v) => (id, v) }
      .toDF("qid", "query.vector").localCheckpoint()

    val pinned = IVFDenseEngine(corpus.filter(col("idx") < 100), nlist = 8,
      nprobe = 2, config = candCfg, fixedCentroids = Some(cents))
      .addVectors(corpus.filter(col("idx") >= 1000))
    val maxList = pinned.listSizes.agg(max("count")).head().getLong(0)
    assert(maxList >= 200, "the drifted adds must pile into one pinned list")

    val truth = BruteForceDenseEngine(corpus, truthCfg)
    def meanBp(cand: SearchEngine): Int =
      RecallEval.summary(RecallEval.vs(cand, truth, queries, "qid"))
        .head().getInt(0)

    val before = meanBp(pinned)
    assert(before < 7000,
      s"the pinned quantizer must genuinely lose the drift-dominated " +
        s"truth (got $before bp)")
    // rebalance: seeded KMeans retrain over the full standing index,
    // SAME nprobe — only the quantizer changes
    val rb = pinned.rebalance()
    val after = meanBp(rb)
    val maxAfter = rb.listSizes.agg(max("count")).head().getLong(0)
    assert(maxAfter < maxList,
      s"rebalance must shrink the hot list ($maxList -> $maxAfter)")
    assert(after > before,
      s"rebalance must recover recall at fixed nprobe " +
        s"(before=$before bp, after=$after bp)")
  }

  test("the ORACLE-GATED construction (s41): formula-B rebalance recovers mean recall") {
    // the s41_recall_drift gate's deterministic scenario, pinned here so
    // a formula-B regression fails in tests too (the gate itself only
    // proves both evaluations replay — DuckDB carries the numbers, this
    // carries the recovery claim): real fixture vectors, drift = +10f
    // per component, pinned formula A vs rebalance onto formula B whose
    // centroids 4-7 cover the drifted region.
    val emb = spark.read.parquet(sf("embeddings"))
    val base = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
    val drift = emb.select((col("vec_id") + 100000000L).as("idx"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        v => v + lit(10.0f)).as("vector"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
    val pinned = IVFDenseEngine(base, nlist = 8, nprobe = 2, config = candCfg,
      fixedCentroids = Some(IVFDenseEngine.formulaCentroids(8, 64)))
      .addVectors(drift)
    val truth = BruteForceDenseEngine(base.unionByName(drift), truthCfg)
    def meanBp(cand: SearchEngine): Int =
      RecallEval.summary(RecallEval.vs(cand, truth, queries, "qid"))
        .head().getInt(0)
    val centsB = (0 until 8).map(c => (0 until 64).map(t =>
      (((c * 31 + t * 7) % 17) - 8) * 0.05 + (if (c >= 4) 10.0 else 0.0)))
    val before = meanBp(pinned)
    val after = meanBp(pinned.rebalance(newFixedCentroids = Some(centsB)))
    assert(after > before,
      s"formula-B rebalance must recover mean recall (before=$before bp, " +
        s"after=$after bp) — the s41 gate's oracle replays these numbers")
  }
}
