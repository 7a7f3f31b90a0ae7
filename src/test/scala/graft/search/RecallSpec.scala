package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RecallEval: the first-class recall-measurement operator — exact
  * self-recall, pruned-candidate spread, summary folding, construction
  * refusals, and the short-truth denominator.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(sf("embeddings"))
    .select(col("vec_id").as("idx"), col("embedding").as("vector"),
      col("label"))

  private def queries(n: Int) = spark.read.parquet(sf("embeddings"))
    .filter(col("vec_id") < n)
    .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))

  private val candCfg = SearchConfig(k = 10, fillMaskedIndices = false,
    queryIdCol = Some("qid"))
  private val truthCfg = candCfg.copy(indexField = "truth",
    mergePreviousResults = false)

  test("an exact candidate scores 10000 bp on every query") {
    val per = RecallEval.vs(
      BruteForceDenseEngine(corpus, candCfg),
      BruteForceDenseEngine(corpus, truthCfg),
      queries(8), "qid")
    val bps = per.select("recall_bp").as[Int].collect()
    assert(bps.length == 8 && bps.forall(_ == 10000))
    val s = RecallEval.summary(per).head()
    assert(s.getInt(0) == 10000 && s.getInt(1) == 10000 && s.getLong(2) == 8L)
  }

  test("a pruned candidate scores strictly under 10000 and summary folds exactly") {
    val cand = IVFDenseEngine(corpus, nlist = 8, nprobe = 2, candCfg,
      fixedCentroids = Some(IVFDenseEngine.formulaCentroids(8, 64)))
    val per = RecallEval.vs(cand,
      BruteForceDenseEngine(corpus, truthCfg), queries(10), "qid")
    val rows = per.select("hits", "truth_k", "recall_bp")
      .as[(Int, Int, Int)].collect()
    assert(rows.forall { case (h, t, bp) => bp == h * 10000 / t })
    assert(rows.exists(_._3 < 10000), "nprobe=2 of 8 should miss something")
    val s = RecallEval.summary(per).head()
    val bps = rows.map(_._3.toLong)
    assert(s.getInt(0) == (bps.sum / bps.length).toInt)
    assert(s.getInt(1) == bps.min.toInt)
  }

  test("construction refusals: shared indexField, merging truth") {
    val c = BruteForceDenseEngine(corpus, candCfg)
    intercept[IllegalArgumentException] {
      RecallEval.vs(c, BruteForceDenseEngine(corpus, candCfg), queries(2), "qid")
    }
    intercept[IllegalArgumentException] {
      RecallEval.vs(c, BruteForceDenseEngine(corpus,
        candCfg.copy(indexField = "truth")), queries(2), "qid")
    }
  }

  test("construction refusal: filled masked indices on either engine") {
    // fill replaces -1 padding with pseudo-random VALID ids — the -1
    // strip can't see them, so they'd count as hits/misses and silently
    // skew recall_bp; refuse at construction like the other checks
    val filledCand = BruteForceDenseEngine(corpus,
      candCfg.copy(fillMaskedIndices = true))
    intercept[IllegalArgumentException] {
      RecallEval.vs(filledCand,
        BruteForceDenseEngine(corpus, truthCfg), queries(2), "qid")
    }
    intercept[IllegalArgumentException] {
      RecallEval.vs(BruteForceDenseEngine(corpus, candCfg),
        BruteForceDenseEngine(corpus,
          truthCfg.copy(fillMaskedIndices = true)), queries(2), "qid")
    }
  }

  test("a filtered truth with short lists divides by truth_k, not k") {
    // a very selective truth filter yields < k truth rows; recall must be
    // measured against what exists, not against the configured k
    val pred = col("label") === 3
    val truth = BruteForceDenseEngine(corpus, truthCfg,
      corpusFilter = Some(pred))
    val cand = BruteForceDenseEngine(corpus, candCfg,
      corpusFilter = Some(pred))
    val per = RecallEval.vs(cand, truth, queries(5), "qid")
    val rows = per.select("hits", "truth_k", "recall_bp")
      .as[(Int, Int, Int)].collect()
    assert(rows.forall { case (h, t, bp) => h == t && bp == 10000 })
  }
}
