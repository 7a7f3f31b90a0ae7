package graft.search

import graft.SparkSpec
import graft.core.Pipe.qcol
import org.apache.spark.sql.functions._

class BM25IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark scales out"), (1L, "duck scales up"),
    (2L, "spark spark joins"), (3L, "late night joins"))
    .toDF("idx", "text")

  private val cfg = SearchConfig(k = 4, fillMaskedIndices = false,
    queryIdCol = Some("qid"))

  test("merged halves reproduce the full-rebuild statistics exactly") {
    val full = BM25Engine(corpus, cfg).stats
    val merged = BM25Stats.merge(
      BM25Engine(corpus.filter(col("idx") % 2 === 0), cfg).stats,
      BM25Engine(corpus.filter(col("idx") % 2 === 1), cfg).stats)
    assert(merged.n == full.n && merged.avgdl == full.avgdl)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(merged.postings) == rows(full.postings))
    assert(rows(merged.dfreq) == rows(full.dfreq))
    assert(rows(merged.docs) == rows(full.docs))
  }

  test("an engine over merged stats ranks identically to a full rebuild") {
    val qs = Seq((100L, "spark joins")).toDF("qid", "q")
      .select(col("qid"), col("q").as("query.text"))
    def ranked(e: BM25Engine) = e(qs)
      .select(qcol("index.idx").as("i"), qcol("index.score").as("s")).head()
    val full = ranked(BM25Engine(corpus, cfg, roundScores = Some(4)))
    val merged = BM25Stats.merge(
      BM25Engine(corpus.filter(col("idx") % 2 === 0), cfg).stats,
      BM25Engine(corpus.filter(col("idx") % 2 === 1), cfg).stats)
    val inc = ranked(BM25Engine(corpus, cfg, roundScores = Some(4),
      fixedStats = Some(merged)))
    assert(inc.getSeq[Long](0) == full.getSeq[Long](0))
    assert(inc.getSeq[Double](1) == full.getSeq[Double](1))
  }

  test("delta-only terms and overlapping terms both merge document counts") {
    val merged = BM25Stats.merge(
      BM25Engine(corpus.filter(col("idx") < 2), cfg).stats, // spark x1, scales x2
      BM25Engine(corpus.filter(col("idx") >= 2), cfg).stats) // spark x1, joins x2
    val df = merged.dfreq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("spark") == 2L) // one doc each side
    assert(df("scales") == 2L) // base only
    assert(df("joins") == 2L) // delta only
  }
}
