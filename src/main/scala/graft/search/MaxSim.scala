package graft.search

import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction re-ranker (MaxSim — Khattab & Zaharia,
  * SIGIR'20): both sides carry PER-TOKEN vectors and
  * `score(q, d) = Σ_{qi} max_{dj} qi · dj`.
  *
  * The serving shape is the two-stage cascade the paper describes: a
  * cheap recall stage (ANN / BM25) proposes candidates, MaxSim re-scores
  * only those. This engine is that second stage: it reads the PREVIOUS
  * engine's `{indexField}.idx`, explodes the k candidates per query row,
  * equi-joins the multi-vector corpus by idx, and scores each (query,
  * candidate) pair with one pure nested-HOF expression — no UDF. With Q
  * queries the candidate side is Q·k rows, so AQE broadcasts it and the
  * 100 TB corpus side is probed map-side, never shuffled.
  *
  * Without previous results it degrades to an exact full scan, refused
  * past the brute-force broadcast cap exactly like
  * [[BruteForceDenseEngine]] (MaxSim over a full corpus is quadratic in
  * BOTH rows and tokens — at scale the recall stage is not optional).
  *
  * Like [[TopkEngine]], `mergePreviousResults` is forced off: the output
  * IS the re-scored candidate set; merging with the recall stage's
  * incomparable scores would be unsound (use [[RRFFusionPipe]] to combine
  * heterogeneous panels instead).
  */
case class MaxSimEngine(
    corpus: DataFrame,
    config0: SearchConfig = SearchConfig(),
    corpusIdxCol: String = "idx",
    /** `array<array<float>>` — the document's per-token vectors. */
    corpusVecsCol: String = "vectors",
    roundScores: Option[Int] = None) extends SearchEngine {

  val config: SearchConfig = config0.copy(mergePreviousResults = false)

  override def params = Map("k" -> config.k.toString,
    "indexField" -> config.indexField, "engine" -> "maxsim",
    "round" -> roundScores.map(_.toString).getOrElse(""))

  private lazy val n: Long = corpus.count()
  // re-ranker: candidates come from the recall stage, never filled
  protected def fillRange: Option[Long] = None
  override private[search] def mayFill: Boolean = false

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    val qvs = qcol(s"${config.queryField}.vectors")
    val cSel = corpus.select(
      col(corpusIdxCol).cast("long").as("idx"),
      col(corpusVecsCol).as("__dvs__"))
    val paired =
      if (stamped.columns.contains(idxKey)) {
        val cand = stamped.select(col(rowId), qvs.as("__qvs__"),
          explode(filter(qcol(idxKey).cast("array<long>"), i => i >= 0L)).as("idx"))
        cand.join(cSel, Seq("idx"))
      } else {
        if (n > BruteForceDenseEngine.BroadcastRowCap)
          throw new IllegalStateException(
            s"MaxSimEngine full scan over $n corpus rows (> broadcast cap " +
              s"${BruteForceDenseEngine.BroadcastRowCap}) is quadratic in rows " +
              "AND tokens. Run a recall engine first (dense_ivf, bm25, ...) " +
              "and let MaxSim re-rank its candidates.")
        stamped.select(col(rowId), qvs.as("__qvs__")).crossJoin(broadcast(cSel))
      }
    val raw = aggregate(col("__qvs__"), lit(0d), (acc, qv) =>
      acc + coalesce(
        array_max(org.apache.spark.sql.functions.transform(
          col("__dvs__"), dv => SearchEngine.dot(qv, dv))),
        lit(Double.NegativeInfinity)))
    val scoreExpr = roundScores.fold(raw)(p => round(raw, p))
    val exploded = paired.select(col(rowId), col("idx"), scoreExpr.as("score"))
    SearchEngine.collapseTopK(stamped, exploded, rowId, config.k)
  }
}
