package graft.search

import graft.core.Pipe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, round, transform => arrTransform}

/** Reciprocal-rank fusion over a panel of engines.
  *
  * The reference merges engine results by score addition
  * (warp_pipes/search/result.py:199-239, the S6 `sum_scores` path) — sound
  * when the engines share a score scale, wrong when they don't (BM25 log-idf
  * sums vs dense dot products). RRF is the standard rank-only combiner for
  * exactly that heterogeneous case: each engine contributes
  * `1 / (rrfK + rank)` for every candidate it returned, candidates are
  * summed across engines and re-ranked by the fused score.
  *
  * Execution shape: every engine overlays its ranked arrays onto the query
  * frame (one pass per engine, whatever plan that engine owns); the fusion
  * itself is a pure per-row Column program over those arrays
  * ([[SearchResultOps.rrf]]) — ZERO additional shuffles regardless of corpus
  * or query scale, because ranks are positions in already-ranked arrays, not
  * a window over an exploded candidate set.
  *
  * Engines may share an `indexField`: each engine's output columns are
  * renamed away before the next engine runs, so no engine ever sees (or
  * merges with) a previous engine's results.
  */
/** Min-max weighted (convex-combination) fusion — the hybrid-search
  * sibling of [[RRFFusionPipe]] that keeps score MAGNITUDES: each
  * engine's scores normalize to [0, 1] within its returned list, then
  * candidates sum `weight · normalized` across engines
  * ([[SearchResultOps.minMaxFuse]]). Same execution shape as RRF: one
  * pass per engine, per-row fusion, zero extra shuffles.
  */
case class WeightedFusionPipe(
    engines: Seq[SearchEngine],
    weights: Seq[Double],
    config: SearchConfig = SearchConfig(),
    roundScores: Option[Int] = None) extends Pipe {
  require(engines.nonEmpty && engines.size == weights.size,
    s"need one weight per engine (${engines.size} engines, ${weights.size} weights)")
  Fusion.requireNoFill(engines)

  override def children: Seq[Pipe] = engines
  override def update: Boolean = true
  override def params: Map[String, String] = Map(
    "weights" -> weights.mkString(","), "k" -> config.k.toString,
    "engines" -> engines.map(_.name).mkString(","))

  private def idxKey = s"${config.indexField}.idx"
  private def scoreKey = s"${config.indexField}.score"

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    var cur = df
    val sides = engines.zipWithIndex.map { case (e, i) =>
      val (pi, ps) = (s"__wf${i}_idx__", s"__wf${i}_score__")
      cur = e(cur)
      cur = cur
        .withColumn(pi, Pipe.qcol(e.idxKey).cast("array<long>"))
        .withColumn(ps, Pipe.qcol(e.scoreKey).cast("array<double>"))
        .drop(Pipe.qcol(e.idxKey)).drop(Pipe.qcol(e.scoreKey))
      (pi, ps)
    }
    val (fIdx, fScore) = SearchResultOps.minMaxFuse(
      sides.zip(weights).map { case ((pi, ps), w) => (col(pi), col(ps), w) })
    val (rIdx, rScore) = SearchResultOps.resize(fIdx, fScore, config.k)
    val outScore = roundScores.fold(rScore)(p => arrTransform(rScore, v => round(v, p)))
    cur
      .withColumn(idxKey, rIdx)
      .withColumn(scoreKey, outScore)
      .drop(sides.flatMap(s => Seq(s._1, s._2)): _*)
  }
}

private[search] object Fusion {
  /** Fusion drops -1 padding before contributing ranks/scores — but an
    * engine with `fillMaskedIndices=true` has already REPLACED its padding
    * with pseudo-random valid doc ids, which would then receive real
    * contributions in the fused ranking. Constructor-checked so the
    * mistake fails loudly instead of corrupting results.
    */
  def requireNoFill(engines: Seq[SearchEngine]): Unit =
    engines.foreach(e => require(!(e.config.fillMaskedIndices && e.mayFill),
      s"fusion over engine '${e.name}' requires fillMaskedIndices=false: " +
        "filled padding indices would receive real rank/score contributions"))
}

case class RRFFusionPipe(
    engines: Seq[SearchEngine],
    config: SearchConfig = SearchConfig(),
    rrfK: Double = 60.0,
    roundScores: Option[Int] = None) extends Pipe {
  require(engines.nonEmpty, "RRFFusionPipe needs at least one engine")
  Fusion.requireNoFill(engines)

  override def children: Seq[Pipe] = engines
  override def update: Boolean = true
  override def params: Map[String, String] = Map(
    "rrfK" -> rrfK.toString, "k" -> config.k.toString,
    "engines" -> engines.map(_.name).mkString(","))

  private def idxKey = s"${config.indexField}.idx"
  private def scoreKey = s"${config.indexField}.score"

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    var cur = df
    val sides = engines.zipWithIndex.map { case (e, i) =>
      cur = e(cur)
      val priv = s"__rrf${i}_idx__"
      cur = cur
        .withColumn(priv, Pipe.qcol(e.idxKey).cast("array<long>"))
        .drop(Pipe.qcol(e.idxKey)).drop(Pipe.qcol(e.scoreKey))
      priv
    }
    val (fIdx, fScore) = SearchResultOps.rrf(sides.map(col), rrfK)
    val (rIdx, rScore) = SearchResultOps.resize(fIdx, fScore, config.k)
    val outScore = roundScores.fold(rScore)(p => arrTransform(rScore, v => round(v, p)))
    cur
      .withColumn(idxKey, rIdx)
      .withColumn(scoreKey, outScore)
      .drop(sides: _*)
  }
}
