package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Recall evaluation for approximate engines — the measurement loop a
  * production ANN deployment runs continuously (tune nprobe/bands/m,
  * watch drift after adds, decide when to rebalance). The reference
  * validates its FAISS engines against the exact torch matmul the same
  * way (tests/search/test_dense.py:27-34); this makes that comparison a
  * first-class, cluster-side operator instead of a test-only loop.
  *
  * [[RecallEval.vs]] runs the CANDIDATE (approximate) engine and the
  * TRUTH (exact) engine over the same query frame and emits one row per
  * query with `hits` (|candidate ∩ truth| over the truth top-k),
  * `truth_k` (|truth| — can be short under filters), and the fixed-point
  * `recall_bp` (= hits·10⁴ div truth_k; integer-exact, the same
  * remainder-stripped division the overlap-fraction pipe uses).
  * [[RecallEval.summary]] folds that to a single (mean_recall_bp,
  * worst_recall_bp, n_queries) row.
  *
  * Shape at scale: both engines run as their normal distributed selves;
  * the comparison itself is ONE map-side array_intersect per query row —
  * no extra shuffle beyond the engines' own. -1 padding (masked/filled
  * indices) is excluded from both sides before intersecting.
  */
object RecallEval {

  /** Strip the -1 padding an engine's resize step may leave. */
  private def valid(idx: Column): Column =
    filter(idx.cast("array<long>"), i => i >= 0L)

  /** Per-query recall of `candidate` against `truth` over `queries`.
    * Both engines must share the query-id column `qidCol` (present in
    * `queries`) and write their results to their own `indexField`s —
    * pass engines configured with DIFFERENT `config.indexField`s (e.g.
    * "index" and "truth") so the ranked arrays coexist on the row;
    * `mergePreviousResults` must be off on the second engine or the
    * truth ranking would absorb the candidate's.
    */
  def vs(
      candidate: SearchEngine,
      truth: SearchEngine,
      queries: DataFrame,
      qidCol: String): DataFrame = {
    require(candidate.config.indexField != truth.config.indexField,
      "candidate and truth engines must write different indexFields — " +
        "configure e.g. SearchConfig(indexField = \"truth\") on the truth " +
        "engine so both rankings coexist on the query row")
    require(!truth.config.mergePreviousResults,
      "truth engine must set mergePreviousResults = false — merging would " +
        "absorb the candidate's ranking into the truth ranking")
    // the -1 strip in `valid` only sees padding that is still -1: an
    // engine with fillMaskedIndices=true has already REPLACED it with
    // pseudo-random valid ids, which would count as candidate hits/misses
    // and silently skew hits/recall_bp — refuse at construction, like the
    // indexField/merge checks above
    require(!candidate.config.fillMaskedIndices,
      "candidate engine must set fillMaskedIndices = false — filled " +
        "pseudo-random ids are indistinguishable from real candidates and " +
        "skew hits/recall_bp")
    require(!truth.config.fillMaskedIndices,
      "truth engine must set fillMaskedIndices = false — filled " +
        "pseudo-random ids are indistinguishable from real truth rows and " +
        "skew hits/recall_bp")
    val both = truth(candidate(queries))
    val cIdx = valid(col(s"`${candidate.config.indexField}.idx`"))
    val tIdx = valid(col(s"`${truth.config.indexField}.idx`"))
    val hits = size(array_intersect(cIdx, tIdx)).cast("int")
    val tk = size(tIdx).cast("int")
    val num = hits.cast("long") * 10000L
    val den = tk.cast("long")
    both
      .withColumn("hits", hits)
      .withColumn("truth_k", tk)
      // exact integer division — strip the remainder before the double
      // division (Column./ rounds; see OverlapFractionPipe)
      .withColumn("recall_bp",
        when(tk > 0, ((num - pmod(num, den)) / den).cast("int"))
          .otherwise(lit(10000)))
  }

  /** One-row summary of [[vs]]: mean and worst per-query recall (both in
    * basis points; the mean is itself remainder-stripped so any engine
    * replays it), plus the query count.
    */
  def summary(perQuery: DataFrame): DataFrame = {
    val sumBp = sum(col("recall_bp")).cast("long")
    val n = count(lit(1))
    perQuery.agg(
      ((sumBp - pmod(sumBp, n)) / n).cast("int").as("mean_recall_bp"),
      min(col("recall_bp")).as("worst_recall_bp"),
      n.cast("long").as("n_queries"))
  }
}
