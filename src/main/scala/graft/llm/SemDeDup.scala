package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** SemDeDup (Abbas et al., arXiv:2303.09540): semantic deduplication by
  * clustering embeddings, then pruning near-duplicate pairs INSIDE each
  * cluster only — pairwise cosine work drops from O(n²) to Σ|cell|², the
  * paper's core trick. Within each duplicate group the member FURTHEST
  * from its centroid survives (the paper's best-performing keep policy:
  * far-from-centroid examples are the least redundant), ties broken by
  * ascending id.
  *
  * Deterministic variant: centroids are caller-supplied literals (train
  * with KMeans, or pass [[ClusterBalancedSamplePipe.formulaCentroids]]
  * for an externally-replayable grid) and assignment is one-shot
  * nearest-centroid (squared L2, lowest-index tie-break — the SAME
  * codegen'd kernel as [[ClusterBalancedSamplePipe]]). No Lloyd
  * iterations on the hot path, so an external oracle replays assignment,
  * pairs, components, and survivors exactly.
  *
  * Scale shape: the self-join keys on the cluster id, so shuffle volume
  * is one pass of (id, vec) each side and per-task work is bounded by
  * the largest cell — at 100 TB, k must grow with n (k ≈ n / target
  * cell size, the paper uses 50k cells for LAION); duplicates whose
  * members straddle a cell boundary are missed by construction (the
  * paper's accepted recall trade — the gate measures 37/40 planted pairs
  * surviving co-clustering).
  *
  * Emits one row per input id: (id, kcluster, dup_group, kept) — a FLAG,
  * not a filter, like [[DedupOps.resolveKeepBest]].
  */
case class SemDeDupPipe(
    vecCol: String,
    idCol: String,
    centroids: Seq[Seq[Double]],
    tau: Double,
    clusterCol: String = "kcluster") extends Pipe {
  require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
    "centroids must be non-empty and rectangular")
  require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
  override def params = Map("vec" -> vecCol, "id" -> idCol,
    "k" -> centroids.size.toString, "dim" -> centroids.head.size.toString,
    "tau" -> tau.toString, "cluster" -> clusterCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val assigned =
      SemDeDupPipe.assigned(df, vecCol, idCol, centroids, clusterCol)
    val l = assigned.select(col(clusterCol), col("id").as("id_a"),
      col("__v__").as("__va__"))
    val r = assigned.select(col(clusterCol), col("id").as("id_b"),
      col("__v__").as("__vb__"))
    val pairs = l.join(r, Seq(clusterCol))
      .filter(col("id_a") < col("id_b"))
      .filter(DedupOps.cosine(col("__va__"), col("__vb__")) >= tau)
      .select("id_a", "id_b")
    val cc = DedupOps.connectedComponents(pairs)
    DedupOps.resolveKeepBest(
      assigned.select(col("id"), col(clusterCol), col("__cd__")),
      cc, "id", "__cd__")
      .withColumnRenamed("cluster", "dup_group")
      .select(col("id"), col(clusterCol), col("dup_group"), col("kept"))
  }
}

object SemDeDupPipe {
  /** The shared assignment front half of the batch pipe, the cross-corpus
    * pipe, and the streaming twin: (id, `clusterCol` cell, `__v__`
    * double vector, `__cd__` squared distance to own centroid) — pure
    * per-row expressions, map-only on any input (batch or stream).
    */
  def assigned(df: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Double]], clusterCol: String): DataFrame = {
    val base = df.select(qcol(idCol).cast("long").as("id"),
      arrTransform(qcol(vecCol), x => x.cast("double")).as("__v__"))
    val dists = ClusterBalancedSamplePipe.squaredDists(col("__v__"), centroids)
    base.withColumn("__ds__", dists)
      .withColumn(clusterCol,
        (array_position(col("__ds__"), array_min(col("__ds__"))) - 1)
          .cast("int"))
      .withColumn("__cd__", array_min(col("__ds__")))
      .drop("__ds__")
  }

  /** Cell-scoped cosine pairs BETWEEN two corpora (left id_a × right
    * id_b, same centroid cell, cosine >= tau) — the cross-corpus /
    * stream-vs-corpus core: an INNER equi-join on the cell id, legal and
    * stateless when `left` is a streaming frame.
    */
  def crossCellPairs(left: DataFrame, right: DataFrame,
      vecCol: String, idCol: String,
      rightVecCol: String, rightIdCol: String,
      centroids: Seq[Seq[Double]], tau: Double): DataFrame = {
    val l = assigned(left, vecCol, idCol, centroids, "__cell__")
      .select(col("__cell__"), col("id").as("id_a"), col("__v__").as("__va__"))
    val r = assigned(right, rightVecCol, rightIdCol, centroids, "__cell__")
      .select(col("__cell__"), col("id").as("id_b"), col("__v__").as("__vb__"))
    l.join(r, Seq("__cell__"))
      .withColumn("cosine", DedupOps.cosine(col("__va__"), col("__vb__")))
      .filter(col("cosine") >= tau)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}

/** Cross-corpus semantic contamination: flag train-side embeddings having
  * a cosine >= tau neighbor in an eval/reference corpus, compared only
  * within their shared centroid cell — the embedding analogue of
  * [[CrossCorpusMinHashPipe]], with SemDeDup's cell scoping replacing
  * band buckets. Emits (id_a = train, id_b = corpus, cosine) pairs.
  *
  * Scale shape: both sides shuffle once on the cell id (or the corpus
  * side broadcasts when small); per-task work is bounded by cell sizes,
  * never \|train\|×\|corpus\|.
  */
case class CrossCorpusSemDeDupPipe(
    corpus: DataFrame,
    vecCol: String,
    idCol: String,
    corpusVecCol: String,
    corpusIdCol: String,
    centroids: Seq[Seq[Double]],
    tau: Double) extends Pipe {
  require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
    "centroids must be non-empty and rectangular")
  require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
  override def params = Map("vec" -> vecCol, "id" -> idCol,
    "corpusVec" -> corpusVecCol, "corpusId" -> corpusIdCol,
    "k" -> centroids.size.toString, "tau" -> tau.toString)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    SemDeDupPipe.crossCellPairs(df, corpus, vecCol, idCol,
      corpusVecCol, corpusIdCol, centroids, tau)
}
