package graft.search

import graft.core.Pipe.qcol
import graft.llm.DedupOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram Jaccard lexical search: top-k corpus documents by word-shingle
  * Jaccard similarity to the query text — the dedup family's similarity
  * metric turned into a QUERY operator (the "which corpus documents does
  * this eval example overlap" contamination lookup, answered per query
  * instead of corpus-vs-corpus).
  *
  * Build: distinct word k-shingles per document → inverted index
  * `(shingle, docId)` + per-doc shingle counts, both persisted under the
  * engine state dir. Query: explode the query's shingles, equi-join the
  * inverted index (shuffle carries only matching postings — candidates
  * are docs sharing ≥ 1 shingle, never a cross product), count shared
  * per (query, doc), and score `shared / (|q| + |d| - shared)`.
  *
  * `hashShingles` trades oracle-replayable shingle strings for 8-byte
  * xxhash64 keys — the 100 TB wire-size choice, same trade as
  * [[graft.llm.SubstringDedupPipe]].
  */
case class JaccardEngine(
    corpus: DataFrame,
    config: SearchConfig = SearchConfig(),
    corpusIdxCol: String = "idx",
    corpusTextCol: String = "text",
    shingleSize: Int = 3,
    hashShingles: Boolean = false,
    roundScores: Option[Int] = None,
    stateDir: Option[String] = None,
    corpusFingerprint: String = "",
    /** Incremental add (see [[addDocuments]]): the standing inverted
      * index `(g, docId)` and per-doc sizes `(docId, n)` — appended
      * verbatim; only `corpus` (the NEW documents) is shingled. Both or
      * neither. Shingling is per-document — no corpus-level statistics
      * (unlike BM25's df/avgdl) — so add ≡ full build EXACTLY.
      */
    baseIndex: Option[DataFrame] = None,
    baseSizes: Option[DataFrame] = None,
    /** True once [[removeDocuments]] ran — masked-index fill disabled;
      * see [[IVFDenseEngine.carriesDelete]]. */
    carriesDelete: Boolean = false) extends SearchEngine {
  require(baseIndex.isDefined == baseSizes.isDefined,
    "incremental add needs BOTH baseIndex and baseSizes (or neither)")

  override def params = Map("k" -> config.k.toString,
    "shingleSize" -> shingleSize.toString,
    "hashShingles" -> hashShingles.toString,
    "roundScores" -> roundScores.mkString, "engine" -> "jaccard",
    "incremental" -> baseIndex.isDefined.toString) ++
    (if (carriesDelete) Map("carriesDelete" -> "true") else Map.empty)

  /** Incremental index maintenance — the [[IVFDenseEngine.addVectors]]
    * contract for the lexical inverted index: a new engine over `extra`
    * whose standing postings and sizes append verbatim; only the new
    * documents are shingled — O(|extra|), never O(index). Per-document
    * shingling has no corpus statistics, so search equals a build over
    * base ∪ extra exactly (the BM25 merge needed a df re-sum; this one
    * needs nothing).
    */
  def addDocuments(extra: DataFrame, fingerprint: String = ""): JaccardEngine = {
    require(fingerprint.nonEmpty || stateDir.isEmpty,
      "addDocuments with stateDir requires a fingerprint covering " +
        "base+extra — an unchanged state key would serve a previous " +
        "add's cache")
    val (inv, sizes, _) = state
    copy(corpus = extra,
      baseIndex = Some(inv), baseSizes = Some(sizes),
      corpusFingerprint =
        if (fingerprint.nonEmpty) fingerprint else corpusFingerprint)
  }

  /** Deletion: drop every standing doc matching `removed` (a predicate
    * over `docId`) from the inverted index and the per-doc sizes — two
    * map-side filters, zero shuffle, nothing re-shingles. Per-document
    * shingling has no corpus statistics (the property that made the add
    * exact), so the result ≡ a build over the survivors exactly.
    */
  def removeDocuments(removed: Column, fingerprint: String = ""): JaccardEngine = {
    require(fingerprint.nonEmpty || stateDir.isEmpty,
      "removeDocuments with stateDir requires a fresh fingerprint " +
        "covering the surviving corpus — an unchanged state key would " +
        "serve the pre-delete cache")
    val (inv, sizes, _) = state
    // DELETE-WHERE null semantics: NULL = not removed (SearchEngine
    // .isRemoved) on both the postings and the sizes frames
    val keep = !SearchEngine.isRemoved(removed)
    copy(corpus = corpus.limit(0),
      baseIndex = Some(inv.filter(keep)),
      baseSizes = Some(sizes.filter(keep)),
      carriesDelete = true,
      corpusFingerprint =
        if (fingerprint.nonEmpty) fingerprint else corpusFingerprint)
  }

  // scoring/truncation knobs must hit the same persisted index
  override protected def queryTimeParams: Set[String] = Set("k", "roundScores")

  private def shingles(text: Column): Column =
    if (hashShingles) DedupOps.shingleHashes(text, shingleSize).cast("array<string>")
    else DedupOps.shingleStrings(text, shingleSize)

  /** (inverted index (g, docId), sizes (docId, n), corpus count). */
  lazy val state: (DataFrame, DataFrame, Long) = {
    lazy val sh = corpus.select(col(corpusIdxCol).cast("long").as("docId"),
      shingles(qcol(corpusTextCol)).as("__s__"))
    def persisted(frame: String)(compute: => DataFrame): DataFrame =
      stateDir match {
        case Some(dir) =>
          graft.core.CachedStage(corpus.sparkSession, dir,
            buildStateKey(corpusFingerprint, frame))(compute)
        case None =>
          compute.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    // incremental add: base frames append OUTSIDE the persisted stage,
    // so the cache (and the shingling) covers only the new documents
    val inv = {
      val own = persisted("inv")(
        sh.select(col("docId"), explode(col("__s__")).as("g")))
      baseIndex.fold(own)(own.unionByName(_))
    }
    val sizes = {
      val own = persisted("sizes")(
        sh.select(col("docId"), size(col("__s__")).as("n")))
      baseSizes.fold(own)(own.unionByName(_))
    }
    (inv, sizes, sizes.count())
  }

  protected def fillRange: Option[Long] =
    if (carriesDelete) None else Some(state._3)

  protected def searchRanked(stamped: DataFrame, rowId: String): DataFrame = {
    val (inv, sizes, _) = state
    val q = stamped.select(col(rowId),
      shingles(qcol(s"${config.queryField}.text")).as("__qs__"))
      .select(col(rowId), size(col("__qs__")).as("__qn__"),
        explode(col("__qs__")).as("g"))
    val shared = q.join(inv, Seq("g"))
      .groupBy(col(rowId), col("docId"))
      .agg(count(lit(1)).as("__shared__"), first("__qn__").as("__qn__"))
    val raw = col("__shared__").cast("double") /
      (col("__qn__") + col("n") - col("__shared__")).cast("double")
    val scoreExpr = roundScores.fold(raw)(p => round(raw, p))
    val exploded = shared.join(sizes, Seq("docId"))
      .select(col(rowId), col("docId").as("idx"), scoreExpr.as("score"))
    SearchEngine.collapseTopK(stamped, exploded, rowId, config.k)
  }
}
