package graft.search

import graft.core.Pipe
import org.apache.spark.sql.DataFrame

/** S8 `Index` orchestrator (reference warp_pipes/pipes/index.py:38-248):
  * owns an ordered cascade of engines and folds a query frame through
  * them — each engine reads the previous engine's `{indexField}.idx` /
  * `.score` columns and merges or re-ranks per its config. Typical
  * cascades from the reference tests: dense(k=50) → topk(k=10)
  * (tests/pipes/test_index.py:54-74) or bm25(k=100) → dense(k=3)
  * (user_guide/src/examples/index.py:46-63).
  *
  * The reference's vector-caching side (predict pipes per corpus/query,
  * index.py:148-156) maps to [[graft.predict.PredictWithCache]] run ahead
  * of the cascade; engines here read vectors as columns.
  *
  * All engines must agree on the index field (index.py:126-146).
  */
case class IndexPipe(engines: Seq[SearchEngine]) extends Pipe {
  require(engines.nonEmpty, "IndexPipe needs at least one engine")
  require(engines.map(_.config.indexField).distinct.size == 1,
    "all engines must share the same indexField " +
      s"(got ${engines.map(_.config.indexField).distinct.mkString(", ")})")

  override def children: Seq[Pipe] = engines
  override def update: Boolean = true
  override def params = Map("engines" -> engines.map(_.name).mkString(","))

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    engines.foldLeft(df)((acc, e) => e(acc))
}

/** The full S8 lifecycle including vector caching (reference
  * pipes/index.py:48-124: the Index owns the corpus/query predict pipes
  * and each engine's state dir): [[build]] caches corpus vectors under
  * the (model, corpus) fingerprint and constructs a dense engine over
  * them with persisted state; [[query]] caches/attaches query vectors the
  * same way, then folds the query frame through the cascade.
  */
case class IndexBuilder(
    corpus: DataFrame,
    model: graft.predict.VectorModel,
    cacheDir: String,
    corpusFingerprint: String,
    corpusIdxCol: String = "idx",
    corpusInputCol: String = "embedding",
    config: SearchConfig = SearchConfig(),
    /** Registry name of the dense engine over the cached vectors —
      * `dense` (exact, refuses past the broadcast cap) by default;
      * `dense_ivf` / `opq_ivf_pq` / ... for large corpora, with their
      * state persisted under `cacheDir` keyed by the corpus fingerprint.
      */
    engineName: String = "dense") {

  import org.apache.spark.sql.functions.col

  /** Corpus with cached model vectors attached. */
  lazy val corpusWithVectors: DataFrame =
    graft.predict.PredictWithCache(model, corpusInputCol, "vector",
      idCol = corpusIdxCol, cacheDir = cacheDir,
      datasetFingerprint = corpusFingerprint)(corpus)

  /** Dense engine over the cached corpus vectors, state persisted. */
  lazy val denseEngine: SearchEngine =
    AutoSearchEngine(engineName,
      corpusWithVectors.select(col(corpusIdxCol).as("idx"), col("vector")),
      config,
      Map("stateDir" -> cacheDir, "fingerprint" -> corpusFingerprint))

  /** Attach cached query vectors and fold through the engines (dense
    * first unless other engines are supplied).
    */
  def query(
      queries: DataFrame,
      queryIdxCol: String,
      queryInputCol: String,
      extraEngines: Seq[SearchEngine] = Nil): DataFrame = {
    val withVec = graft.predict.PredictWithCache(model, queryInputCol,
      s"${config.queryField}.vector", idCol = queryIdxCol, cacheDir = cacheDir,
      datasetFingerprint = s"$corpusFingerprint-queries")(queries)
    IndexPipe(denseEngine +: extraEngines)(withVec)
  }
}

/** S9 `AutoSearchEngine` registry (reference warp_pipes/search/auto.py:
  * 11-39): engine-name → factory. The Spark engines need their state
  * frames at construction, so factories close over a corpus.
  */
object AutoSearchEngine {
  type Factory = (DataFrame, SearchConfig) => SearchEngine

  def registry(
      corpusIdxCol: String = "idx",
      corpusVecCol: String = "vector",
      corpusTextCol: String = "text",
      groupKey: String = "group",
      roundScores: Option[Int] = None,
      /** Engine-state dir + corpus fingerprint, threaded to every engine
        * with persisted state (the reference registry receives cache dirs
        * from the Index orchestrator the same way, pipes/index.py:65-99).
        */
      stateDir: Option[String] = None,
      corpusFingerprint: String = "",
      /** Multi-probe count for `dense_lsh` (query-time; see LSHDenseEngine). */
      probes: Int = 0,
      /** Signature layout for `dense_lsh` (BUILD-affecting: forks the
        * persisted signature state). Via [[AutoSearchEngine.apply]] opts:
        * `lshBits` = an explicit width or `"auto"` (occupancy-sized from
        * the corpus count through [[graft.llm.SrpLayout]], wide layouts
        * included), `lshBands` = band count.
        */
      lshBits: Int = 48,
      lshBands: Int = 6,
      /** Filtered search (payload filter): a predicate over corpus
        * metadata — threaded to the raw-vector and IVF-PQ dense engines
        * as [[IVFDenseEngine.memberFilter]] (query-time) with `carryCols`
        * naming the payload columns carried into the tagged index state
        * (build-affecting). Via [[AutoSearchEngine.apply]] opts:
        * `memberFilter` = an ANSI SQL predicate string, `carryCols` = a
        * comma list.
        */
      memberFilter: Option[org.apache.spark.sql.Column] = None,
      carryCols: Seq[String] = Nil): Map[String, Factory] = Map(
    "dense" -> ((c, cfg) => BruteForceDenseEngine(c, cfg, corpusIdxCol,
      corpusVecCol, corpusFilter = memberFilter)),
    // the explicit opt-in for exact search over a >cap corpus: plans the
    // quadratic partitioned cartesian the bare `dense` refuses
    "dense_exact" -> ((c, cfg) => BruteForceDenseEngine(c, cfg, corpusIdxCol,
      corpusVecCol, allowCartesian = true, corpusFilter = memberFilter)),
    "dense_ivf" -> ((c, cfg) => IVFDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint,
      carryCols = carryCols, memberFilter = memberFilter)),
    "dense_pq" -> ((c, cfg) => PQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    // the reference's default dense factory shape: learned rotation
    // (OPQ/PCAR) ahead of the product quantizer
    "opq_pq" -> ((c, cfg) => PQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      rotate = true,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    "ivf_pq" -> ((c, cfg) => IVFPQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint,
      carryCols = carryCols, memberFilter = memberFilter)),
    // the reference's FULL default factory: OPQ rotation + IVF pruning +
    // residual PQ codes (vector_base/utils/faiss.py:30-87; FAISS
    // IndexIVFPQ encodes residuals by default — by_residual=true)
    "opq_ivf_pq" -> ((c, cfg) => IVFPQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      rotate = true, residual = true,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint,
      carryCols = carryCols, memberFilter = memberFilter)),
    // residual-only variant: codes quantize x - centroid[cid], scores
    // decompose q·centroid + ADC
    "ivf_pq_resid" -> ((c, cfg) => IVFPQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      residual = true,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint,
      carryCols = carryCols, memberFilter = memberFilter)),
    // FAISS IndexScalarQuantizer QT_8bit (factory "SQ8"): deterministic
    // per-dim min/max train, 1-byte-per-dim codes, ADC scan
    "dense_sq" -> ((c, cfg) => SQDenseEngine(c, cfg, corpusIdxCol, corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    // FAISS IndexIVFScalarQuantizer (factory "IVF<n>,SQ8"): coarse pruning
    // over the SQ codes
    "ivf_sq" -> ((c, cfg) => IVFSQDenseEngine(c, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint,
      carryCols = carryCols, memberFilter = memberFilter)),
    // FAISS IndexLSH by capability: SRP signatures + band buckets; finds
    // HIGH-cosine neighbors only (near-duplicate retrieval), may return
    // fewer than k rows — general ANN belongs to dense_ivf / ivf_pq
    "dense_lsh" -> ((c, cfg) => LSHDenseEngine(c, nBits = lshBits,
      bands = lshBands, probes = probes, config = cfg,
      corpusIdxCol = corpusIdxCol, corpusVecCol = corpusVecCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    // n-gram Jaccard lexical search (the contamination-lookup metric as
    // a query operator); inverted shingle index persisted under stateDir
    "jaccard" -> ((c, cfg) => JaccardEngine(c, cfg, corpusIdxCol, corpusTextCol,
      roundScores = roundScores,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    // ColBERT-style late-interaction re-ranker: corpusVecCol holds the
    // PER-TOKEN vectors (array<array<float>>); cascade it after a recall
    // engine — full scans refuse past the broadcast cap
    "maxsim" -> ((c, cfg) => MaxSimEngine(c, cfg, corpusIdxCol,
      corpusVecsCol = corpusVecCol, roundScores = roundScores)),
    "elasticsearch" -> ((c, cfg) => BM25Engine(c, cfg, corpusIdxCol, corpusTextCol,
      roundScores = roundScores,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    "bm25" -> ((c, cfg) => BM25Engine(c, cfg, corpusIdxCol, corpusTextCol,
      roundScores = roundScores,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    "lookup" -> ((c, cfg) => GroupLookupEngine(c, groupKey, cfg, corpusIdxCol,
      stateDir = stateDir, corpusFingerprint = corpusFingerprint)),
    "topk" -> ((c, cfg) => TopkEngine(cfg)))

  def apply(name: String, corpus: DataFrame, cfg: SearchConfig = SearchConfig(),
      opts: Map[String, String] = Map.empty): SearchEngine = {
    val reg = registry(
      corpusIdxCol = opts.getOrElse("idxCol", "idx"),
      corpusVecCol = opts.getOrElse("vecCol", "vector"),
      corpusTextCol = opts.getOrElse("textCol", "text"),
      groupKey = opts.getOrElse("groupKey", "group"),
      roundScores = opts.get("roundScores").map(_.toInt),
      stateDir = opts.get("stateDir"),
      corpusFingerprint = opts.getOrElse("fingerprint", ""),
      probes = opts.get("probes").map(_.toInt).getOrElse(0),
      lshBits = opts.get("lshBits") match {
        // "auto": occupancy-sized from the corpus count (one count job;
        // the full SrpLayout ladder, wide layouts included)
        case Some("auto") => graft.llm.SrpLayout.forCorpus(corpus.count(),
          opts.get("lshBands").map(_.toInt).getOrElse(6)).nBits
        case Some(v) => v.toInt
        case None => 48
      },
      lshBands = opts.get("lshBands").map(_.toInt).getOrElse(6),
      // filtered search: an ANSI predicate string over idx + carried cols
      memberFilter = opts.get("memberFilter")
        .map(org.apache.spark.sql.functions.expr),
      carryCols = opts.get("carryCols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
    reg.get(name) match {
      case Some(factory) => factory(corpus, cfg)
      // a reference config's FAISS factory string ("OPQ32,IVF4096,PQ32")
      // drops in as the engine name — parsed nlist/m/nbits override the
      // registry defaults (see FaissFactory for the grammar + mapping)
      case None if FaissFactory.looksLikeFactory(name) =>
        FaissFactory.parse(name).build(corpus, cfg, opts)
      case None =>
        throw new IllegalArgumentException(
          s"unknown engine '$name'; known: " +
            s"${reg.keys.toSeq.sorted.mkString(", ")}, or a FAISS factory " +
            "string like 'OPQ32,IVF4096,PQ32'")
    }
  }
}
