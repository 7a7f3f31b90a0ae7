package graft.search

import org.apache.spark.sql.DataFrame

/** FAISS index-factory-string adapter.
  *
  * Reference configs carry dense-index specs as FAISS factory strings —
  * `"OPQ32,IVF4096,PQ32x8"` — parsed by the reference at
  * warp_pipes/search/vector_base/utils/faiss.py:30-87
  * (`index_factory_pattern` + `pq_pattern`). This object parses the same
  * grammar into the engines behind the [[AutoSearchEngine]] registry
  * names, so a config string ported from a reference deployment drops
  * into `AutoSearchEngine(spec, corpus, cfg, opts)` unchanged.
  *
  * Grammar:
  * {{{
  *   [ OPQ<m>[_<d>] , | PCAR<d> , ]  IVF<nlist> , ( PQ<m>[x<nbits>][fs|fsr] | Flat )
  * }}}
  *
  * Engine mapping:
  *   - `IVF<n>,Flat` → [[IVFDenseEngine]] (coarse pruning + exact scan of
  *     the probed lists); registry shape `dense_ivf`. A preproc ahead of a
  *     Flat index is accepted and DROPPED: orthogonal rotations preserve
  *     inner products, so rotated exact search returns identical results.
  *   - `IVF<n>,PQ<m>` → [[IVFPQDenseEngine]] with `residual = true`
  *     (registry shape `ivf_pq_resid`): FAISS `IndexIVFPQ` encodes
  *     residuals by default (`by_residual`), so the faithful translation
  *     of a bare IVF+PQ string is the residual engine. Override with
  *     `opts("residual") = "false"` for raw-vector ADC (`ivf_pq`).
  *   - `OPQ<m>,IVF<n>,PQ<m>` (or `PCAR<d>` preproc) → [[IVFPQDenseEngine]]
  *     with `rotate = true, residual = true` — the reference's full
  *     default factory (registry shape `opq_ivf_pq`). `PCAR` maps to the
  *     same learned rotation: this engine's rotation is PCA-based
  *     parametric OPQ, the same transform family.
  *   - `PQ<m>x<b>` → `codebookSize = 2^b` (FAISS `nbits`, default 8).
  *   - The `fs`/`fsr` fast-scan suffixes and the OPQ `_<d>` output dim are
  *     accepted and IGNORED — they pick SIMD register layouts / a
  *     dimension cut in FAISS, execution details with no analog in the
  *     Spark lowering (and `_<d>` would change scores; we keep full dim).
  *
  * `nprobe` is not part of the factory grammar (FAISS sets it post-build);
  * pass `opts("nprobe")`, else the engine default applies (capped at
  * nlist).
  */
object FaissFactory {

  /** `PQ<m>[x<nbits>][fs|fsr]` (reference `pq_pattern`). */
  final case class PqSpec(m: Int, nbits: Int, pqType: String) {
    def codebookSize: Int = 1 << nbits
  }

  /** A parsed factory string. `rotate` = an OPQ/PCAR preproc was present. */
  final case class FaissSpec(
      factory: String,
      nlist: Int,
      pq: Option[PqSpec],
      rotate: Boolean) {

    /** The [[AutoSearchEngine]] registry name this spec lowers to (the
      * table a reference user reads); `build` constructs the same engine
      * directly so parsed nlist/m/nbits survive.
      */
    def registryName: String = pq match {
      case None            => "dense_ivf"
      case Some(_) if rotate => "opq_ivf_pq"
      case Some(_)         => "ivf_pq_resid"
    }

    /** Construct the engine. `opts` takes the [[AutoSearchEngine]] keys
      * (idxCol/vecCol/stateDir/fingerprint) plus `nprobe` and `residual`;
      * the typed fixed-state params make the engine deterministic and
      * externally replayable (the gate/oracle hook, same contract as the
      * engine constructors).
      */
    def build(
        corpus: DataFrame,
        cfg: SearchConfig = SearchConfig(),
        opts: Map[String, String] = Map.empty,
        fixedCodebooks: Option[Seq[Seq[Seq[Double]]]] = None,
        fixedCentroids: Option[Seq[Seq[Double]]] = None): SearchEngine = {
      val idxCol = opts.getOrElse("idxCol", "idx")
      val vecCol = opts.getOrElse("vecCol", "vector")
      val stateDir = opts.get("stateDir")
      val fp = opts.getOrElse("fingerprint", "")
      val nprobe = opts.get("nprobe").map(_.toInt).getOrElse(4).min(nlist)
      pq match {
        case None =>
          IVFDenseEngine(corpus, nlist, nprobe, cfg, idxCol, vecCol,
            stateDir = stateDir, corpusFingerprint = fp,
            fixedCentroids = fixedCentroids)
        case Some(p) =>
          IVFPQDenseEngine(corpus, nlist, nprobe, p.m, p.codebookSize, cfg,
            idxCol, vecCol,
            fixedCodebooks = fixedCodebooks,
            rotate = rotate,
            residual = opts.get("residual").forall(_.toBoolean),
            stateDir = stateDir, corpusFingerprint = fp,
            fixedCentroids = fixedCentroids)
      }
    }
  }

  // reference index_factory_pattern + pq_pattern, one anchored regex;
  // the reference's sloppy optional-comma handling is tightened to "the
  // preproc, when present, is comma-separated like every other component"
  private val Pattern =
    """^(?:(OPQ(\d+)(?:_(\d+))?|PCAR(\d+)),)?IVF(\d+),(?:PQ(\d+)(?:x(\d+))?(fs|fsr)?|(Flat))$""".r

  /** True when the string is shaped like a factory string (used by the
    * registry to decide between "parse this" and "unknown engine name").
    */
  def looksLikeFactory(s: String): Boolean = s.contains("IVF")

  def parse(factory: String): FaissSpec = factory.trim match {
    case Pattern(_, opqM, _, pcarD, nlist, pqM, nbits, _, flat) =>
      val pq =
        if (flat != null) None
        else Some(PqSpec(pqM.toInt,
          Option(nbits).map(_.toInt).getOrElse(8), "full"))
      require(pq.forall(_.nbits <= 24),
        s"PQ nbits ${pq.map(_.nbits)} in '$factory' is absurd (codebook 2^nbits)")
      FaissSpec(factory.trim, nlist.toInt, pq,
        rotate = opqM != null || pcarD != null)
    case other =>
      throw new IllegalArgumentException(
        s"cannot parse FAISS factory string '$other'; expected " +
          "[OPQ<m>[_<d>],|PCAR<d>,]IVF<nlist>,(PQ<m>[x<nbits>][fs|fsr]|Flat) " +
          "e.g. 'OPQ32,IVF4096,PQ32'")
  }
}
