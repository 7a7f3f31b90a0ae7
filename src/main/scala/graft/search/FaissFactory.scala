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
  *   [ OPQ<m>[_<d>] , | PCAR<d> , ]  [ IVF<nlist> , ]
  *   ( PQ<m>[x<nbits>][fs|fsr] | SQ8 | Flat )
  * }}}
  *
  * Engine mapping:
  *   - `Flat` → [[BruteForceDenseEngine]] (registry `dense`; refuses
  *     corpora above the broadcast cap unless `opts("allowCartesian")`).
  *   - `PQ<m>[x<b>]` → [[PQDenseEngine]] (`dense_pq`; with an OPQ/PCAR
  *     preproc → `opq_pq`); `codebookSize = 2^b` (FAISS `nbits`, default 8).
  *   - `SQ8` → [[SQDenseEngine]] (`dense_sq`) — FAISS
  *     `IndexScalarQuantizer` QT_8bit. Only the 8-bit variant is lowered;
  *     `SQ4`/`SQ6`/`SQfp16` are REJECTED with a clear message (different
  *     code layouts, no engine here).
  *   - `IVF<n>,Flat` → [[IVFDenseEngine]] (coarse pruning + exact scan of
  *     the probed lists); registry shape `dense_ivf`. A preproc ahead of a
  *     Flat index is accepted and DROPPED: orthogonal rotations preserve
  *     inner products, so rotated exact search returns identical results.
  *   - `IVF<n>,SQ8` → [[IVFSQDenseEngine]] (`ivf_sq`): coarse pruning +
  *     ADC over global-stats SQ codes.
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
  *   - A preproc ahead of SQ8 is REJECTED: unlike Flat (exact, rotation
  *     drops out) and PQ (the engine rotates), the SQ engine quantizes in
  *     the raw basis, so silently dropping the rotation would change
  *     scores.
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

  /** A parsed factory string. `nlist = 0` means no IVF stage; `rotate` =
    * an OPQ/PCAR preproc was present; `sq` = the fine stage is SQ8.
    */
  final case class FaissSpec(
      factory: String,
      nlist: Int,
      pq: Option[PqSpec],
      sq: Boolean,
      rotate: Boolean,
      lsh: Boolean = false) {

    /** The [[AutoSearchEngine]] registry name this spec lowers to (the
      * table a reference user reads); `build` constructs the same engine
      * directly so parsed nlist/m/nbits survive.
      */
    def registryName: String = if (lsh) "dense_lsh" else (nlist > 0, pq, sq) match {
      case (false, None, false)    => "dense"
      case (false, None, true)     => "dense_sq"
      case (false, Some(_), _)     => if (rotate) "opq_pq" else "dense_pq"
      case (true, None, false)     => "dense_ivf"
      case (true, None, true)      => "ivf_sq"
      case (true, Some(_), _)      => if (rotate) "opq_ivf_pq" else "ivf_pq_resid"
    }

    /** Construct the engine. `opts` takes the [[AutoSearchEngine]] keys
      * (idxCol/vecCol/stateDir/fingerprint) plus `nprobe`, `residual` and
      * `allowCartesian`; the typed fixed-state params make the engine
      * deterministic and externally replayable (the gate/oracle hook, same
      * contract as the engine constructors).
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
      val nprobe = opts.get("nprobe").map(_.toInt).getOrElse(4).min(math.max(nlist, 1))
      if (lsh)
        return LSHDenseEngine(corpus,
          probes = opts.get("probes").map(_.toInt).getOrElse(0),
          config = cfg, corpusIdxCol = idxCol, corpusVecCol = vecCol,
          stateDir = stateDir, corpusFingerprint = fp)
      (nlist > 0, pq, sq) match {
        case (false, None, false) =>
          BruteForceDenseEngine(corpus, cfg, idxCol, vecCol,
            allowCartesian = opts.get("allowCartesian").exists(_.toBoolean))
        case (false, None, true) =>
          SQDenseEngine(corpus, cfg, idxCol, vecCol,
            stateDir = stateDir, corpusFingerprint = fp)
        case (false, Some(p), _) =>
          PQDenseEngine(corpus, p.m, p.codebookSize, cfg, idxCol, vecCol,
            fixedCodebooks = fixedCodebooks, rotate = rotate,
            stateDir = stateDir, corpusFingerprint = fp)
        case (true, None, false) =>
          IVFDenseEngine(corpus, nlist, nprobe, cfg, idxCol, vecCol,
            stateDir = stateDir, corpusFingerprint = fp,
            fixedCentroids = fixedCentroids)
        case (true, None, true) =>
          IVFSQDenseEngine(corpus, nlist, nprobe, cfg, idxCol, vecCol,
            stateDir = stateDir, corpusFingerprint = fp,
            fixedCentroids = fixedCentroids)
        case (true, Some(p), _) =>
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
    """^(?:(OPQ(\d+)(?:_(\d+))?|PCAR(\d+)),)?(?:IVF(\d+),)?(?:PQ(\d+)(?:x(\d+))?(fs|fsr)?|(SQ[a-z0-9]+)|(Flat)|(LSH))$""".r

  /** True when the string is shaped like a factory string (used by the
    * registry to decide between "parse this" and "unknown engine name").
    * Registry names are all lowercase, so the uppercase component prefixes
    * cannot shadow them.
    */
  def looksLikeFactory(s: String): Boolean = {
    val t = s.trim
    t.contains("IVF") || t.startsWith("OPQ") || t.startsWith("PCAR") ||
      t.startsWith("PQ") || t.startsWith("SQ") || t == "Flat" || t == "LSH"
  }

  def parse(factory: String): FaissSpec = factory.trim match {
    case Pattern(preproc, opqM, _, pcarD, nlist, pqM, nbits, _, sqType, flat, lshS) =>
      val pq =
        if (pqM == null) None
        else Some(PqSpec(pqM.toInt,
          Option(nbits).map(_.toInt).getOrElse(8), "full"))
      require(pq.forall(_.nbits <= 24),
        s"PQ nbits ${pq.map(_.nbits)} in '$factory' is absurd (codebook 2^nbits)")
      require(sqType == null || sqType == "SQ8",
        s"scalar quantizer '$sqType' in '$factory' is not lowered — only " +
          "SQ8 (8-bit per-dim) has an engine here; SQ4/SQ6/SQfp16 pick " +
          "FAISS code layouts with no analog")
      val rotate = opqM != null || pcarD != null
      require(!(rotate && sqType != null),
        s"preproc '$preproc' ahead of SQ8 in '$factory' is not supported: " +
          "the SQ engine quantizes in the raw basis, and dropping the " +
          "rotation would change scores (use IVF<n>,SQ8 or OPQ...,PQ<m>)")
      require(lshS == null || (preproc == null && nlist == null),
        s"'$factory': FAISS LSH is a standalone index here — preprocs/IVF " +
          "ahead of the sign-hash have no engine analog (use plain 'LSH')")
      FaissSpec(factory.trim,
        Option(nlist).map(_.toInt).getOrElse(0), pq,
        sq = sqType != null, rotate = rotate, lsh = lshS != null)
    case other =>
      throw new IllegalArgumentException(
        s"cannot parse FAISS factory string '$other'; expected " +
          "[OPQ<m>[_<d>],|PCAR<d>,][IVF<nlist>,](PQ<m>[x<nbits>][fs|fsr]|SQ8|Flat) " +
          "e.g. 'OPQ32,IVF4096,PQ32'")
  }
}
