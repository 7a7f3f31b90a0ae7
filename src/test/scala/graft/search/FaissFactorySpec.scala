package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FAISS factory-string adapter: the reference's config grammar
  * (warp_pipes/search/vector_base/utils/faiss.py:30-87) must parse to the
  * right engines with the right parsed parameters, and the string must
  * drop into the AutoSearchEngine registry unchanged.
  */
class FaissFactorySpec extends SparkSpec {
  import FaissFactory._

  test("parses the reference's default factory shapes") {
    val full = parse("OPQ32,IVF4096,PQ32")
    assert(full.nlist == 4096 && full.rotate &&
      full.pq.contains(PqSpec(32, 8, "full")) &&
      full.pq.get.codebookSize == 256 &&
      full.registryName == "opq_ivf_pq")

    val nbits = parse("IVF256,PQ16x4")
    assert(nbits.nlist == 256 && !nbits.rotate &&
      nbits.pq.get.m == 16 && nbits.pq.get.codebookSize == 16 &&
      nbits.registryName == "ivf_pq_resid")

    val flat = parse("IVF1024,Flat")
    assert(flat.nlist == 1024 && flat.pq.isEmpty &&
      flat.registryName == "dense_ivf")

    // OPQ output-dim suffix and fast-scan suffixes are accepted+ignored
    assert(parse("OPQ32_64,IVF4096,PQ32x8fs").registryName == "opq_ivf_pq")
    assert(parse("PCAR64,IVF512,PQ8").rotate)
    // preproc ahead of Flat is dropped (orthogonal rotation is
    // score-invariant for an exact scan)
    assert(parse("OPQ16,IVF64,Flat").registryName == "dense_ivf")
  }

  test("rejects garbage and out-of-grammar strings loudly") {
    // bare IVF (no fine stage), wrong component order, non-numeric nlist,
    // absurd nbits, empty, a registry name, non-8-bit SQ variants, and a
    // preproc ahead of SQ8 (dropping the rotation would change scores)
    for (bad <- Seq("IVF4096", "PQ32,IVF16", "IVFx,Flat",
        "IVF16,PQ32x99", "", "dense_ivf", "SQ4", "SQ6", "SQfp16",
        "IVF16,SQ4", "OPQ8,SQ8", "PCAR64,IVF16,SQ8", "Flat,IVF16"))
      intercept[IllegalArgumentException](parse(bad))
  }

  test("parses flat (non-IVF) and SQ8 factory shapes") {
    assert(parse("Flat").registryName == "dense")
    val pqFlat = parse("PQ16x4")
    assert(pqFlat.nlist == 0 && pqFlat.pq.get.m == 16 &&
      pqFlat.pq.get.codebookSize == 16 && pqFlat.registryName == "dense_pq")
    assert(parse("OPQ8,PQ8").registryName == "opq_pq")
    val sqFlat = parse("SQ8")
    assert(sqFlat.nlist == 0 && sqFlat.sq && sqFlat.pq.isEmpty &&
      sqFlat.registryName == "dense_sq")
    val ivfSq = parse("IVF256,SQ8")
    assert(ivfSq.nlist == 256 && ivfSq.sq &&
      ivfSq.registryName == "ivf_sq")
  }

  test("parses LSH as a standalone index; rejects preproc/IVF ahead of it") {
    val l = parse("LSH")
    assert(l.lsh && l.registryName == "dense_lsh")
    for (bad <- Seq("IVF16,LSH", "OPQ8,LSH", "PCAR32,LSH"))
      intercept[IllegalArgumentException](parse(bad))
  }

  test("factory string drops into AutoSearchEngine and builds the parsed engine") {
    import spark.implicits._
    val corpus = (0 until 64)
      .map(i => (i.toLong, Seq.tabulate(8)(j => if (j == i % 8) 1.0f else 0.0f)))
      .toDF("idx", "vector")
    val queries = Seq((0L, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("qid", "query.vector")
    val cfg = SearchConfig(k = 4, fillMaskedIndices = false,
      queryIdCol = Some("qid"))

    val eng = AutoSearchEngine("IVF4,Flat", corpus, cfg,
      Map("nprobe" -> "4"))
    assert(eng.isInstanceOf[IVFDenseEngine])
    assert(eng.asInstanceOf[IVFDenseEngine].nlist == 4)
    // nprobe=nlist flat scan is exact: top hit is an exact-match vector
    val top = eng(queries).select(element_at(col("`index.idx`"), 1)).head.getLong(0)
    assert(top % 8 == 0, s"top hit $top should be a dim-0 one-hot")

    val pqEng = AutoSearchEngine("OPQ4,IVF4,PQ4x4", corpus, cfg)
    val ivfpq = pqEng.asInstanceOf[IVFPQDenseEngine]
    assert(ivfpq.nlist == 4 && ivfpq.m == 4 && ivfpq.codebookSize == 16 &&
      ivfpq.rotate && ivfpq.residual)

    // residual override mirrors the registry's plain ivf_pq shape
    val raw = AutoSearchEngine("IVF4,PQ4", corpus, cfg,
      Map("residual" -> "false")).asInstanceOf[IVFPQDenseEngine]
    assert(!raw.residual && raw.codebookSize == 256)

    // an unknown non-factory name still lists the registry AND the
    // factory-string escape hatch
    val err = intercept[IllegalArgumentException](
      AutoSearchEngine("dense_ivff", corpus, cfg))
    assert(err.getMessage.contains("factory"))
  }
}
