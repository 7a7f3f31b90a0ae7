package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IVFPQIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = spark.read.parquet(sf("embeddings"))
    .select(col("vec_id").as("idx"), col("embedding").as("vector"))

  private def queries() = spark.read.parquet(sf("embeddings"))
    .filter(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))

  private val cfg = SearchConfig(k = 8, fillMaskedIndices = false,
    queryIdCol = Some("qid"))
  private val cents = IVFDenseEngine.formulaCentroids(8, 64)
  private val books = PQDenseEngine.formulaCodebooks(8, 16, 8)

  test("residual IVF-PQ addVectors == pinned build over the union") {
    val all = corpus()
    val base = all.filter(col("idx") % 3 =!= 0)
    val extra = all.filter(col("idx") % 3 === 0)
    val full = IVFPQDenseEngine(all, nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents), fixedCodebooks = Some(books))
    val inc = IVFPQDenseEngine(base, nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents), fixedCodebooks = Some(books))
      .addVectors(extra)
    assert(inc(queries()).orderBy("qid").collect()
      .sameElements(full(queries()).orderBy("qid").collect()))
  }

  test("rotated (OPQ) add pins the learned rotation from the base") {
    val all = corpus()
    val base = all.filter(col("idx") % 2 === 0)
    val extra = all.filter(col("idx") % 2 =!= 0)
    val baseEng = IVFPQDenseEngine(base, nlist = 4, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, rotate = true)
    val inc = baseEng.addVectors(extra)
    // the incremental engine must carry the base's exact learned state
    assert(inc.pq.rotation == baseEng.pq.rotation)
    assert(inc.pq.codebooks == baseEng.pq.codebooks)
    // and equal a build over the union with that state pinned
    val full = IVFPQDenseEngine(all, nlist = 4, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, rotate = true,
      fixedCentroids = Some(baseEng.ivf.centroids.orderBy("cid").collect()
        .map(r => r.getSeq[Double](1).toIndexedSeq: Seq[Double]).toIndexedSeq),
      fixedCodebooks = Some(baseEng.pq.codebooks),
      fixedRotation = baseEng.pq.rotation)
    assert(inc(queries()).orderBy("qid").collect()
      .sameElements(full(queries()).orderBy("qid").collect()))
    assert(inc.pq.codes.count() == all.count())
  }

  test("rebalance == pinned build from scratch over the same rows and quantizer") {
    val all = corpus()
    val base = all.filter(col("idx") % 3 =!= 0)
    val extra = all.filter(col("idx") % 3 === 0)
    val grown = IVFPQDenseEngine(base, nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents), fixedCodebooks = Some(books))
      .addVectors(extra)
    // a different deterministic quantizer — every row re-tags and every
    // residual code re-encodes against it
    val cents2 = (0 until 8).map(c => (0 until 64).map(t =>
      (((c * 31 + t * 7) % 17) - 8) * 0.05))
    val rb = grown.rebalance(newFixedCentroids = Some(cents2))
    val fresh = IVFPQDenseEngine(all, nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents2), fixedCodebooks = Some(books))
    assert(rb(queries()).orderBy("qid").collect()
      .sameElements(fresh(queries()).orderBy("qid").collect()),
      "rebalanced incremental engine must equal a from-scratch pinned build")
    // the incremental base is dissolved: all rows live in the new corpus
    assert(rb.ivf.listSizes.agg(sum("count")).head().getLong(0) ==
      all.count())
  }

  test("half-set incremental state is refused") {
    intercept[IllegalArgumentException] {
      IVFPQDenseEngine(corpus(), config = cfg,
        baseTagged = Some(corpus().limit(1)))
    }
    intercept[IllegalArgumentException] {
      PQDenseEngine(corpus(), config = cfg,
        baseCodes = Some(corpus().limit(1)))
    }
  }

  test("removeVectors == pinned build over the survivors; no orphan codes") {
    val all = corpus()
    val removed = IVFPQDenseEngine(all, nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents), fixedCodebooks = Some(books))
      .removeVectors(col("idx") % 4 === 1)
    val survivors = IVFPQDenseEngine(all.filter(col("idx") % 4 =!= 1),
      nlist = 8, nprobe = 4, m = 8, codebookSize = 16, config = cfg,
      residual = true, fixedCentroids = Some(cents),
      fixedCodebooks = Some(books))
    assert(removed(queries()).orderBy("qid").collect()
      .sameElements(survivors(queries()).orderBy("qid").collect()))
    // both sides of the standing state shrank together: the deleted
    // rows' codes must not linger as unreachable orphans
    val nLeft = all.filter(col("idx") % 4 =!= 1).count()
    assert(removed.ivf.tagged.count() == nLeft)
    assert(removed.pq.codes.count() == nLeft)
  }

  test("removeVectors with stateDir but no fingerprint is refused") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-rm-fp").toString
    val eng = IVFPQDenseEngine(corpus(), nlist = 8, nprobe = 4, m = 8,
      codebookSize = 16, config = cfg, residual = true,
      fixedCentroids = Some(cents), fixedCodebooks = Some(books),
      stateDir = Some(dir), corpusFingerprint = "rm-v1")
    intercept[IllegalArgumentException] { eng.removeVectors(col("idx") === 0) }
    assert(eng.removeVectors(col("idx") === 0, fingerprint = "rm-v2")
      .corpusFingerprint == "rm-v2")
  }
}
