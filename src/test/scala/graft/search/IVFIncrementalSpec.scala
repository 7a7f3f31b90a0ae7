package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IVFIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = spark.read.parquet(sf("embeddings"))
    .select(col("vec_id").as("idx"), col("embedding").as("vector"))

  private def queries() = spark.read.parquet(sf("embeddings"))
    .filter(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))

  private val cfg = SearchConfig(k = 8, fillMaskedIndices = false,
    queryIdCol = Some("qid"))
  private val cents = IVFDenseEngine.formulaCentroids(8, 64)

  test("addVectors == fixed-centroid build over the union, pruned search") {
    val all = corpus()
    val base = all.filter(col("idx") % 3 =!= 0)
    val extra = all.filter(col("idx") % 3 === 0)

    val full = IVFDenseEngine(all, nlist = 8, nprobe = 3, config = cfg,
      fixedCentroids = Some(cents))
    val inc = IVFDenseEngine(base, nlist = 8, nprobe = 3, config = cfg,
      fixedCentroids = Some(cents)).addVectors(extra)

    val a = full(queries()).orderBy("qid").collect()
    val b = inc(queries()).orderBy("qid").collect()
    assert(a.sameElements(b))
  }

  test("addVectors from a KMeans-built base pins the fitted centroids") {
    val all = corpus()
    val base = all.filter(col("idx") % 2 === 0)
    val extra = all.filter(col("idx") % 2 =!= 0)
    val baseEng = IVFDenseEngine(base, nlist = 4, nprobe = 4, config = cfg)
    val inc = baseEng.addVectors(extra)
    // pinned quantizer: the incremental engine's centroids ARE the base's
    val c0 = baseEng.centroids.orderBy("cid").collect()
    val c1 = inc.centroids.orderBy("cid").collect()
    assert(c0.map(_.getSeq[Double](1)).toSeq == c1.map(_.getSeq[Double](1)).toSeq)
    // nprobe = nlist: exact search, so results == brute force over union
    val bf = BruteForceDenseEngine(all, config = cfg)
    assert(inc(queries()).orderBy("qid").collect()
      .sameElements(bf(queries()).orderBy("qid").collect()))
    // index covers base + extra
    assert(inc.tagged.count() == all.count())
  }

  test("baseTagged without fixedCentroids is refused") {
    val all = corpus()
    intercept[IllegalArgumentException] {
      IVFDenseEngine(all, nlist = 4, config = cfg,
        baseTagged = Some(all.limit(1)))
    }
  }

  test("addVectors with stateDir but no fingerprint is refused") {
    // an unchanged state key would serve a previous add's cached tagged
    // frame — the engine must demand a content fingerprint instead
    val all = corpus()
    val dir = java.nio.file.Files.createTempDirectory("ivf-add-fp").toString
    val base = IVFDenseEngine(all.filter(col("idx") % 2 === 0), nlist = 8,
      nprobe = 3, config = cfg, fixedCentroids = Some(cents),
      stateDir = Some(dir), corpusFingerprint = "base-v1")
    intercept[IllegalArgumentException] {
      base.addVectors(all.filter(col("idx") % 2 =!= 0))
    }
    // with a fingerprint it proceeds (and distinct adds get distinct keys)
    val inc = base.addVectors(all.filter(col("idx") % 2 =!= 0), "base+odd-v1")
    assert(inc.corpusFingerprint == "base+odd-v1")
  }
}
