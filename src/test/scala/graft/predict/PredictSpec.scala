package graft.predict

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Port of the reference's cached-vs-direct equivalence test
  * (tests/pipes/test_predict.py:119-164).
  */
class PredictSpec extends SparkSpec {

  private val model = LinearModel(
    Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble * 0.1)), Seq(0.0, -1.0))

  test("PredictWithCache equals PredictWithoutCache, and the cache is hit") {
    val dir = Files.createTempDirectory("graft-predict").toString
    val emb = spark.read.parquet(sf("embeddings")).select("vec_id", "embedding")
    val direct = PredictWithoutCache(model, "embedding", "vector")(emb)
      .select("vec_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cachedPipe = PredictWithCache(model, "embedding", "vector",
      idCol = "vec_id", cacheDir = dir, datasetFingerprint = "t")
    val cached = cachedPipe(emb).select("vec_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(direct.keySet == cached.keySet)
    direct.foreach { case (k, v) =>
      v.zip(cached(k)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
    // second application reads the materialized cache (dir non-empty with
    // a _SUCCESS under the key) and returns the same values
    assert(new java.io.File(dir).listFiles().nonEmpty)
    val again = cachedPipe(emb).select("vec_id", "vector").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == cached)
  }

  test("fingerprint changes with model parameters") {
    val m2 = LinearModel(Seq(Seq.fill(64)(1.0)), Seq(0.1))
    assert(model.fingerprint != m2.fingerprint)
    assert(model.fingerprint ==
      LinearModel(Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble * 0.1)),
        Seq(0.0, -1.0)).fingerprint)
  }
}
