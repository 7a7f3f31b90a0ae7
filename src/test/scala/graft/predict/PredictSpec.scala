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

  test("batched GEMM MLP: blocked forward equals the per-row reference") {
    import spark.implicits._
    val m = MlpModel.formula(4, 3, 2)
    // per-row reference with the same k-ascending accumulation
    def ref(x: Array[Double]): Array[Double] = {
      val h = Array.tabulate(3) { j =>
        var acc = 0d
        (0 until 4).foreach(k => acc += x(k) * m.w1(k)(j))
        math.max(acc + m.b1(j), 0d)
      }
      Array.tabulate(2) { j =>
        var acc = 0d
        (0 until 3).foreach(k => acc += h(k) * m.w2(k)(j))
        acc + m.b2(j)
      }
    }
    val rows = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(4)(t => (i * 3 + t - 5).toFloat)))
    val withNull = rows.map { case (id, v) => (id, Option(v)) } :+
      (99L, None: Option[Array[Float]])
    val df = withNull.toDF("vec_id", "embedding")
    // blockSize 3 over 11 rows: four blocks, a partial tail, a null row
    val out = BatchedPredictPipe(m, "embedding", "vector", "vec_id",
      blockSize = 3)(df)
      .select("vec_id", "vector").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    rows.foreach { case (id, v) =>
      assert(out(id) == ref(v.map(_.toDouble)).toSeq, s"row $id") }
    assert(out(99L) == null, "null input must yield a null vector")
    // cache path: same values, stage persisted and hit
    val dir = Files.createTempDirectory("graft-mlp").toString
    val cachedPipe = BatchedPredictPipe(m, "embedding", "vector", "vec_id",
      blockSize = 3, cacheDir = Some(dir), datasetFingerprint = "t")
    val c1 = cachedPipe(df).select("vec_id", "vector").collect()
      .map(_.toString).sorted.toSeq
    val c2 = cachedPipe(df).select("vec_id", "vector").collect()
      .map(_.toString).sorted.toSeq
    assert(c1 == c2 && c1.size == 11)
    // a persisted cache without a dataset fingerprint is refused
    intercept[IllegalArgumentException] {
      BatchedPredictPipe(m, "embedding", "vector", "vec_id",
        cacheDir = Some(dir))
    }
  }

  test("fingerprint changes with model parameters") {
    val m2 = LinearModel(Seq(Seq.fill(64)(1.0)), Seq(0.1))
    assert(model.fingerprint != m2.fingerprint)
    assert(model.fingerprint ==
      LinearModel(Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble * 0.1)),
        Seq(0.0, -1.0)).fingerprint)
  }
}
