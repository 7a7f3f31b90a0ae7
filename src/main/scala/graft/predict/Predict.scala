package graft.predict

import graft.core.{CachedStage, Fingerprint, Pipe}
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-inference pipes (reference: warp_pipes/pipes/predict.py M1-M3 +
  * support/caching.py M4).
  *
  * A [[VectorModel]] is a pure Column function `array<float> =>
  * array<double>` with a content fingerprint — the Spark-first stand-in
  * for the reference's torch module: inference is a plan expression
  * (whole-stage codegen, broadcast-free, scales with the scan), not a
  * driver-side forward loop. Real NN inference would swap in a
  * mapPartitions kernel holding a broadcast weight blob — the pipe
  * contract stays identical.
  */
trait VectorModel extends Serializable {
  def apply(input: Column): Column
  def fingerprint: String
}

/** Linear layer `out[j] = sum_i w[j][i] * x[i] + b[j]` (the reference's
  * test oracle `DummyModel`, tests/utils/dummy_model.py:10-38) as a pure
  * expression: `transform` over weight rows, `aggregate` dot product.
  */
case class LinearModel(weights: Seq[Seq[Double]], bias: Seq[Double],
    sourceDigest: Option[String] = None)
    extends VectorModel {
  require(weights.nonEmpty && weights.size == bias.size)

  def apply(input: Column): Column = {
    val rows = weights.zip(bias).map { case (w, b) =>
      aggregate(
        zip_with(typedLit(w), input, (wi, xi) => wi * xi.cast("double")),
        lit(0d), (acc, v) => acc + v) + lit(b)
    }
    array(rows: _*)
  }

  /** File-loaded models fingerprint by the SOURCE FILE digest (O(1) for
    * real checkpoint sizes); in-code models by the weight values.
    */
  def fingerprint: String = sourceDigest match {
    case Some(d) => Fingerprint.ofStruct("LinearModel", Map("file_sha256" -> d))
    case None => Fingerprint.ofStruct(
      "LinearModel",
      Map("weights" -> weights.map(_.mkString(",")).mkString(";"),
        "bias" -> bias.mkString(",")))
  }
}

object LinearModel {
  /** Load from a safetensors checkpoint. The weight matrix is expected in
    * the torch `Linear` layout `[out, in]` (each row one output unit —
    * [[LinearModel]]'s own layout); pass `transposed = true` for files
    * that store `[in, out]`. Fingerprint = file SHA-256.
    */
  def fromSafeTensors(
      path: String,
      wName: String = "weight",
      bName: String = "bias",
      transposed: Boolean = false): LinearModel = {
    val (ts, digest) = WeightIO.readSafeTensorsWithDigest(path)
    def get(n: String) = ts.getOrElse(n, throw new IllegalArgumentException(
      s"$path has no tensor '$n' (present: ${ts.keys.toSeq.sorted.mkString(", ")})"))
    val w = if (transposed) get(wName).transposed else get(wName)
    LinearModel(w.matrix, get(bName).vector, sourceDigest = Some(digest))
  }
}

/** M1 `PredictWithoutCache` (predict.py:34-64): run the model inline. */
case class PredictWithoutCache(
    model: VectorModel,
    inputCol: String,
    outputCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("model" -> model.fingerprint,
    "in" -> inputCol, "out" -> outputCol)
  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame =
    finish(df, Seq(outputCol -> model(qcol(inputCol))))
}

/** M2 `PredictWithCache` (predict.py:67-255): precompute `(id, vector)`
  * once into a fingerprint-keyed parquet cache
  * (`hash(model, dataset)` — predict.py:212-221), then serve queries by
  * an equi-join on the row id (the reference's lookup-by-row-idx,
  * predict.py:99-129, with Parquet replacing the TensorStore — M4/M5
  * collapse into [[CachedStage]]).
  *
  * `datasetFingerprint` identifies the input data (e.g. source path +
  * snapshot); the cache key combines it with the model fingerprint.
  */
case class PredictWithCache(
    model: VectorModel,
    inputCol: String,
    outputCol: String,
    idCol: String,
    cacheDir: String,
    datasetFingerprint: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("model" -> model.fingerprint, "in" -> inputCol,
    "out" -> outputCol, "id" -> idCol, "dataset" -> datasetFingerprint)

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    val key = CachedStage.cacheKey(datasetFingerprint, fingerprint)
    val vectors = CachedStage(df.sparkSession, cacheDir, key) {
      df.select(qcol(idCol), model(qcol(inputCol)).as(outputCol))
    }
    df.join(vectors, Seq(idCol))
  }
}

/** M3 `Predict` (predict.py:258-292): cache-or-compute dispatch. */
object Predict {
  def apply(
      model: VectorModel,
      inputCol: String,
      outputCol: String,
      idCol: String = "idx",
      cacheDir: Option[String] = None,
      datasetFingerprint: String = ""): Pipe = cacheDir match {
    case Some(dir) =>
      PredictWithCache(model, inputCol, outputCol, idCol, dir, datasetFingerprint)
    case None => PredictWithoutCache(model, inputCol, outputCol)
  }
}

/** Deterministic two-layer MLP (GEMM → bias → ReLU → GEMM → bias) — the
  * "transformer-shaped" inference kernel: unlike [[LinearModel]]'s
  * per-row Column expressions, [[BatchedPredictPipe]] runs it as BLOCKED
  * dense GEMMs inside `mapPartitions` (one X·W per block of rows, flat
  * double arrays, k-ascending accumulation), which is the throughput
  * shape real model serving needs — weights broadcast once per task,
  * arithmetic over contiguous buffers, no per-element expression
  * interpretation. Accumulation is strictly k-ascending per output, so
  * any engine replays the values bit-for-bit (the m4 gate's DuckDB
  * oracle recomputes both layers from the weight formula).
  *
  * Reference: pipes/predict.py:151-191 runs actual torch checkpoints
  * through Lightning; this carries the same pipe contract with a
  * deterministic, engine-replayable network.
  */
case class MlpModel(
    w1: Seq[Seq[Double]], b1: Seq[Double],
    w2: Seq[Seq[Double]], b2: Seq[Double],
    sourceDigest: Option[String] = None) extends Serializable {
  require(w1.nonEmpty && w1.head.size == b1.size, "w1 is dIn x dHidden")
  require(w2.size == b1.size && w2.head.size == b2.size, "w2 is dHidden x dOut")
  val dIn: Int = w1.size
  val dHidden: Int = b1.size
  val dOut: Int = b2.size

  /** File-loaded models fingerprint by the SOURCE FILE digest (O(1) for
    * real checkpoint sizes); in-code models by the weight values.
    */
  def fingerprint: String = sourceDigest match {
    case Some(d) => Fingerprint.ofStruct("MlpModel", Map("file_sha256" -> d))
    case None => Fingerprint.ofStruct("MlpModel", Map(
      "w1" -> w1.map(_.mkString(",")).mkString(";"), "b1" -> b1.mkString(","),
      "w2" -> w2.map(_.mkString(",")).mkString(";"), "b2" -> b2.mkString(",")))
  }

  @transient private lazy val fw1: Array[Double] =
    w1.flatten.toArray // row-major [k][j]
  @transient private lazy val fw2: Array[Double] = w2.flatten.toArray
  @transient private lazy val fb1: Array[Double] = b1.toArray
  @transient private lazy val fb2: Array[Double] = b2.toArray

  /** One blocked forward pass: `xs` is n rows of dIn; returns n rows of
    * dOut. i-k-j loop order — contiguous access on both the input row
    * and the weight row, still k-ascending per (i, j) output.
    */
  def forward(xs: Array[Array[Double]]): Array[Array[Double]] = {
    val n = xs.length
    val h = Array.ofDim[Double](n, dHidden)
    var i = 0
    while (i < n) {
      val x = xs(i); val hi = h(i)
      var k = 0
      while (k < dIn) {
        val xk = x(k); val wOff = k * dHidden
        var j = 0
        while (j < dHidden) { hi(j) += xk * fw1(wOff + j); j += 1 }
        k += 1
      }
      var j = 0
      while (j < dHidden) {
        val v = hi(j) + fb1(j)
        hi(j) = if (v > 0) v else 0d
        j += 1
      }
      i += 1
    }
    val y = Array.ofDim[Double](n, dOut)
    i = 0
    while (i < n) {
      val hi = h(i); val yi = y(i)
      var k = 0
      while (k < dHidden) {
        val hk = hi(k); val wOff = k * dOut
        var j = 0
        while (j < dOut) { yi(j) += hk * fw2(wOff + j); j += 1 }
        k += 1
      }
      var j = 0
      while (j < dOut) { yi(j) += fb2(j); j += 1 }
      i += 1
    }
    y
  }
}

object MlpModel {
  /** Formula weights for gates/specs — integer arithmetic then one exact
    * binary scale, replayable in any engine:
    * w1[k][j] = ((k·7+j·11) mod 9 − 4)/8,  b1[j] = (j mod 5)/16,
    * w2[k][j] = ((k·13+j·5) mod 9 − 4)/8,  b2[j] = (j mod 7)/16.
    */
  def formula(dIn: Int, dHidden: Int, dOut: Int): MlpModel = MlpModel(
    (0 until dIn).map(k => (0 until dHidden).map(j =>
      (((k * 7 + j * 11) % 9) - 4) * 0.125)),
    (0 until dHidden).map(j => (j % 5) * 0.0625),
    (0 until dHidden).map(k => (0 until dOut).map(j =>
      (((k * 13 + j * 5) % 9) - 4) * 0.125)),
    (0 until dOut).map(j => (j % 7) * 0.0625))

  /** Load from a safetensors checkpoint with tensors (w1, b1, w2, b2).
    * Default layout matches [[MlpModel]]: `w1` is `[dIn, dHidden]`, `w2`
    * `[dHidden, dOut]`. With `torchLayout = true` the weight matrices are
    * taken as torch `Linear` `[out, in]` and transposed on load (e.g.
    * names = ("fc1.weight","fc1.bias","fc2.weight","fc2.bias") for a
    * torch-exported two-layer probe). F32 values widen exactly to the
    * doubles the GEMM runs on; fingerprint = file SHA-256.
    */
  def fromSafeTensors(
      path: String,
      names: (String, String, String, String) = ("w1", "b1", "w2", "b2"),
      torchLayout: Boolean = false): MlpModel = {
    val (ts, digest) = WeightIO.readSafeTensorsWithDigest(path)
    fromTensors(path, ts, digest, names, torchLayout)
  }

  /** Load from an npz checkpoint (zip of npy arrays), same contract as
    * [[fromSafeTensors]].
    */
  def fromNpz(
      path: String,
      names: (String, String, String, String) = ("w1", "b1", "w2", "b2"),
      torchLayout: Boolean = false): MlpModel = {
    val (ts, digest) = WeightIO.readNpzWithDigest(path)
    fromTensors(path, ts, digest, names, torchLayout)
  }

  private def fromTensors(
      path: String,
      ts: Map[String, WeightIO.Tensor],
      digest: String,
      names: (String, String, String, String),
      torchLayout: Boolean): MlpModel = {
    def get(n: String) = ts.getOrElse(n, throw new IllegalArgumentException(
      s"$path has no tensor '$n' (present: ${ts.keys.toSeq.sorted.mkString(", ")})"))
    def mat(n: String) =
      (if (torchLayout) get(n).transposed else get(n)).matrix
    MlpModel(mat(names._1), get(names._2).vector,
      mat(names._3), get(names._4).vector,
      sourceDigest = Some(digest))
  }
}

/** Batched model inference: blocks of `blockSize` rows per GEMM inside
  * `mapPartitions` — map-only, runs as wide as the scan, weights ride
  * the closure (serialized once per task). Null inputs yield null
  * vectors. With `cacheDir` the computed (id, vector) frame persists
  * under the (datasetFingerprint, model fingerprint) key exactly like
  * [[PredictWithCache]].
  */
case class BatchedPredictPipe(
    model: MlpModel,
    inputCol: String,
    outputCol: String,
    idCol: String,
    blockSize: Int = 256,
    cacheDir: Option[String] = None,
    datasetFingerprint: String = "") extends Pipe {
  require(blockSize > 0, "blockSize must be positive")
  require(cacheDir.isEmpty || datasetFingerprint.nonEmpty,
    "a persisted predict cache needs a dataset fingerprint")
  override def update: Boolean = true
  override def params = Map("model" -> model.fingerprint, "in" -> inputCol,
    "out" -> outputCol, "id" -> idCol, "block" -> blockSize.toString,
    "dataset" -> datasetFingerprint)

  protected def transform(df: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val m = model
    val bs = blockSize
    // blocked forward over whatever columns `src` carries, appending the
    // vector in place — ONE scan, map-only, no shuffle
    def infer(src: DataFrame, xIdx: Int): DataFrame = {
      val outSchema = StructType(src.schema.fields :+
        StructField(outputCol, ArrayType(DoubleType), nullable = true))
      src.mapPartitions { rows =>
        rows.grouped(bs).flatMap { block =>
          val live = block.filter(!_.isNullAt(xIdx))
          val xs = live.map(_.getSeq[Any](xIdx)
            .map(v => v.asInstanceOf[Number].doubleValue()).toArray).toArray
          val ys = m.forward(xs)
          var j = -1
          block.map { r =>
            if (r.isNullAt(xIdx)) Row.fromSeq(r.toSeq :+ null)
            else { j += 1; Row.fromSeq(r.toSeq :+ ys(j).toIndexedSeq) }
          }
        }
      }(RowEncoder.encoderFor(outSchema))
    }
    cacheDir match {
      case Some(dir) =>
        // persisted (id, vector) stage + join back — the reuse shape:
        // a re-run (or another consumer of the same dataset+model key)
        // skips the forward pass entirely
        val vectors = CachedStage(spark, dir,
          CachedStage.cacheKey(datasetFingerprint, fingerprint)) {
          val in = df.select(qcol(idCol), qcol(inputCol).as("__x__"))
          infer(in, 1).drop("__x__")
        }
        df.join(vectors, Seq(idCol))
      case None =>
        // no cache: append in place — one scan, zero shuffles (a
        // self-join here would scan `df` twice and shuffle both sides
        // for nothing at scale)
        infer(df, df.schema.fieldIndex(inputCol))
    }
  }
}
