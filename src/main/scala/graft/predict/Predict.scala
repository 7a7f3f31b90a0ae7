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
case class LinearModel(weights: Seq[Seq[Double]], bias: Seq[Double])
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

  def fingerprint: String = Fingerprint.ofStruct(
    "LinearModel",
    Map("weights" -> weights.map(_.mkString(",")).mkString(";"),
      "bias" -> bias.mkString(",")))
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
