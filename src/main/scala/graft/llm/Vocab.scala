package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Corpus vocabulary learning + encoding: rank tokens by frequency, keep
  * the top `vocabSize` as ids 0..V-1 (count desc, token asc — fully
  * deterministic), and encode every document as its token-id sequence
  * with OOV tokens mapped to `oovId`.
  *
  * Scale shape: the vocab build is a map-side-combined token count
  * followed by `orderBy(...).limit(V)` — Spark lowers that to
  * TakeOrderedAndProject (per-partition top-V then a V-row merge, never
  * a global sort); the final id stamping is a window over V rows. The
  * encode side explodes tokens, probes the BROADCAST vocab, and
  * re-assembles per doc in original token order — the 100 TB side never
  * shuffles on the token, only on the doc id for reassembly.
  */
object VocabOps {

  /** (token, id, count), ids 0..size-1 by (count desc, token asc). */
  def build(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, "vocab size must be positive")
    val top = df
      .select(explode(TextAnalysisOps.toks(qcol(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("token")).limit(size)
    top.withColumn("id",
      (row_number().over(Window.orderBy(col("count").desc, col("token"))) - 1)
        .cast("int"))
  }
}

/** Learn the vocabulary from the input corpus itself and encode it (the
  * one-pass flow of training-data tokenization); for a PRE-BUILT
  * vocabulary (encode a new corpus with a frozen vocab), pass it in.
  */
case class VocabEncodePipe(
    textCol: String,
    idCol: String,
    vocabSize: Int,
    outputCol: String = "token_ids",
    oovCountCol: String = "n_oov",
    oovId: Long = -1L,
    prebuilt: Option[DataFrame] = None) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "id" -> idCol,
    "size" -> vocabSize.toString, "out" -> outputCol, "oov" -> oovId.toString,
    "prebuilt" -> prebuilt.isDefined.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // no widen: both consumers shuffle immediately anyway (vocab build
    // aggregates; encode explodes into a join + groupBy), so the
    // aggregation exchanges already redistribute — a prior round-robin
    // exchange of full rows was pure extra cost (r19: 0.95 -> 1.55 s)
    val wide = df
    val vocab = broadcast(
      prebuilt.getOrElse(VocabOps.build(wide, textCol, vocabSize))
        .select(col("token"), col("id")))
    val toks = wide.select(qcol(idCol).as("__vb_id__"),
      posexplode(TextAnalysisOps.toks(qcol(textCol)))
        .as(Seq("__vb_pos__", "token")))
    val enc = toks.join(vocab, Seq("token"), "left")
      .groupBy("__vb_id__")
      .agg(
        arrTransform(
          array_sort(collect_list(struct(col("__vb_pos__").as("p"),
            coalesce(col("id").cast("long"), lit(oovId)).as("v")))),
          x => x.getField("v")).as("__vb_ids__"),
        sum(when(col("id").isNull, 1).otherwise(0)).cast("int")
          .as("__vb_oov__"))
    wide.join(enc, qcol(idCol) === col("__vb_id__"), "left")
      .withColumn(outputCol,
        coalesce(col("__vb_ids__"), array().cast("array<bigint>")))
      .withColumn(oovCountCol, coalesce(col("__vb_oov__"), lit(0)))
      .drop("__vb_id__", "__vb_ids__", "__vb_oov__")
  }
}
