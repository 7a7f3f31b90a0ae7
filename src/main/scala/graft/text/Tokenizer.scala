package graft.text

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** T1 `TokenizerPipe` (reference: warp_pipes/pipes/tokenizer.py:13-55).
  *
  * The reference delegates to a HuggingFace fast tokenizer; here tokenization
  * is a pure Spark expression pipeline (whole-stage codegen, no UDF):
  *
  *   - tokens: whitespace split of the `key` column;
  *   - `input_ids`: deterministic polynomial rolling hash of each token's
  *     code points modulo `vocabSize` (a self-contained "vocab" — the
  *     reference's BM25 support builds exactly this kind of regex/whitespace
  *     term space, support/elasticsearch.py:374-381). An explicit `vocab`
  *     map can override it;
  *   - `attention_mask`: all ones;
  *   - `offset_mapping`: [start, end) char offsets per token, reconstructed
  *     as a running sum over token lengths + single separator (the driver
  *     corpus is single-space separated; arbitrary whitespace runs would
  *     need a regex-matching kernel instead).
  *
  * Output columns are prefixed `field.` when `field` is set, mirroring the
  * reference's dotted-namespace convention.
  */
case class TokenizerPipe(
    key: String = "text",
    field: Option[String] = None,
    maxLength: Option[Int] = None,
    vocabSize: Int = 1000003,
    returnOffsetsMapping: Boolean = true,
    vocab: Map[String, Int] = Map.empty,
    /** Emit `token_type_ids` (all zeros — single-sequence segment ids, the
      * HF convention; reference `return_token_type_ids`,
      * pipes/tokenizer.py:23).
      */
    returnTokenTypeIds: Boolean = false,
    /** `(bosId, eosId)`: wrap every sequence in special tokens (reference
      * `add_special_tokens`, pipes/tokenizer.py:25; HF single-sequence
      * convention): `input_ids = bos +: ids :+ eos`, attention 1s,
      * token types 0s, offsets `(0, 0)` for both specials. `maxLength`
      * is the TOTAL budget including the two specials, as in HF.
      */
    specialTokens: Option[(Int, Int)] = None) extends Pipe {

  // maxLength is the TOTAL budget including the two specials; a budget
  // that cannot even hold bos+eos would silently emit 2 > maxLength
  // tokens — refuse loudly instead (HF raises here too)
  require(specialTokens.isEmpty || maxLength.forall(_ >= 2),
    s"maxLength=$maxLength cannot hold the two special tokens")

  override def update: Boolean = true
  override def params = Map(
    "key" -> key, "field" -> field.mkString, "maxLength" -> maxLength.mkString,
    "vocabSize" -> vocabSize.toString, "offsets" -> returnOffsetsMapping.toString,
    "tokenTypes" -> returnTokenTypeIds.toString,
    "specials" -> specialTokens.map { case (b, e) => s"$b,$e" }.mkString,
    "vocab" -> vocab.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","))

  private def fp: String = field.map(_ + ".").getOrElse("")
  private def inKey: String = field.map(f => s"$f.$key").getOrElse(key)

  /** Deterministic token id: fold (h*31 + codePoint) % vocabSize over the
    * token's characters, seed 7. Reproducible in any engine (the DuckDB
    * oracle mirrors it 1:1).
    */
  def tokenId(t: Column): Column = {
    // filter: JVM split("") can emit a trailing empty element
    val chars = filter(split(t, ""), c => length(c) > 0)
    val fromHash = aggregate(
      chars,
      lit(7L),
      (h, c) => pmod(h * lit(31L) + ascii(c).cast("long"), lit(vocabSize.toLong)))
      .cast(IntegerType)
    if (vocab.isEmpty) fromHash
    else {
      val m = map(vocab.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      coalesce(element_at(m, t), fromHash)
    }
  }

  protected def transform(df0: DataFrame, keys: Seq[String]): DataFrame = {
    // per-token interpreted HOF work (the offset fold, char-fold ids) must
    // not serialize on a small file's 1-2 input splits
    val df = Pipe.widen(df0)
    val raw = filter(split(trim(qcol(inKey)), "\\s+"), t => length(t) > 0)
    // specials consume 2 slots of the maxLength budget (HF semantics)
    val budget = maxLength.map(m =>
      if (specialTokens.isDefined) math.max(m - 2, 0) else m)
    val toks = budget.fold(raw)(m => slice(raw, 1, m))
    val offsets = aggregate(
      toks,
      struct(lit(0).as("pos"),
        array().cast(ArrayType(ArrayType(IntegerType))).as("offs")),
      (acc, t) => struct(
        (acc.getField("pos") + length(t) + 1).as("pos"),
        concat(acc.getField("offs"),
          array(array(acc.getField("pos"),
            acc.getField("pos") + length(t)))).as("offs")),
      acc => acc.getField("offs"))
    def wrapped(core: Column, bosVal: Column, eosVal: Column): Column =
      specialTokens.fold(core)(_ =>
        concat(array(bosVal), core, array(eosVal)))
    val zeroOff = array(lit(0), lit(0))
    val outs = Seq(
      s"${fp}input_ids" -> wrapped(transform_col(toks, tokenId),
        lit(specialTokens.map(_._1).getOrElse(0)),
        lit(specialTokens.map(_._2).getOrElse(0))),
      s"${fp}attention_mask" -> wrapped(transform_col(toks, _ => lit(1)),
        lit(1), lit(1))) ++
      (if (returnTokenTypeIds)
        Seq(s"${fp}token_type_ids" -> wrapped(transform_col(toks, _ => lit(0)),
          lit(0), lit(0))) else Nil) ++
      (if (returnOffsetsMapping)
        Seq(s"${fp}offset_mapping" -> wrapped(offsets, zeroOff, zeroOff))
       else Nil)
    finish(df, outs)
  }

  // `transform` collides with our own method name inside this class
  private def transform_col(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)
}

object TokenizerPipe {
  /** Tokenize with a FROZEN public vocab (vocab.json / vocab JSONL via
    * [[PretrainedVocab.loadVocab]]): known tokens map to their published
    * ids, unknown tokens fall back to the rolling-hash id space.
    */
  def fromPretrained(
      spark: org.apache.spark.sql.SparkSession,
      vocabPath: String,
      key: String = "text",
      field: Option[String] = None,
      maxLength: Option[Int] = None): TokenizerPipe =
    TokenizerPipe(key = key, field = field, maxLength = maxLength,
      vocab = PretrainedVocab.loadVocab(spark, vocabPath))
}
