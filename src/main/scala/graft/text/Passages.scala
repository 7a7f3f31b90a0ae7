package graft.text

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => htransform, _}

/** T2 `GeneratePassages` (reference: warp_pipes/pipes/passages.py:16-289;
  * window kernel `gen_passages` passages.py:292-368).
  *
  * 1→N row generator: splits each document's token sequence into overlapping
  * windows of `size` with `stride`, emitting per passage:
  *   `{field.}input_ids / attention_mask / offset_mapping / text /
  *    passage_idx / passage_mask` plus carried `globalKeys`.
  *
  * Kernel semantics reproduced exactly from the reference:
  *   - effective size/stride shrink by start/end token counts
  *     (passages.py:323-339);
  *   - margin = effSize - effStride; first window has no left margin
  *     (left_pad = 0 for i == 0, passages.py:342);
  *   - a window is emitted only if it has unmasked tokens
  *     (len(seq) > left_pad, passages.py:349);
  *   - windows are right-padded to `size` with pad tokens, mask zeroed over
  *     padding (passages.py:352-360) — so every token of the document is
  *     unmasked in EXACTLY one passage (the golden property,
  *     tests/pipes/test_passages.py:63-83);
  *   - passage text = document substring spanning the window's non-negative
  *     char offsets (passages.py:273-278);
  *   - `prependField` prepends that field's token ids to every window's
  *     start tokens and its text to the passage text (passages.py:243-271).
  *
  * Spark-first lowering: the whole kernel is Column arithmetic —
  * `sequence` for window starts, `filter` for the emission rule,
  * `posexplode` for the 1→N generation, `slice`/`concat`/`transform` for
  * window assembly. No UDF, no shuffle; stays inside whole-stage codegen
  * and scales linearly with corpus size at any cluster width.
  */
case class GeneratePassagesPipe(
    size: Int,
    stride: Int,
    field: Option[String] = None,
    prependField: Option[String] = None,
    startTokens: Seq[Int] = Nil,
    endTokens: Seq[Int] = Nil,
    padTokenId: Int = 0,
    globalKeys: Seq[String] = Nil) extends Pipe {

  override def params = Map(
    "size" -> size.toString, "stride" -> stride.toString,
    "field" -> field.mkString, "prependField" -> prependField.mkString,
    "startTokens" -> startTokens.mkString(","), "endTokens" -> endTokens.mkString(","),
    "padTokenId" -> padTokenId.toString, "globalKeys" -> globalKeys.mkString(","))

  private def fp: String = field.map(_ + ".").getOrElse("")

  protected def transform(df0: DataFrame, keys: Seq[String]): DataFrame = {
    // window arithmetic + per-window array slicing is expression-heavy;
    // keep it off a small file's 1-2 input splits
    val df = Pipe.widen(df0)
    val ids = qcol(s"${fp}input_ids")
    val am = qcol(s"${fp}attention_mask")
    val om = qcol(s"${fp}offset_mapping")
    val txt = qcol(s"${fp}text")

    val startIds: Column = prependField match {
      case Some(pf) => concat(typedLit(startTokens), qcol(s"$pf.input_ids"))
      case None => typedLit(startTokens)
    }

    val n = coalesce(org.apache.spark.sql.functions.size(ids), lit(0))
    val lenS = org.apache.spark.sql.functions.size(startIds)
    val lenE = lit(endTokens.length)
    val effSize = lit(size) - lenS - lenE
    val effStride = lit(stride) - lenS - lenE
    val margin = effSize - effStride
    // left_pad = margin//2 + margin%2 (except first window), right_pad = margin//2
    val leftPadBase = floor((margin.cast("double") + 1) / 2).cast("int")
    val rightPad = floor(margin.cast("double") / 2).cast("int")

    def leftPad(i: Column): Column = when(i === 0, 0).otherwise(leftPadBase)
    def seqLen(i: Column): Column = least(effSize, n - i)

    // window starts: range(0, n, effStride), keeping only windows with
    // unmasked tokens (len(seq) > left_pad)
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), effStride),
      i => seqLen(i) > leftPad(i))

    val carried = globalKeys.filter(df.columns.contains)
    val prepText: Column =
      prependField.map(pf => qcol(s"$pf.text")).getOrElse(lit(""))
    val exploded = df.select(
      carried.map(qcol) ++ Seq(
        ids.as("__ids__"), am.as("__am__"), om.as("__om__"), txt.as("__txt__"),
        prepText.as("__txt_prep__"),
        startIds.as("__start__"), n.as("__n__"), effSize.as("__effsz__"),
        leftPadBase.as("__lpb__"), rightPad.as("__rp__"),
        posexplode(starts).as(Seq(s"${fp}passage_idx", "__i__"))): _*)

    val i = col("__i__")
    val en = col("__n__")
    val eSz = col("__effsz__")
    val eLenS = org.apache.spark.sql.functions.size(col("__start__"))
    val eLeft = when(i === 0, 0).otherwise(col("__lpb__"))
    val eRight = col("__rp__")
    val eSeqLen = least(eSz, en - i)
    val ePad = eSz - eSeqLen
    val center = eSz - eLeft - eRight

    val outIds = concat(
      col("__start__"),
      slice(col("__ids__"), i + 1, eSeqLen),
      typedLit(endTokens),
      array_repeat(lit(padTokenId), ePad))
    val outAm = concat(
      htransform(col("__start__"), _ => lit(1)),
      slice(col("__am__"), i + 1, eSeqLen),
      typedLit(endTokens.map(_ => 1)),
      array_repeat(lit(0), ePad))
    val negPair = array(lit(-1), lit(-1))
    val outOm = concat(
      htransform(col("__start__"), _ => negPair),
      slice(col("__om__"), i + 1, eSeqLen),
      typedLit(endTokens.map(_ => Seq(-1, -1))),
      array_repeat(negPair, ePad))
    // mask: zeros over start tokens + left margin, ones over the center,
    // zeros over end tokens + right margin; finally the last `padding`
    // positions are force-zeroed (reference passages.py:354-360 — note end
    // tokens themselves are NOT re-zeroed, faithfully reproduced)
    val total = eLenS + eSz + lenE
    val outMask = htransform(
      sequence(lit(0), total - 1),
      p => when(p >= eLenS + eLeft && p < eLenS + eLeft + center &&
        p < total - ePad, 1).otherwise(0))
    // passage text from the window's non-negative char offsets
    val offVals = filter(flatten(slice(col("__om__"), i + 1, eSeqLen)), _ >= 0)
    val mn = array_min(offVals)
    val mx = array_max(offVals)
    val passageText = col("__txt__").substr(mn + 1, mx - mn)
    val outText = concat(col("__txt_prep__"), passageText)

    exploded.select(
      carried.map(qcol) ++ Seq(
        col(s"`${fp}passage_idx`"),
        outIds.as(s"${fp}input_ids"),
        outAm.as(s"${fp}attention_mask"),
        outOm.as(s"${fp}offset_mapping"),
        outMask.as(s"${fp}passage_mask"),
        outText.as(s"${fp}text")): _*)
  }
}
