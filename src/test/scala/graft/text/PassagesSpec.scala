package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Port of the reference's golden passage properties
  * (tests/pipes/test_passages.py:63-83): over overlapping windows,
  * every input token is unmasked in EXACTLY one passage, and all windows
  * are padded to uniform length.
  */
class PassagesSpec extends SparkSpec {
  import spark.implicits._

  private def checkExactlyOnce(
      size: Int, stride: Int, startTokens: Seq[Int], endTokens: Seq[Int],
      lengths: Seq[Int]): Unit = {
    val docs = lengths.zipWithIndex.map { case (n, id) =>
      (id.toLong, (0 until n).map(_.toString).mkString(" "))
    }.toDF("doc_id", "text")
    val toks = TokenizerPipe()(docs)
    val out = GeneratePassagesPipe(size, stride,
      startTokens = startTokens, endTokens = endTokens,
      globalKeys = Seq("doc_id"))(toks)
    val rows = out.select("doc_id", "passage_idx", "input_ids", "passage_mask")
      .collect()

    // uniform window length
    rows.foreach { r =>
      assert(r.getSeq[Int](2).length == size,
        s"window not padded to $size: $r")
      assert(r.getSeq[Int](3).length == size)
    }

    // each real token position unmasked exactly once. NB the reference
    // kernel can also leave END tokens unmasked when the last window's tail
    // is shorter than the centre (passages.py:354-360 zeroes only the
    // padding, not the end tokens; its own property test never hits this —
    // test_passages.py uses no end_tokens and zip() truncates). We
    // reproduce that faithfully, so coverage here counts only positions
    // that carry real document tokens.
    val lenS = startTokens.length
    val effSize = size - startTokens.length - endTokens.length
    val effStride = stride - startTokens.length - endTokens.length
    val docLen = lengths.zipWithIndex.map { case (n, id) => id.toLong -> n }.toMap
    val covered = rows.groupBy(_.getLong(0)).map { case (docId, prs) =>
      val n = docLen(docId)
      val idxs = prs.flatMap { r =>
        val i = r.getInt(1) * effStride
        val seqLen = math.min(effSize, n - i)
        r.getSeq[Int](3).zipWithIndex.collect {
          case (1, pos) if pos >= lenS && pos < lenS + seqLen => i + (pos - lenS)
        }
      }
      docId -> idxs.sorted.toList
    }
    lengths.zipWithIndex.foreach { case (n, id) =>
      val expect = (0 until n).toList
      assert(covered(id.toLong) == expect,
        s"doc $id: coverage ${covered(id.toLong)} != $expect " +
          s"(size=$size stride=$stride st=$startTokens et=$endTokens)")
    }
  }

  private val lengths = Seq(1, 2, 5, 9, 10, 11, 17, 23, 40, 63, 100)

  test("every token unmasked exactly once — plain windows") {
    checkExactlyOnce(10, 7, Nil, Nil, lengths)
  }
  test("every token unmasked exactly once — non-overlapping") {
    checkExactlyOnce(10, 10, Nil, Nil, lengths)
  }
  test("every token unmasked exactly once — with start/end tokens") {
    checkExactlyOnce(12, 9, Seq(101), Seq(102), lengths)
    checkExactlyOnce(24, 16, Seq(1), Seq(2), lengths)
  }

  test("passage text reconstructs the original document") {
    val docs = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = GeneratePassagesPipe(4, 3, globalKeys = Seq("doc_id"))(
      TokenizerPipe()(docs))
    val texts = out.orderBy("passage_idx").select("text").as[String].collect()
    // strided windows: each passage text is a contiguous substring
    texts.foreach(t => assert("alpha beta gamma delta epsilon zeta eta theta".contains(t)))
    // concatenating center regions covers the doc: first words of each window step by stride
    assert(texts.head.startsWith("alpha"))
    assert(texts.last.endsWith("theta"))
  }
}
