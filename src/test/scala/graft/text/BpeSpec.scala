package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE learn + encode: hand-computed merges, losslessness, and a full
  * differential run against an independent scalar Scala oracle on real
  * docs (the reference's naive-oracle test pattern, SURVEY §5.3 — an
  * iterative fold has no SQL twin, so this surface is spec-verified).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar reimplementation of the pinned semantics: merges
    * in list order, one left-to-right greedy pass each.
    */
  private def scalarEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    def onePass(sym: List[String], a: String, b: String): List[String] =
      sym match {
        case x :: y :: rest if x == a && y == b => (a + b) :: onePass(rest, a, b)
        case x :: rest => x :: onePass(rest, a, b)
        case Nil => Nil
      }
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
        case (sym, (a, b)) => onePass(sym, a, b)
      }
    }
  }

  test("learn recovers the classic low/lower merges") {
    val corpus = Seq.fill(5)("low").mkString(" ") + " lower lower newest newest"
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = BpeOps.learn(df, "text", numMerges = 2)
    // (l,o) appears 7x (tie with (o,w) broken by (a,b) asc), then (lo,w)
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    val out = BpeEncodePipe("text", merges)(Seq((1L, "lowest low"))
      .toDF("doc_id", "text"))
      .select("bpe_tokens").as[Seq[String]].head()
    assert(out == Seq("low", "e", "s", "t", "low"))
  }

  test("greedy left-to-right pass on self-overlapping repeats") {
    val out = BpeEncodePipe("text", Seq(("a", "a")))(
      Seq((1L, "aaa aaaa")).toDF("doc_id", "text"))
      .select("bpe_tokens").as[Seq[String]].head()
    assert(out == Seq("aa", "a", "aa", "aa"))
  }

  test("encode matches the scalar oracle and is lossless on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val merges = BpeOps.learn(docs, "text", numMerges = 8)
    assert(merges.size == 8) // real text has >= 8 frequent pairs
    val out = BpeEncodePipe("text", merges)(docs)
      .select("doc_id", "text", "bpe_tokens", "n_bpe_tokens")
      .collect()
    out.foreach { r =>
      val expected = scalarEncode(r.getString(1), merges)
      assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)}")
      assert(r.getInt(3) == expected.size)
      // lossless: concatenated subwords reproduce the words
      assert(r.getSeq[String](2).mkString ==
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).mkString)
    }
  }
}
