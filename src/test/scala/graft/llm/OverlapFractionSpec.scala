package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Overlap-fraction decontamination (the GPT-3/PaLM fractional protocol):
  * hand-computed counts and threshold arithmetic, distinct-gram
  * semantics, degenerate docs, batch ≡ stream parity, the exists-flag
  * cross-check, and the over-cap behaviors.
  */
class OverlapFractionSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("matched_ngrams"), col("total_ngrams"),
      col("overlap_bp"), col("contaminated"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap

  test("hand-computed counts, bp, and threshold boundary") {
    val eval = frame(100L -> "a b c x")
    // doc 1: distinct 2-grams {a b, b c, c d} — eval has {a b, b c, c x}
    // → matched 2/3, bp 6666; flagged at 6000, not at 6700
    val train = frame(1L -> "a b c d")
    val lo = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 2, thresholdBp = 6000)(train))(1L)
    assert(lo == ((2, 3, 6666, true)), s"got $lo")
    val hi = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 2, thresholdBp = 6700)(train))(1L)
    assert(hi == ((2, 3, 6666, false)), s"got $hi")
    // exact boundary: 1/2 matched at threshold 5000 → >= fires
    val half = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 2, thresholdBp = 5000)(frame(2L -> "a b z")))(2L)
    assert(half == ((1, 2, 5000, true)), s"got $half")
  }

  test("repeated grams count once — distinct semantics on both sides") {
    val eval = frame(100L -> "a b a b a b")
    val out = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 2, thresholdBp = 5000)(frame(1L -> "a b a b q")))(1L)
    // doc distinct 2-grams {a b, b a, b q}; eval distinct {a b, b a}
    assert(out == ((2, 3, 6666, true)), s"got $out")
  }

  test("gramless, empty, and null docs are never contaminated") {
    val eval = frame(100L -> "a b c")
    val train = Seq((1L, "one"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 2, thresholdBp = 1)(train))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((0, 0, 0, false)), s"doc $id: ${out(id)}")
    }
  }

  test("an eval document contained in the train set scores 10000 bp") {
    val eval = frame(100L -> "w x y z w")
    val out = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 3, thresholdBp = 7000)(frame(5L -> "w x y z w")))(5L)
    assert(out == ((3, 3, 10000, true)), s"got $out")
  }

  test("threshold 1 bp over small docs equals the exists-flag DecontaminatePipe") {
    // with total < 10000 distinct grams, matched*10000 >= 1*total iff
    // matched >= 1 — the exists flag; cross-check against the standing
    // pipe on real data
    val docs = spark.read.parquet(sf("documents")).select("doc_id", "text")
    val eval = docs.filter(col("doc_id") < 30)
    val frac = OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 4, thresholdBp = 1)(docs)
      .select(col("doc_id"), col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exists = DecontaminatePipe(eval, "text", "doc_id", ngramSize = 4)(docs)
      .select(col("doc_id"), col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(frac == exists)
  }

  test("stream ≡ batch: counts, bp, and flags bit-identical, zero state") {
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text").limit(120)
    val eval = docs.filter(col("doc_id") < 30)
    val batch = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 4, thresholdBp = 1500)(docs))
    val rows = docs.as[(Long, String)].collect()
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = graft.streaming.StreamingDecontaminate.fraction(
      mem.toDF.toDF("doc_id", "text"), eval, "text", "doc_id",
      ngramSize = 4, thresholdBp = 1500)
    val q = streamed.writeStream.format("memory")
      .queryName("of_parity").outputMode("append").start()
    try {
      mem.addData(rows.take(60).toIndexedSeq); q.processAllAvailable()
      mem.addData(rows.drop(60).toIndexedSeq); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.length == 0)
    } finally q.stop()
    val got = collectOut(spark.table("of_parity"))
    assert(got == batch)
  }

  test("over the literal cap a batch frame degrades, a stream refuses loudly") {
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text").limit(80)
    val eval = docs.filter(col("doc_id") < 30)
    // cap of 1 forces the over-cap path on any real eval corpus
    val degraded = collectOut(graft.streaming.StreamingDecontaminate.fraction(
      docs, eval, "text", "doc_id", ngramSize = 4, thresholdBp = 1500,
      maxEvalNgrams = 1))
    val direct = collectOut(OverlapFractionPipe(eval, "text", "doc_id",
      ngramSize = 4, thresholdBp = 1500, broadcastEval = false)(docs))
    assert(degraded == direct)
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val err = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDecontaminate.fraction(
        mem.toDF.toDF("doc_id", "text"), eval, "text", "doc_id",
        ngramSize = 4, maxEvalNgrams = 1)
    }
    assert(err.getMessage.contains("foreachBatch"),
      s"over-cap stream error should name the fallback: ${err.getMessage}")
  }

  test("set-probe fraction keeps exact counts, bp, and flags (forced)") {
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text").limit(80)
    val eval = docs.filter(col("doc_id") < 30)
    val expected = collectOut(graft.streaming.StreamingDecontaminate.fraction(
      docs, eval, "text", "doc_id", ngramSize = 4, thresholdBp = 1500))
    // force the over-threshold path: matched comes from the shipped-set
    // membership count instead of the in-plan literal intersect — over a
    // distinct gram array the two are bit-identical
    val probed = collectOut(graft.streaming.StreamingDecontaminate.fraction(
      docs, eval, "text", "doc_id", ngramSize = 4, thresholdBp = 1500,
      literalScanNgrams = 1))
    assert(probed == expected)
    assert(expected.values.exists(_._4) && expected.values.exists(!_._4))
    // and some clean rows carry nonzero matched counts — the probe must
    // not zero sub-threshold matches
    assert(expected.values.exists(v => v._1 > 0 && !v._4))
  }

  test("output column names participate in the pipe fingerprint") {
    // a fingerprint-keyed CachedStage replay must not serve a frame with
    // another instance's column names
    val eval = frame(100L -> "a b c")
    def pipe(bp: String, m: String, t: String) = OverlapFractionPipe(
      eval, "text", "doc_id", ngramSize = 2,
      matchedCol = m, totalCol = t, bpCol = bp)
    val base = pipe("overlap_bp", "matched_ngrams", "total_ngrams")
    assert(base.fingerprint != pipe("bp2", "matched_ngrams", "total_ngrams").fingerprint)
    assert(base.fingerprint != pipe("overlap_bp", "m2", "total_ngrams").fingerprint)
    assert(base.fingerprint != pipe("overlap_bp", "matched_ngrams", "t2").fingerprint)
  }

  test("key-set fingerprint is unambiguous over key boundaries") {
    // a separator byte alone is forgeable by a key containing that byte;
    // the FIXED-WIDTH 4-byte length prefix is prefix-free and is not
    import org.apache.spark.sql.graft.StringSetCountExpr.fingerprint
    assert(fingerprint(Seq("foo" + "\u001f" + "bar")) !=
      fingerprint(Seq("foo", "bar")))
    assert(fingerprint(Seq("foobar")) != fingerprint(Seq("foo", "bar")))
    assert(fingerprint(Seq("", "")) != fingerprint(Seq("")))
    assert(fingerprint(Seq("ab", "c")) != fingerprint(Seq("a", "bc")))
    assert(fingerprint(Seq("x", "y")) == fingerprint(Seq("x", "y")))
    // ADVICE r18's verified forgery against the old VARIABLE-width length
    // fold: len 31 encoded as the single byte 0x1f, aliasing the 0x1f
    // separator byte — ["", "", "x"*29] collided with ["\u001d\u001f" +
    // "x"*29]. The fixed 4-byte fold keeps them apart (a length byte
    // stream is never ambiguous with separator/character bytes).
    assert(fingerprint(Seq("", "", "x" * 29)) !=
      fingerprint(Seq("\u001d\u001f" + "x" * 29)))
  }
}
