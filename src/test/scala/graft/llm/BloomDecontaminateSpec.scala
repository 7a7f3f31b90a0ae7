package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("flags every truly contaminated doc; none missed (one-sided error)") {
    val eval = docs.filter(col("doc_id") < 30)
    val exact = DecontaminatePipe(eval, "text", "doc_id", ngramSize = 4)(docs)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    val bloom = BloomDecontaminatePipe(eval, "text", "doc_id", ngramSize = 4)(
      docs).filter(col("contaminated")).select("doc_id").as[Long]
      .collect().toSet
    // no false negatives ever; at m=2^20 / ~3k eval grams the fill is so
    // low the flag sets should be identical here
    assert(exact.subsetOf(bloom))
    assert(bloom == exact)
  }

  test("tiny bitmap degrades to false positives, never false negatives") {
    val eval = docs.filter(col("doc_id") < 30)
    val exact = DecontaminatePipe(eval, "text", "doc_id", ngramSize = 4)(docs)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    // 256 bits for thousands of grams -> nearly every position collides
    val tiny = BloomDecontaminatePipe(eval, "text", "doc_id", ngramSize = 4,
      mBits = 256, numHashes = 2)(docs)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(tiny))
    assert(tiny.size > exact.size) // saturated filter must over-flag
  }

  test("probe side is map-only: no join, no exchange, codegen'd probe") {
    val eval = docs.filter(col("doc_id") < 30)
    val out = BloomDecontaminatePipe(eval, "text", "doc_id")(docs)
    val plan = out.queryExecution.executedPlan.toString
    // no join against the eval side, no key shuffle, no broadcast table
    // (Pipe.widen's round-robin repartition is the only allowed exchange)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)
    // and plan strings render the bitmap as a fingerprint, not an array
    assert(plan.contains("bloom_probe") && !plan.contains("[J@"), plan)
    // the full pipe projection is interpreted (the HOF hash lambdas force
    // that, as in every shingle pipe); the probe EXPRESSION itself must
    // still codegen when projected over a plain positions column
    val bits = Array.fill(16)( -1L ) // all set -> every probe true
    val probeOnly = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.graft.BloomProbeExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            array(pmod(col("doc_id"), lit(1024L)))), bits, 1)).as("p"))
    val pPlan = probeOnly.queryExecution.executedPlan.toString
    assert(pPlan.linesIterator.exists(l =>
      l.contains("bloom_probe") && l.trim.startsWith("*(")), pPlan)
    assert(probeOnly.filter(col("p")).count() == docs.count())
  }

  test("native gram kernel is bit-identical to the HOF fold chain") {
    // the r13 compiled kernel (BloomGramHashExpr / BloomGramPositionsExpr)
    // must reproduce the interpreted tokenFold31/131 + gramHashes +
    // positions arithmetic exactly — including unicode text (code-point
    // folds, surrogate pairs whole) and short/null texts
    val planted = docs.withColumn("text",
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" café 日本語 𝄞clef naïve")))
        .when(col("doc_id") % 11 === 3, lit("one two"))
        .when(col("doc_id") % 13 === 4, lit(null.asInstanceOf[String]))
        .otherwise(col("text")))
    val txt = coalesce(col("text"), lit(""))
    val hof = planted
      .withColumn("tk", TextAnalysisOps.toks(txt))
      .withColumn("t1", transform(col("tk"), t => BloomOps.tokenFold31(t)))
      .withColumn("t2", transform(col("tk"), t => BloomOps.tokenFold131(t)))
      .select(col("doc_id"),
        BloomOps.gramHashes(col("t1"), col("t2"), 4).as("hs"),
        flatten(transform(BloomOps.gramHashes(col("t1"), col("t2"), 4),
          h => array(BloomOps.positions(h, 4, 1 << 20): _*))).as("ps"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSeq
    val native = planted
      .select(col("doc_id"),
        BloomOps.gramHashesNative(txt, 4).as("hs"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.graft.BloomGramPositionsExpr(
            org.apache.spark.sql.graft.ColumnBridge.expression(txt),
            4, 1 << 20,
            BloomOps.bloomCoeffs(4).flatMap(p => Seq(p._1, p._2)).toArray))
          .as("ps"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSeq
    assert(native.sortBy(_._1) == hof.sortBy(_._1))
    // and the kernel stays inside whole-stage codegen
    val plan = planted.select(BloomOps.gramHashesNative(txt, 4))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_gram_hashes") && l.trim.startsWith("*(")), plan)
  }

  test("flagOnly=false drops exactly the flagged rows") {
    val eval = docs.filter(col("doc_id") < 30)
    val flagged = BloomDecontaminatePipe(eval, "text", "doc_id")(docs)
    val kept = BloomDecontaminatePipe(eval, "text", "doc_id",
      flagOnly = false)(docs)
    val expect = flagged.filter(!col("contaminated")).count()
    assert(kept.count() == expect)
    assert(kept.columns.toSeq == docs.columns.toSeq) // no flag col added
  }

  test("short and null texts never flag; planted eval text always does") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF(
      "doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains eval 4-gram
      (2L, "one two three"),                       // < 4 tokens: no grams
      (3L, null.asInstanceOf[String]),
      (4L, "totally unrelated words right here")).toDF("doc_id", "text")
    val out = BloomDecontaminatePipe(eval, "text", "doc_id", ngramSize = 4)(
      train).select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(out(1L))
    assert(!out(2L) && !out(3L) && !out(4L))
  }
}
