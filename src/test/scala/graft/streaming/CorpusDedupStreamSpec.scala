package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CorpusDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def arrivals = {
    val toks = split(col("text"), " ")
    corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
          .as("text"))
  }

  test("static run equals the cross-corpus batch pipe") {
    val out = StreamingCorpusDedup(arrivals, "text", "doc_id",
      corpus, "text", "doc_id", jaccardThreshold = 0.5)
      .dropDuplicates("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = graft.llm.CrossCorpusMinHashPipe("text", "doc_id",
      corpus, "text", "doc_id", jaccardThreshold = 0.5)(arrivals)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == expected && out.nonEmpty)
  }

  test("streamed micro-batches find the same pairs with zero state") {
    val rows = arrivals.collect().map(r => (r.getLong(0), r.getString(1)))
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = StreamingCorpusDedup(
      mem.toDF.toDF("doc_id", "text"), "text", "doc_id",
      corpus, "text", "doc_id", jaccardThreshold = 0.5)
    val q = streamed.writeStream.format("memory")
      .queryName("corpus_dedup_sink").outputMode("append").start()
    // two micro-batches: findings accumulate, no watermark/state involved
    val (half1, half2) = rows.splitAt(rows.length / 2)
    mem.addData(half1.toIndexedSeq); q.processAllAvailable()
    mem.addData(half2.toIndexedSeq); q.processAllAvailable()
    // the stateless plan must contain NO stateful operator
    val progress = q.lastProgress
    q.stop()
    assert(progress.stateOperators.isEmpty,
      s"expected zero state operators, got ${progress.stateOperators.length}")
    val got = spark.table("corpus_dedup_sink")
      .dropDuplicates("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = StreamingCorpusDedup(arrivals, "text", "doc_id",
      corpus, "text", "doc_id", jaccardThreshold = 0.5)
      .dropDuplicates("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected && got.nonEmpty)
  }
}
