package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotence: every cleaner in the curation family must be a
  * projection onto its own fixed-point set — running it twice cannot
  * change the result. A second pass that still removes content means
  * the operator's keep-rule and its rewrite disagree (the classic bug:
  * filtering lines by a property the reassembly then breaks).
  */
class CleanerIdempotenceSpec extends SparkSpec {

  private def planted(): DataFrame =
    spark.read.parquet(sf("documents"))
      .withColumn("text", concat(
        when(col("doc_id") % 11 === 0, lit("Lorem ipsum dolor sit.\n"))
          .otherwise(lit("")),
        regexp_replace(col("text"), " (fast|line) ", ".\n"),
        when(col("doc_id") % 7 === 0,
          lit("\nEnable javascript to proceed now please.")).otherwise(lit(""))))

  private def assertFixedPoint(once: DataFrame, twice: DataFrame): Unit = {
    assert(twice.except(once).count() == 0)
    assert(once.except(twice).count() == 0)
  }

  test("C4CleanPipe is idempotent on the text column") {
    val p = C4CleanPipe("text")
    val once = p(planted()).select("doc_id", "text")
    assertFixedPoint(once, p(once).select("doc_id", "text"))
  }

  test("IntraDocLineDedupPipe is idempotent") {
    val p = IntraDocLineDedupPipe("text")
    val once = p(planted()).select("doc_id", "text")
    val twice = p(once)
    assertFixedPoint(once, twice.select("doc_id", "text"))
    assert(twice.filter(col("n_intra_removed") =!= 0L).count() == 0)
  }

  test("SpanDedupPipe is idempotent") {
    val p = SpanDedupPipe("text", "doc_id")
    val once = p(planted()).select("doc_id", "text")
    val twice = p(once)
    assertFixedPoint(once, twice.select("doc_id", "text"))
    assert(twice.filter(col("n_spans_removed") =!= 0L).count() == 0)
  }

  test("UrlCanonicalizePipe is idempotent: canonical(canonical(u)) == canonical(u)") {
    val urls = spark.read.parquet(sf("documents"))
      .withColumn("url", concat(lit("HTTP://H"), col("doc_id") % 7,
        lit(".COM:80/p/"), col("doc_id") % 3,
        lit("?utm_a=1&b=2&a=1#frag")))
    val once = UrlCanonicalizePipe("url")(urls)
      .select(col("doc_id"), col("url_canonical").as("url"))
    val twice = UrlCanonicalizePipe("url")(once)
      .select(col("doc_id"), col("url_canonical").as("url"))
    assertFixedPoint(once, twice)
  }

  test("LineDedupPipe(maxOccurrences=1) is idempotent") {
    val p = LineDedupPipe("text", "doc_id")
    val once = p(planted()).select("doc_id", "text")
    val twice = p(once)
    assertFixedPoint(once, twice.select("doc_id", "text"))
    assert(twice.filter(col("n_lines_removed") =!= 0L).count() == 0)
  }
}
