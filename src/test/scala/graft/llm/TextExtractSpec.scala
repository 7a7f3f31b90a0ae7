package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  test("html extract: script/style payloads vanish, entities decode in order") {
    val df = Seq(
      (1L, "<html><body><p>Hello <b>world</b></p></body></html>"),
      (2L, "<style>p{x:1}</style>before<script>var s='<p>no</p>';</script>after"),
      (3L, "<!-- gone -->a&amp;b &lt;tag&gt; &quot;q&#39;s&quot;&nbsp;end"),
      // &amp;lt; is the literal text "&lt;", NOT "<" (single decode pass,
      // ampersand last)
      (4L, "x &amp;lt; y"),
      (5L, "words<br>glued<div>apart</div>"),
      (6L, null)).toDF("doc_id", "html")
    val out = HtmlExtractPipe("html")(df)
      .select("doc_id", "text_extracted").orderBy("doc_id").collect()
    assert(out(0) == Row(1L, "Hello world"))
    assert(out(1) == Row(2L, "before after"))
    assert(out(2) == Row(3L, "a&b <tag> \"q's\" end"))
    assert(out(3) == Row(4L, "x &lt; y"))
    assert(out(4) == Row(5L, "words glued apart"))
    assert(out(5) == Row(6L, ""))
  }

  test("html extract is map-only: no exchange in the plan") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val plan = HtmlExtractPipe("html")(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("weighted sample: deterministic, weight-proportional, zero-weight excluded") {
    val docs = spark.read.parquet(sf("documents"))
    val out = WeightedSamplePipe("doc_id", "n_chars", 100)(docs)
    assert(out.count() == 100)
    // same rows on any layout (the u-hash ignores partitioning)
    val out2 = WeightedSamplePipe("doc_id", "n_chars", 100)(docs.repartition(17))
    assert(out.select("doc_id").except(out2.select("doc_id")).count() == 0)
    // inclusion odds ~ weight: the sampled mean weight must exceed the
    // population mean by a clear margin (coarse but layout-independent)
    val popMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampMean = out.agg(avg("n_chars")).head().getDouble(0)
    assert(sampMean > popMean * 1.05, s"sample $sampMean vs pop $popMean")
    // zero/negative weights can never be drawn
    val withZero = docs.withColumn("w",
      when(col("doc_id") < 100, lit(0L)).otherwise(col("n_chars")))
    val z = WeightedSamplePipe("doc_id", "w", 50)(withZero)
    assert(z.filter(col("doc_id") < 100).count() == 0)
  }

  test("weighted sample: weight-proportional inclusion on a 1M-id corpus") {
    // two weight classes over 1M contiguous ids: w=10 rows must be drawn
    // ~10x as often as w=1 rows (Efraimidis-Spirakis inclusion odds for
    // k << n), and the draw must not be order-correlated on the
    // contiguous id range (the quadratic mixer's job)
    val n = 1000000L
    val base = spark.range(n).toDF("doc_id")
      .withColumn("w", when(col("doc_id") % 2 === 0, lit(10L)).otherwise(lit(1L)))
    val k = 10000
    val out = WeightedSamplePipe("doc_id", "w", k)(base).cache()
    assert(out.count() == k)
    val heavy = out.filter(col("w") === 10).count().toDouble
    val light = (k - heavy).max(1.0)
    val ratio = heavy / light
    assert(ratio > 6.0 && ratio < 16.0, s"heavy/light inclusion ratio $ratio")
    // no contiguous-prefix artifact: the sampled even ids spread across
    // the id range instead of clustering at one end
    val meanId = out.filter(col("w") === 10).agg(avg("doc_id")).head().getDouble(0)
    assert(meanId > n * 0.35 && meanId < n * 0.65, s"sampled-id mean $meanId")
    out.unpersist()
  }

  test("weighted sample: global mode plans as TakeOrdered, grouped mode caps per group") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = WeightedSamplePipe("doc_id", "n_chars", 10)(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val grouped = WeightedSamplePipe("doc_id", "n_chars", 5, Seq("lang"))(docs)
    val counts = grouped.groupBy("lang").count().collect()
    assert(counts.forall(_.getLong(1) <= 5), counts.toSeq)
    assert(counts.length >= 2)
  }
}
