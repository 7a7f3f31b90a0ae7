package graft.pipes

import graft.SparkSpec
import graft.llm.CorpusStatsPipe
import org.apache.spark.sql.functions._

/** Quantile semantics of [[CorpusStatsPipe]] (the qa_quantiles gate):
  * exact mode's linear interpolation, and approx mode's tolerance.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact grouped quantiles interpolate linearly") {
    // group a: values 1..5 -> p50 = 3, p90 = 4.6; group b: 10, 20 -> p50 = 15
    val df = ((1 to 5).map(v => ("a", v)) ++ Seq(("b", 10), ("b", 20)))
      .toDF("g", "v")
    val out = CorpusStatsPipe(Seq("g"), "v",
      quantiles = Seq(0.5, 0.9), approx = false)(df)
      .select("g", "p50", "p90", "n").orderBy("g").collect()
    assert(out(0).getDouble(1) == 3.0 && out(0).getDouble(2) == 4.6)
    assert(out(0).getLong(3) == 5L)
    assert(out(1).getDouble(1) == 15.0 && out(1).getDouble(2) == 19.0)
  }

  test("approx mode tracks exact within tolerance on real lengths") {
    val docs = spark.read.parquet(sf("documents"))
      .withColumn("len", size(split(col("text"), " ")))
    def stats(ap: Boolean) = CorpusStatsPipe(Seq("lang"), "len",
      quantiles = Seq(0.5, 0.9), approx = ap)(docs)
      .select("lang", "p50", "p90").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = stats(false)
    val approx = stats(true)
    exact.foreach { case (lang, (e50, e90)) =>
      val (a50, a90) = approx(lang)
      assert(math.abs(e50 - a50) <= math.max(2.0, e50 * 0.05),
        s"$lang p50: exact $e50 vs approx $a50")
      assert(math.abs(e90 - a90) <= math.max(2.0, e90 * 0.05),
        s"$lang p90: exact $e90 vs approx $a90")
    }
  }
}
