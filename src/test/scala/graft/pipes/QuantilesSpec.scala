package graft.pipes

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact grouped quantiles interpolate linearly") {
    // group a: values 1..5 -> p50 = 3, p90 = 4.6; group b: 10, 20 -> p50 = 15
    val df = ((1 to 5).map(v => ("a", v)) ++ Seq(("b", 10), ("b", 20)))
      .toDF("g", "v")
    val out = GroupQuantilesPipe("g", "v", Seq(0.5, 0.9), exact = true)(df)
      .orderBy("g").collect()
    assert(out(0).getSeq[Double](1) == Seq(3.0, 4.6))
    assert(out(0).getLong(2) == 5L)
    assert(out(1).getSeq[Double](1) == Seq(15.0, 19.0))
  }

  test("approx mode tracks exact within tolerance on real lengths") {
    val docs = spark.read.parquet(sf("documents"))
      .withColumn("len", size(split(col("text"), " ")))
    val exact = GroupQuantilesPipe("lang", "len", Seq(0.5, 0.9), exact = true)(docs)
      .withColumnRenamed("quantiles", "qe")
    val approx = GroupQuantilesPipe("lang", "len", Seq(0.5, 0.9))(docs)
      .withColumnRenamed("quantiles", "qa").drop("n")
    val joined = exact.join(approx, "lang").collect()
    joined.foreach { r =>
      val e = r.getSeq[Double](1); val a = r.getSeq[Double](3)
      e.zip(a).foreach { case (ev, av) =>
        assert(math.abs(ev - av) <= math.max(2.0, ev * 0.05),
          s"lang ${r.getString(0)}: exact $ev vs approx $av")
      }
    }
  }

  test("probs outside [0,1] are rejected") {
    intercept[IllegalArgumentException] {
      GroupQuantilesPipe("g", "v", Seq(1.5))
    }
  }
}
