package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is deterministic and partitioning-invariant") {
    val docs = spark.read.parquet(sf("documents"))
    def assign(df: org.apache.spark.sql.DataFrame) =
      SplitPipe("doc_id")(df).select("doc_id", "split")
        .as[(Long, String)].collect().toMap
    val a = assign(docs)
    val b = assign(docs.repartition(13))
    assert(a == b)
  }

  test("fractions land near their targets, per subpopulation too") {
    val docs = spark.read.parquet(sf("documents"))
    val out = SplitPipe("doc_id")(docs)
    val byLang = out.groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        val total = rows.map(_._3).sum.toDouble
        l -> rows.map(r => r._2 -> r._3 / total).toMap
      }
    byLang.foreach { case (lang, fr) =>
      assert(math.abs(fr.getOrElse("train", 0.0) - 0.8) < 0.15,
        s"$lang train fraction ${fr.get("train")}")
    }
    // every split is non-empty at the corpus level
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("split is map-only: no exchange in the plan") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = SplitPipe("doc_id")(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("splitting on the cluster id keeps near-dup clusters atomic") {
    val docs = spark.read.parquet(sf("documents"))
    val clusters = DedupOps.connectedComponents(
      MinHashLSHDedupPipe("text", "doc_id", jaccardThreshold = 0.5)(docs))
    val withC = docs
      .join(clusters.select(col("id").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val out = SplitPipe("cluster")(withC)
    val straddlers = out.groupBy("cluster")
      .agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddlers == 0, "a near-dup cluster straddles splits")
  }

  test("bad fractions are rejected") {
    intercept[IllegalArgumentException] {
      SplitPipe("id", Seq(("a", 0.5), ("b", 0.3)))
    }
  }
}
