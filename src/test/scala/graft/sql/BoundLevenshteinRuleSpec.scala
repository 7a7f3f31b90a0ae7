package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class BoundLevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  org.apache.spark.sql.graft.GraftExtensions.register(spark)

  private def pairs(): DataFrame = {
    val docs = spark.read.parquet(sf("documents")).limit(120)
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    val mut = docs.select(col("doc_id"),
      array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
        .as("mtext"))
    docs.join(mut, "doc_id")
      .unionByName(Seq((-1L, null.asInstanceOf[String], "x"))
        .toDF("doc_id", "text", "mtext"))
  }

  private def boundedCount(df: DataFrame): (Int, Int) = {
    var bounded = 0; var unbounded = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case l: Levenshtein =>
        if (l.threshold.isDefined) bounded += 1 else unbounded += 1
      case _ =>
    }))
    (bounded, unbounded)
  }

  test("<=, <, =, and reversed comparisons rewrite to the banded kernel") {
    val p = pairs()
    for (cond <- Seq(
        levenshtein(col("text"), col("mtext")) <= 12,
        levenshtein(col("text"), col("mtext")) < 12,
        levenshtein(col("text"), col("mtext")) === 12,
        lit(12) >= levenshtein(col("text"), col("mtext")),
        lit(12) > levenshtein(col("text"), col("mtext")))) {
      val fast = p.filter(cond)
      val (b, u) = boundedCount(fast)
      assert(b == 1 && u == 0, s"expected rewrite, got bounded=$b unbounded=$u")
    }
  }

  test("rewritten filters select exactly the rows the unbounded form does") {
    val p = pairs().withColumn("__d__",
      levenshtein(col("text"), col("mtext")))
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(p.filter(levenshtein(col("text"), col("mtext")) <= 12))
      == ids(p.filter(col("__d__") <= 12)))
    assert(ids(p.filter(levenshtein(col("text"), col("mtext")) < 12))
      == ids(p.filter(col("__d__") < 12)))
    assert(ids(p.filter(levenshtein(col("text"), col("mtext")) === 11))
      == ids(p.filter(col("__d__") === 11)))
    assert(ids(p.filter(lit(12) >= levenshtein(col("text"), col("mtext"))))
      == ids(p.filter(col("__d__") <= 12)))
    // negative bound: no rewrite, still correct (empty)
    assert(ids(p.filter(levenshtein(col("text"), col("mtext")) <= -1)).isEmpty)
  }

  test("non-rewritable shapes keep the unbounded kernel") {
    val p = pairs()
    // non-literal bound
    val (b1, u1) = boundedCount(
      p.filter(levenshtein(col("text"), col("mtext")) <= size(split(col("mtext"), " "))))
    assert(b1 == 0 && u1 == 1)
    // projection (no comparison at all)
    val (b2, u2) = boundedCount(
      p.select(levenshtein(col("text"), col("mtext")).as("d")))
    assert(b2 == 0 && u2 == 1)
    // already bounded: untouched, not double-wrapped
    val (b3, u3) = boundedCount(
      p.filter(levenshtein(col("text"), col("mtext"), 5) >= 0))
    assert(b3 == 1 && u3 == 0)
  }

  test("bound propagation: a guarded projection reuses the banded kernel") {
    // a direct Project(Filter(scan)) shape — predicate pushdown through
    // a Union splits the filter per branch and the propagation
    // deliberately stays out of that attribute-remapping territory
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"),
        regexp_replace(col("text"), " \\S+ \\S+$", "").as("mtext"))
    docs.createOrReplaceTempView("lev_prop_docs")
    val df = spark.sql("SELECT doc_id, levenshtein(text, mtext) AS d " +
      "FROM lev_prop_docs WHERE levenshtein(text, mtext) <= 12")
    val (b, u) = boundedCount(df)
    assert(b == 2 && u == 0, s"projection must be bounded too: $b/$u")
    // values: the propagated distance equals the unbounded one on
    // every surviving row
    val viaCol = docs
      .withColumn("d", levenshtein(col("text"), col("mtext")))
      .filter(col("d") <= 12).select("doc_id", "d")
    assert(df.except(viaCol).count() == 0)
    assert(viaCol.except(df).count() == 0)
  }

  test("a `= -1` bounded predicate does NOT prove a bound for projections") {
    // bounded(k) = -1 selects rows with distance > k; propagating k into
    // a projected unbounded levenshtein would return -1 on every
    // surviving row instead of the true distance.
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"),
        regexp_replace(col("text"), " \\S+ \\S+$", "").as("mtext"))
    docs.createOrReplaceTempView("lev_neg_docs")
    val df = spark.sql("SELECT doc_id, levenshtein(text, mtext) AS d " +
      "FROM lev_neg_docs WHERE levenshtein(text, mtext, 5) = -1")
    val (_, u) = boundedCount(df)
    assert(u == 1, "projection must stay unbounded under a = -1 guard")
    val viaCol = docs
      .withColumn("d", levenshtein(col("text"), col("mtext")))
      .filter(col("d") > 5).select("doc_id", "d")
    assert(df.except(viaCol).count() == 0)
    assert(viaCol.except(df).count() == 0)
    assert(df.filter(col("d") === -1).count() == 0,
      "no row may report the sentinel -1 as its distance")
  }

  test("SQL front end gets the rewrite too") {
    pairs().createOrReplaceTempView("lev_docs")
    val df = spark.sql(
      "SELECT doc_id FROM lev_docs WHERE levenshtein(text, mtext) <= 12")
    val (b, u) = boundedCount(df)
    assert(b == 1 && u == 0)
    assert(df.count() > 0)
  }
}
