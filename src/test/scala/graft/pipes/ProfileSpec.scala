package graft.pipes

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("c")),
    (None, Some("a")))
    .toDF("k", "s")

  test("per-column rows / nulls / exact distinct / min / max") {
    val out = ProfilePipe(Seq("k", "s"))(df).orderBy("col_name").collect().toSeq
    assert(out == Seq(
      Row("k", 4L, 1L, 2L, "1", "2"),
      Row("s", 4L, 1L, 2L, "a", "c")))
  }

  test("all statistics ride one aggregate: a single scan of the input") {
    val plan = ProfilePipe(Seq("k", "s"))(df).queryExecution.executedPlan.toString
    // multi-distinct plans via Expand, not one scan per column
    assert(plan.contains("Expand"))
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2,
      s"expected a single source scan, got:\n$plan")
  }

  test("approx mode drops the Expand and estimates within HLL tolerance") {
    val li = spark.read.parquet(sf("lineitem"))
    val approx = ProfilePipe(Seq("l_orderkey"), exact = false)(li)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val est = approx.head().getLong(3).toDouble
    val true_ = li.select(count_distinct(col("l_orderkey"))).head().getLong(0).toDouble
    assert(math.abs(est - true_) / true_ < 0.10, s"est $est vs $true_")
  }

  test("profiling real data matches direct aggregates") {
    val li = spark.read.parquet(sf("lineitem"))
    val out = ProfilePipe(Seq("l_returnflag"))(li).head()
    val direct = li.selectExpr("count(*)", "count(distinct l_returnflag)",
      "cast(min(l_returnflag) as string)").head()
    assert(out.getLong(1) == direct.getLong(0))
    assert(out.getLong(3) == direct.getLong(1))
    assert(out.getString(4) == direct.getString(2))
  }
}
