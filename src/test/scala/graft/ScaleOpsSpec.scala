package graft

import graft.operators.Salting
import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

/** Scale-layer utilities: bucketed co-located joins plan shuffle-free,
  * salting preserves join/agg results while spreading hot keys.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables: co-located join plans with zero Exchange") {
    // keep managed-table files in /tmp, not the repo working dir
    spark.sql("CREATE DATABASE IF NOT EXISTS graftbuck LOCATION '/tmp/graft-bucketed'")
    spark.sql("DROP TABLE IF EXISTS graftbuck.bli")
    spark.sql("DROP TABLE IF EXISTS graftbuck.bord")
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(sf("orders"))
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    BucketedTables.write(li, "graftbuck.bli", "l_orderkey", 4)
    BucketedTables.write(ord, "graftbuck.bord", "l_orderkey", 4)
    // the sf0.001 fixtures are broadcast-small, which would hide the
    // bucketed SMJ this test asserts; at real scale neither side fits
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val bcOld = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      val joined = BucketedTables.colocatedJoin(
        spark, "graftbuck.bli", "graftbuck.bord", Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join shuffled:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(800)}")
      // same rows as the plain join
      val expected = li.join(ord, Seq("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set(bcKey, bcOld)
      spark.sql("DROP DATABASE IF EXISTS graftbuck CASCADE")
    }
  }

  test("salted join equals plain join on a skewed key") {
    // skew: every lineitem row shares ONE hot key value
    val skewed = spark.read.parquet(sf("lineitem"))
      .select(lit("hot").as("k"), col("l_quantity"))
    val dim = Seq(("hot", 10.0), ("cold", 0.0)).toDF("k", "w")
    val plain = skewed.join(dim, Seq("k"))
      .agg(round(sum(col("l_quantity") * col("w")), 4)).collect()(0)
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .agg(round(sum(col("l_quantity") * col("w")), 4)).collect()(0)
    assert(salted == plain)
  }

  test("salted two-phase agg equals direct agg") {
    val li = spark.read.parquet(sf("lineitem"))
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"),
        min("l_orderkey").as("mn"), max("l_orderkey").as("mx"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val salted = Salting.saltedAgg(
      li.select(col("l_returnflag"), col("l_quantity").as("sq"),
        lit(1L).as("n"), col("l_orderkey").as("mn"),
        col("l_orderkey").as("mx")),
      Seq("l_returnflag"),
      Map("sq" -> "sum", "n" -> "count", "mn" -> "min", "mx" -> "max"),
      saltFactor = 8)
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(salted == direct)
  }
}
