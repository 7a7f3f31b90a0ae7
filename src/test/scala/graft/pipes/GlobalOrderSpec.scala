package graft.pipes

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The global-order primitives (rank / prefix sum) after the round-6
  * zipWithIndex rewrite: correctness on edge inputs, schema contract,
  * and the write-path determinism whose violation exposed the
  * range-exchange bug (two independent writes must agree).
  */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("rank: empty frame, single row, null-free contiguity") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    assert(NestingOps.withGlobalRank(empty, "id", "r").count() == 0)
    val one = NestingOps.withGlobalRank(
      Seq((7L, "x")).toDF("id", "v"), "id", "r").collect()
    assert(one.length == 1 && one(0).getLong(2) == 0L)
    // schema: all original columns survive, rank appended non-nullable
    val df = Seq((3L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val ranked = NestingOps.withGlobalRank(df, "id", "r")
    assert(ranked.columns.toSeq == Seq("id", "v", "r"))
    assert(!ranked.schema("r").nullable)
    assert(ranked.orderBy("id").select("r").as[Long].collect().toSeq ==
      Seq(0L, 1L, 2L))
  }

  test("prefix sum: null values count as zero, empty frame safe") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(3L)))
      .toDF("id", "n")
    val out = NestingOps.withGlobalPrefixSum(df, "id", "n", "off")
      .orderBy("id").select("off").as[Long].collect()
    assert(out.toSeq == Seq(0L, 5L, 5L)) // exclusive; null adds nothing
    val empty = Seq.empty[(Long, Long)].toDF("id", "n")
    assert(NestingOps.withGlobalPrefixSum(empty, "id", "n", "off").count() == 0)
  }

  test("observe tap: metrics ride the caller's action, no extra job") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (tapped, obs) = ObserveTap.attach(
      docs.filter(col("lang") === "en"), "en_docs",
      sum(col("n_chars")).as("chars"))
    val n = tapped.count() // the ONLY action — metrics piggyback on it
    assert(obs.get("rows") == n)
    assert(obs.get("chars") ==
      docs.filter(col("lang") === "en").agg(sum("n_chars")).head().getLong(0))
  }

  test("write-path determinism: two independent writes agree bit-for-bit") {
    // the regression shape of the range-exchange bug: rank a large-ish
    // frame, WRITE it twice (writes exercised the broken path where
    // counts did not), and require identical files
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("ordv"))
    val dir = java.nio.file.Files.createTempDirectory("gord").toString
    NestingOps.withGlobalRank(li, "ordv", "r")
      .write.mode("overwrite").parquet(s"$dir/a")
    NestingOps.withGlobalRank(li, "ordv", "r")
      .write.mode("overwrite").parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    assert(a.count() == li.count())
    assert(a.select(countDistinct(col("r"))).head().getLong(0) == li.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
