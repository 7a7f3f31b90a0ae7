package graft

import graft.core._
import graft.pipes._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver for the round-3 changes (scalarized gate,
  * ParallelPipe copy semantics, poly61 simhash, microsecond sessionize,
  * size-gated broadcasts, hashKey subset).
  * Run: sbt "runMain graft.VerifyScratch". Not part of the driver contract.
  */
object VerifyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    // 1. ParallelPipe fast path, disjoint branches: values + zero shuffles
    val p = ParallelPipe.of(
      ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
      ApplyToCols(_ * 10, "x10", Seq("l_partkey")))
    val out1 = p(li.select("l_orderkey", "l_quantity", "l_partkey"))
    val r1 = out1.agg(sum("l_quantity"), sum("l_partkey")).collect()(0)
    val r0 = li.agg(sum(col("l_quantity") * 2), sum(col("l_partkey") * 10)).collect()(0)
    println(s"[1] parallel fast disjoint -> ${r1 == r0}")
    out1.explain("formatted")

    // 2. copy semantics: branch 2 overlays the SAME key -> later wins,
    // computed from ORIGINAL (x+1, not x*2+1)
    val df2 = Seq((1L, 2.0), (2L, 4.0)).toDF("k", "x")
    val o2 = ParallelPipe.of(
      ApplyToCols(_ * 2, "d", Seq("x")), ApplyToCols(_ + 1, "p", Seq("x")))(df2)
    val got2 = o2.orderBy("k").select("x").collect().map(_.getDouble(0)).toSeq
    println(s"[2] later-wins-from-original x=${got2} -> ${got2 == Seq(3.0, 5.0)}")

    // 3. branch 2 derives a NEW column from a key branch 1 doubled ->
    // must read the original value
    val o3 = ParallelPipe.of(
      ApplyToCols(_ * 2, "d", Seq("x")),
      LambdaPipe(df => df.withColumn("y", col("x") * 10), "y10", isUpdate = true))(df2)
    val got3 = o3.orderBy("k").select("x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    println(s"[3] new-col-from-original=${got3} -> ${got3 == Seq((4.0, 20.0), (8.0, 40.0))}")

    // 4. poly61 simhash: exact duplicate must surface at hamming 0
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val withDup = docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") === 0).select((col("doc_id") + 999999).as("doc_id"), col("text")))
    val sh = graft.llm.SimHashDedupPipe("text", "doc_id", maxHamming = 3,
      tokenHash = "poly61")(withDup)
    val dupRow = sh.filter(col("id_a") === 0 && col("id_b") === 999999).collect()
    println(s"[4] poly61 exact dup hamming=${dupRow.map(_.getInt(2)).toSeq} -> ${dupRow.length == 1 && dupRow(0).getInt(2) == 0}")

    // 5. sessionize decides on exact MICROseconds around the 1800 s gap
    val ev = Seq(
      (1L, 0L), (1L, 1800000001L),            // gap 1800.000001 s -> split
      (2L, 0L), (2L, 1799999999L)             // gap 1799.999999 s -> same
    ).toDF("user_id", "us").withColumn("ts", timestamp_micros(col("us")))
    val sess = graft.streaming.SessionizePipe(gapSeconds = 1800)(ev)
      .groupBy("user_id").agg(countDistinct("session_idx").as("ns"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    println(s"[5] micro-gap sessions=${sess} -> ${sess == Seq((1L, 2L), (2L, 1L))}")

    // 6. hashKey subset: deterministic and engine-independent
    val part = spark.read.parquet(s"$sf/part.parquet")
    val t1 = TakeSubset(n = Some(50), hashKey = Some("p_partkey"))(part)
      .select("p_partkey").collect().map(_.getLong(0)).sorted.toSeq
    val t2 = TakeSubset(n = Some(50), hashKey = Some("p_partkey"))(part)
      .select("p_partkey").collect().map(_.getLong(0)).sorted.toSeq
    println(s"[6] hashKey subset size=${t1.size} stable=${t1 == t2}")

    // 7. GroupLookup without forced broadcast still executes (AQE decides)
    val liIdx = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("idx"), col("l_orderkey"))
    val qs7 = spark.read.parquet(s"$sf/orders.parquet").filter(col("o_orderkey") < 100)
      .select(col("o_orderkey").as("qid"), col("o_orderkey").as("query.l_orderkey"))
    val gl = graft.search.GroupLookupEngine(liIdx, "l_orderkey",
      graft.search.SearchConfig(k = 4, fillMaskedIndices = false, queryIdCol = Some("qid")))
    val glOut = gl(qs7)
    println(s"[7] group lookup rows=${glOut.count()} (no explicit broadcast hint)")
    glOut.explain("formatted")

    // 8. brute-force dense: corpus under cap -> broadcast side present
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs8 = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
    val bf = graft.search.BruteForceDenseEngine(
      emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
      graft.search.SearchConfig(k = 5, fillMaskedIndices = false, queryIdCol = Some("qid")))
    val bfOut = bf(qs8)
    println(s"[8] brute-force rows=${bfOut.count()}")
    bfOut.explain("formatted")

    // 9. flagship entry smoke (driver checks rows > 0)
    val entryOut = SparkEntry.entry(spark)
    println(s"[9] entry rows=${entryOut.count()} cols=${entryOut.columns.mkString(",")}")

    spark.stop()
  }
}
