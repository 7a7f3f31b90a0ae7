package graft

import graft.core._
import graft.pipes._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver for the round-2 scale-killer fixes.
  * Run: sbt "runMain graft.VerifyScratch". Not part of the driver contract.
  */
object VerifyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    // 1. ParallelPipe FAST path: two update branches
    val p = ParallelPipe.of(
      ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
      ApplyToCols(_ * 10, "x10", Seq("l_partkey")))
    val out1 = p(li.select("l_orderkey", "l_quantity", "l_partkey"))
    val r1 = out1.agg(sum("l_quantity"), sum("l_partkey")).collect()(0)
    val r0 = li.agg(sum(col("l_quantity") * 2), sum(col("l_partkey") * 10)).collect()(0)
    println(s"[1] parallel fast: ${r1} vs ${r0} -> ${r1 == r0}")
    println("[1] explain:")
    out1.explain("formatted")

    // 2. NestPipe via withGlobalRank: nest into groups of 5
    val ordered = li.withColumn("__ord__",
      col("l_orderkey") * 100 + col("l_linenumber"))
    val nested = NestPipe(5, Seq("__ord__", "l_quantity"), "__ord__")(
      ordered.select("__ord__", "l_quantity"))
    val nRows = nested.count()
    val nElems = nested.agg(sum(size(col("__ord__")))).collect()(0).getLong(0)
    println(s"[2] nest: groups=$nRows elems=$nElems expected elems=${li.count()}")
    // ranks must reproduce the global sort: first group = 5 smallest __ord__
    val firstGroup = nested.orderBy(col("__ord__")(0)).limit(1)
      .select(col("__ord__")).collect()(0).getSeq[Long](0)
    val smallest5 = ordered.orderBy("__ord__").limit(5)
      .select("__ord__").collect().map(_.getLong(0)).toSeq
    println(s"[2] first group=$firstGroup smallest5=$smallest5 match=${firstGroup == smallest5}")
    nested.explain("formatted")

    // 3. flatten(nest) round trip preserves multiset
    val flat = FlattenPipe()(nested)
    val backSum = flat.agg(sum("l_quantity")).collect()(0).getDouble(0)
    val origSum = li.agg(sum("l_quantity")).collect()(0).getDouble(0)
    println(s"[3] roundtrip sum: $backSum vs $origSum -> ${math.abs(backSum - origSum) < 1e-6}")

    // 4. ragged lockstep arrays must raise
    import spark.implicits._
    val ragged = Seq((Seq(1, 2, 3), Seq("a", "b"))).toDF("xs", "ys")
    val raggedErr =
      try { NestingOps.flattenOnce(ragged, Seq("xs", "ys")).collect(); "NO ERROR" }
      catch { case e: Throwable => s"raised: ${e.getMessage.take(120)}" }
    println(s"[4] ragged: $raggedErr")

    // 5. ParallelByField overlay on dotted columns
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dotted = AddPrefix("doc.")(docs)
    val pbf = ParallelByField(Map(
      "doc" -> ApplyToCols(upper(_), "upper", Seq("doc.lang"))))(dotted)
    val langs = pbf.select(col("`doc.lang`")).distinct().collect().map(_.getString(0)).sorted
    println(s"[5] parallelByField langs=${langs.mkString(",")} cols=${pbf.columns.length}")

    // 6. general path: non-update branch preserving row idx
    val lam = LambdaPipe(df => df.withColumn("flag", col("l_quantity") > 25), "flag")
    val gen = ParallelPipe.of(lam, ApplyToCols(_ * 2, "x2", Seq("l_quantity")))
    val out6 = gen(NestingOps.withRowIdx(li.select("l_orderkey", "l_quantity")))
    println(s"[6] general path cols=${out6.columns.mkString(",")} rows=${out6.count()}")

    // 7. debug pipes + dataset fingerprint + per-example wrapper
    val pb = PrintBatch("li")(li.select("l_orderkey", "l_quantity", "l_returnflag"))
    println(s"[7] printbatch passthrough rows=${pb.count()}")
    PrintContent(2, "li")(li.select("l_orderkey"))
    val fp1 = DatasetFingerprint.of(li.select("l_orderkey"))
    val fp2 = DatasetFingerprint.of(li.select("l_orderkey"))
    val fp3 = DatasetFingerprint.of(li.select("l_partkey"))
    println(s"[7] fingerprint stable=${fp1 == fp2} differs=${fp1 != fp3}")
    val ate = ApplyToEachExample(ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
      checked = true)(li.select("l_orderkey", "l_quantity"))
    println(s"[7] applyToEachExample rows=${ate.count()}")

    // 8b. engine state persistence: fresh BM25 instance reloads from parquet
    val stateDir = "/tmp/graft-engine-state"
    val docsSm = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val qs = docsSm.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
    def bm25() = graft.search.BM25Engine(docsSm,
      graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
        queryIdCol = Some("qid")),
      corpusIdxCol = "doc_id", corpusTextCol = "text",
      stateDir = Some(stateDir), corpusFingerprint = "scratch-docs")
    val w1 = bm25()(qs).select("qid", "`index.idx`").collect().map(_.toString).sorted
    val stateFiles = new java.io.File(stateDir).listFiles().map(_.getName).sorted
    val w2 = bm25()(qs).select("qid", "`index.idx`").collect().map(_.toString).sorted
    println(s"[8b] engine state frames=${stateFiles.length} " +
      s"reload identical=${w1.toSeq == w2.toSeq}")

    // 8. flagship entry smoke (driver checks rows > 0)
    val entryOut = SparkEntry.entry(spark)
    println(s"[8] entry rows=${entryOut.count()} cols=${entryOut.columns.mkString(",")}")
    entryOut.show(3, truncate = false)

    spark.stop()
  }
}
