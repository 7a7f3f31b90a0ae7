package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver for the round-5 MinHash-LSH rework
  * (checkpointed base/banded, linear permutations, parallelism widening).
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
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // 1. LSH pairs == exhaustive exact-jaccard pairs at the threshold
    // (recall must be ~perfect at j >= 0.5 with 32 bands x r=2)
    val lsh = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
      jaccardThreshold = 0.5)(docs)
      .select("id_a", "id_b").orderBy("id_a", "id_b").collect().toSeq
    val sh = docs.select(col("doc_id").cast("long").as("id"),
      graft.llm.DedupOps.shingleHashes(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.id") < col("b.id"))
      .filter(graft.llm.DedupOps.jaccard(col("a.sh"), col("b.sh")) >= 0.5)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .orderBy("id_a", "id_b").collect().toSeq
    println(s"[1] lsh==brute pairs (${lsh.size}/${brute.size}) -> ${lsh == brute}")

    // 2. deterministic across two pipe invocations (fixed-seed perms)
    val again = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
      jaccardThreshold = 0.5)(docs)
      .select("id_a", "id_b").orderBy("id_a", "id_b").collect().toSeq
    println(s"[2] deterministic rerun -> ${lsh == again}")

    // 3. output column contract (id_a, id_b, jaccard), jaccard >= threshold
    val full = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
      jaccardThreshold = 0.5)(docs)
    val cols = full.columns.toSeq
    val minJ = full.agg(min("jaccard")).collect()(0).getDouble(0)
    println(s"[3] schema=$cols minJ=$minJ -> " +
      s"${cols == Seq("id_a", "id_b", "jaccard") && minJ >= 0.5}")

    // 4. plan reads checkpointed base (no parquet re-scan downstream of
    // the verify joins): the final plan should contain Scan ExistingRDD,
    // and NOT re-derive shingles from the parquet text column
    val plan = full.queryExecution.executedPlan.toString
    val scansRdd = plan.contains("ExistingRDD")
    val rescansText = plan.contains("FileScan parquet")
    println(s"[4] checkpointed base in plan (rdd=$scansRdd, parquet=$rescansText) " +
      s"-> ${scansRdd && !rescansText}")

    // 5. registry-built IVF-PQ end-to-end on real embeddings
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val corpus = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
    val qrs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
    val cfg = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val hits = graft.search.AutoSearchEngine("ivf_pq", corpus, cfg)(qrs)
      .select(col("qid"), col("`index.idx`")).collect()
    val selfFound = hits.forall(r => r.getSeq[Long](1).contains(r.getLong(0)))
    println(s"[5] ivf_pq by name, self in top-5 for all queries -> $selfFound")

    // 6. ngram block-cap guard trips lazily on a hot block
    val hot = docs.select(col("doc_id"), col("text"), lit("one").as("blk"))
    val guarded = graft.llm.NgramJaccardPipe("text", "doc_id", "blk",
      maxBlockRows = Some(5L))(hot) // plan-build must not throw
    val tripped =
      try { guarded.count(); false }
      catch { case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(t => Option(t.getMessage).exists(_.contains("maxBlockRows"))) }
    println(s"[6] ngram block cap raises at execution -> $tripped")

    // 6b. ngram pipe (checkpointed base) == direct exact jaccard per block
    val blocked = docs.select(col("doc_id"), col("text"),
      substring(trim(col("text")), 1, 4).as("blk"))
    val ngOut = graft.llm.NgramJaccardPipe("text", "doc_id", "blk",
      threshold = 0.3)(blocked)
      .select("id_a", "id_b").orderBy("id_a", "id_b").collect().toSeq
    val shb = blocked.select(col("blk"), col("doc_id").cast("long").as("id"),
      graft.llm.DedupOps.shingleHashes(col("text"), 3).as("sh"))
    val ngBrute = shb.as("a").join(shb.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .filter(graft.llm.DedupOps.jaccard(col("a.sh"), col("b.sh")) >= 0.3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .orderBy("id_a", "id_b").collect().toSeq
    println(s"[6b] ngram==blocked brute (${ngOut.size}/${ngBrute.size}) -> ${ngOut == ngBrute}")

    // 7. TakeSubset small-n topK + large-n prefilter agree (hashKey mode)
    val part = spark.read.parquet(s"$sf/part.parquet")
    val small = graft.pipes.TakeSubset(n = Some(30), hashKey = Some("p_partkey"))(part)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    spark.conf.set("spark.sql.execution.topKSortFallbackThreshold", "5")
    val large = graft.pipes.TakeSubset(n = Some(30), hashKey = Some("p_partkey"))(part)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    spark.conf.set("spark.sql.execution.topKSortFallbackThreshold", "10000")
    println(s"[7] subset paths select identical sets -> ${small == large}")

    // 8. SearchResult.append stacks batches
    val appended = graft.search.SearchResultOps.append(
      qrs.limit(2), qrs.limit(3))
    println(s"[8] append rows 2+3 -> ${appended.count() == 5}")

    // 9. REAL StreamingQuery dedup over the events parquet == DISTINCT
    val streamed = graft.streaming.EventStream.runDedupStream(
      spark, sf, Seq("user_id", "event_type"), "30 days")
      .orderBy("user_id", "event_type").collect().map(_.toString).toSeq
    val batchDistinct = graft.streaming.EventStream.readBatch(spark, sf)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().map(_.toString).toSeq
    println(s"[9] stream dedup == batch distinct (${streamed.size}) -> " +
      s"${streamed == batchDistinct}")

    // 10. bucketed co-located join: zero Exchange at the package surface
    spark.sql("CREATE DATABASE IF NOT EXISTS vsbuck LOCATION '/tmp/vs-bucketed'")
    val li10 = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_quantity")
    graft.sources.BucketedTables.write(li10, "vsbuck.a", "l_orderkey", 4)
    graft.sources.BucketedTables.write(li10, "vsbuck.b", "l_orderkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bj = graft.sources.BucketedTables.colocatedJoin(
      spark, "vsbuck.a", "vsbuck.b", Seq("l_orderkey"))
    val bplan = bj.queryExecution.executedPlan.toString
    println(s"[10] bucketed join shuffle-free -> ${!bplan.contains("Exchange")}")
    spark.sql("DROP DATABASE IF EXISTS vsbuck CASCADE")

    // 11. salted join == plain join totals on a hot key
    val hot11 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(lit("hot").as("k"), col("l_quantity"))
    import spark.implicits._
    val dim11 = Seq(("hot", 2.0)).toDF("k", "w")
    val a11 = hot11.join(dim11, Seq("k")).agg(sum(col("l_quantity") * col("w"))).collect()(0)
    val b11 = graft.operators.Salting.saltedJoin(hot11, dim11, Seq("k"), 8)
      .agg(sum(col("l_quantity") * col("w"))).collect()(0)
    println(s"[11] salted join totals match -> ${a11 == b11}")

    // 12. fixed-codebook PQ: deterministic, and with nprobe=nlist the
    // IVF-PQ composition returns the identical ranking (round-6 gates)
    val emb12 = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus12 = emb12.select(col("vec_id").as("idx"), col("embedding").as("vector"))
    val qs12 = emb12.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
    val books12 = graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)
    val cfg12 = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    def run12(e: graft.search.SearchEngine) =
      e(qs12).select(col("qid"), col("`index.idx`"))
        .orderBy("qid").collect().map(_.toString).toSeq
    val pqRes = run12(graft.search.PQDenseEngine(corpus12, 8, 16, cfg12,
      fixedCodebooks = Some(books12)))
    val pqRes2 = run12(graft.search.PQDenseEngine(corpus12, 8, 16, cfg12,
      fixedCodebooks = Some(books12)))
    val ivfpqRes = run12(graft.search.IVFPQDenseEngine(corpus12,
      nlist = 4, nprobe = 4, m = 8, codebookSize = 16, config = cfg12,
      fixedCodebooks = Some(books12)))
    println(s"[12] fixed-book PQ deterministic -> ${pqRes == pqRes2}; " +
      s"ivfpq(nprobe=nlist) == pq -> ${ivfpqRes == pqRes}")

    // 13. auto engine by name == directly-constructed BM25 (roundScores opt)
    val qs13 = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
    val cfg13 = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val byName = graft.search.AutoSearchEngine("bm25", docs, cfg13,
      Map("idxCol" -> "doc_id", "textCol" -> "text", "roundScores" -> "4"))(qs13)
      .select(col("qid"), col("`index.idx`")).orderBy("qid")
      .collect().map(_.toString).toSeq
    val direct = graft.search.BM25Engine(docs, cfg13, "doc_id", "text",
      roundScores = Some(4))(qs13)
      .select(col("qid"), col("`index.idx`")).orderBy("qid")
      .collect().map(_.toString).toSeq
    println(s"[13] auto('bm25') == direct BM25 -> ${byName == direct}")

    // 14. M3 dispatch routes by cacheDir: None -> PredictWithoutCache,
    // Some -> PredictWithCache
    val m14a = graft.predict.Predict(
      graft.predict.LinearModel(Seq(Seq.fill(64)(1.0)), Seq(0.0)),
      "embedding", "vector")
    val m14b = graft.predict.Predict(
      graft.predict.LinearModel(Seq(Seq.fill(64)(1.0)), Seq(0.0)),
      "embedding", "vector", idCol = "vec_id", cacheDir = Some("/tmp/vs-m3cache"))
    println(s"[14] dispatch None->direct Some->cached -> " +
      s"${m14a.isInstanceOf[graft.predict.PredictWithoutCache] &&
        m14b.isInstanceOf[graft.predict.PredictWithCache]}")

    // 15. salted agg == plain agg (sum/count/max) on lineitem
    val li15 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"),
        col("l_orderkey").as("ok"), col("l_linenumber").cast("long").as("ln"))
    val plain15 = li15.groupBy("l_returnflag")
      .agg(sum("qty").as("qty"), count("ok").as("ok"), max("ln").as("ln"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val salted15 = graft.operators.Salting.saltedAgg(li15, Seq("l_returnflag"),
      Map("qty" -> "sum", "ok" -> "count", "ln" -> "max"), 16)
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    println(s"[15] salted agg == plain agg -> ${plain15 == salted15}")

    // 16. SRP-LSH embedding near-dup: planted near-copies all recovered,
    // no false positives among the natural corpus at cosine >= 0.9
    val raw16 = spark.read.parquet(s"$sf/embeddings.parquet").select(
      col("vec_id").cast("long").as("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted16 = raw16.unionByName(raw16.filter(col("vec_id") < 10).select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
    val srp = graft.llm.SRPCosineDedupPipe("embedding", "vec_id")(planted16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected16 = (0L until 10L).map(i => (i, i + 10000)).toSet
    println(s"[16] srp planted recall (${srp.size}) -> ${srp == expected16}")
    spark.stop()
  }
}
