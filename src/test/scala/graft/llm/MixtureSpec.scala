package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  /** The pipe's per-(id, epoch) draw, replayed in plain Scala. */
  private def slot(id: Long, epoch: Int, seed: Long = 23L): Long = {
    val s1 = (id * 131 + seed + epoch * 7919L) % P
    ((BigInt(s1) * s1 + s1) % P).toLong
  }

  private def frame = Seq(
    (0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"),
    (10L, "b"), (11L, "b"),
    (20L, "c")).toDF("id", "dom")

  test("full epochs, partial epoch, and weight-0 drop — hand-computed") {
    // W = 4; needed_a = 10*3/4 = 7, capped = min(7, 4*2) = 7 -> fe=1 rem=3
    // needed_b = 10*1/4 = 2, capped = 2 -> fe=1 rem=0; c unlisted -> drop
    val out = DomainMixturePipe("id", "dom",
      Seq("a" -> 3L, "b" -> 1L), budget = 10L, maxRepeat = 2)(frame)
      .select("id", "dom", "epoch").as[(Long, String, Int)].collect().toSet
    val thrA = (BigInt(3) * P / 4).toLong
    val expected =
      Seq(0L, 1L, 2L, 3L).map(id => (id, "a", 1)).toSet ++
      Seq(0L, 1L, 2L, 3L).filter(id => slot(id, 2) < thrA)
        .map(id => (id, "a", 2)).toSet ++
      Set((10L, "b", 1), (11L, "b", 1))
    assert(out == expected)
    assert(!out.exists(_._2 == "c"), "weight-0 domain must drop")
  }

  test("repetition cap binds: huge budget emits exactly maxRepeat epochs") {
    val out = DomainMixturePipe("id", "dom", Seq("a" -> 1L),
      budget = 1000L, maxRepeat = 2)(frame.filter($"dom" === "a"))
    val perId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(perId == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(out.select("epoch").distinct().as[Int].collect().toSet == Set(1, 2))
  }

  test("capped = 0 domain emits nothing; budget 0 emits nothing") {
    // needed_a = 1*1/1000 = 0 -> capped 0 -> no rows (not a crash)
    val tiny = DomainMixturePipe("id", "dom", Seq("a" -> 1L, "b" -> 999L),
      budget = 1L)(frame)
    assert(tiny.filter($"dom" === "a").count() == 0)
    assert(DomainMixturePipe("id", "dom", Seq("a" -> 1L),
      budget = 0L)(frame).count() == 0)
  }

  test("deterministic and partitioning-invariant") {
    val pipe = DomainMixturePipe("id", "dom",
      Seq("a" -> 3L, "b" -> 1L), budget = 10L, maxRepeat = 2)
    def run(df: org.apache.spark.sql.DataFrame) =
      pipe(df).select("id", "epoch").as[(Long, Int)].collect().toSet
    assert(run(frame) == run(frame.repartition(7)))
  }

  test("absent-weight domain leaves quota unfilled, others unaffected") {
    // "ghost" owes 5 of the 10-row budget but has no rows; a's share is
    // NOT renormalized: needed_a = 10*1/2 = 5 -> fe=1 rem=1
    val out = DomainMixturePipe("id", "dom",
      Seq("a" -> 1L, "ghost" -> 1L), budget = 10L, maxRepeat = 2)(
      frame.filter($"dom" === "a"))
    val full = out.filter($"epoch" === 1).count()
    assert(full == 4, "full epoch must keep every row")
    val thrA = (BigInt(1) * P / 4).toLong
    val exp2 = Seq(0L, 1L, 2L, 3L).count(id => slot(id, 2) < thrA)
    assert(out.filter($"epoch" === 2).count() == exp2)
  }

  test("null domain drops; null id survives full epochs only") {
    val withNulls = Seq(
      (Some(0L), Some("a")), (Some(1L), None), (None, Some("a"))
    ).toDF("id", "dom")
    // budget 16, weight a only: n_a = 2 (null-dom row dropped by the
    // inner join), capped = min(16, 2*3) = 6 -> fe = 3, rem = 0
    val out = DomainMixturePipe("id", "dom", Seq("a" -> 1L),
      budget = 16L)(withNulls)
    assert(out.filter($"dom".isNull).count() == 0)
    // the null-id row has no hash but full epochs don't consult it
    assert(out.filter($"id".isNull).count() == 3)
    assert(out.count() == 6)
  }

  test("big side never shuffles: broadcast join + bounded explode") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = DomainMixturePipe("doc_id", "source",
      Seq("src0" -> 2L, "src1" -> 1L), budget = 100L)(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }

  test("config validation") {
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Nil, 10L)
    }
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 0L), 10L)
    }
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L, "a" -> 2L), 10L)
    }
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L, maxRepeat = 0)
    }
    intercept[IllegalArgumentException] { // row-amplification refusal
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L, maxRepeat = 1001)
    }
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), -1L)
    }
    // string ids would cast to NULL slots in the partial-epoch draw
    val strIds = Seq(("u1", "a")).toDF("id", "dom")
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L)(strIds)
    }
    // a pre-existing epoch column would be silently overwritten by the
    // explode — refused, INCLUDING a case-variant ("Epoch"): Spark's
    // default resolution is case-insensitive, so withColumn("epoch")
    // replaces it just the same
    val withEpoch = Seq((1L, "a", 9)).toDF("id", "dom", "epoch")
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L)(withEpoch)
    }
    val withEpochCase = Seq((1L, "a", 9)).toDF("id", "dom", "Epoch")
    intercept[IllegalArgumentException] {
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L)(withEpochCase)
    }
  }

  test("sizeCol: token-budget accounting, hand-computed epochs") {
    val df = Seq(
      (0L, "a", Some(5L)), (1L, "a", Some(5L)),
      (10L, "b", Some(2L)),
      (20L, "c", Some(0L)),
      (30L, "d", None: Option[Long])).toDF("id", "dom", "sz")
    // W = 5; S_a = 10: needed = 40*2/5 = 16, cap min(16, 30) = 16 ->
    // fe = 1, rem = 6, thr = 6P/10; S_b = 2: needed = 40*1/5 = 8, cap
    // min(8, 6) = 6 -> fe = 3, rem = 0 (the size-axis cap binds); c and
    // d have zero/null totals -> dropped before any division
    val out = DomainMixturePipe("id", "dom",
      Seq("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L), budget = 40L,
      maxRepeat = 3, sizeCol = Some("sz"))(df)
      .select("id", "epoch").as[(Long, Int)].collect().toSet
    val thrA = (BigInt(6) * P / 10).toLong
    val expected =
      Set(0L, 1L).map(id => (id, 1)) ++
      Set(0L, 1L).filter(id => slot(id, 2) < thrA).map(id => (id, 2)) ++
      Set((10L, 1), (10L, 2), (10L, 3))
    assert(out == expected)
  }

  test("sizeCol: a null-size row still replicates with its domain") {
    // S_a = 10 from the sized rows; the null-size row contributes 0 to
    // the quota but rides the domain's full epochs like any other row
    val df = Seq((0L, "a", Some(5L)), (1L, "a", Some(5L)),
      (2L, "a", None: Option[Long])).toDF("id", "dom", "sz")
    // needed = 30*1/1 = 30, cap min(30, 30) = 30 -> fe = 3, rem = 0
    val out = DomainMixturePipe("id", "dom", Seq("a" -> 1L), budget = 30L,
      maxRepeat = 3, sizeCol = Some("sz"))(df)
    assert(out.filter($"id" === 2L).count() == 3)
    assert(out.count() == 9)
  }

  test("sizeCol forks the fingerprint") {
    val base = DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L)
    assert(base.fingerprint != DomainMixturePipe("id", "dom",
      Seq("a" -> 1L), 10L, sizeCol = Some("sz")).fingerprint)
  }

  test("stream ≡ batch: the expansion is stateless on a real stream") {
    val out = graft.streaming.EventStream.runDomainMixtureStream(
      spark, "/root/testdata/sf0.001")
    val streamed = out.select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect().toSeq
    assert(streamed.size == streamed.toSet.size,
      "append mode must emit every (row, epoch) exactly once")
    val docs = spark.read.parquet(sf("documents"))
    val batch = DomainMixturePipe("doc_id", "source",
      DomainMixturePipe.fixtureGateWeights,
      budget = docs.count(), maxRepeat = 3)(docs)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect().toSet
    assert(streamed.toSet == batch)
  }

  test("stream restart: checkpointed mixture resumes exactly-once across a kill") {
    // the production ingest path's real failure mode: the mixing query
    // dies between micro-batches and restarts from its checkpoint — rows
    // already emitted must NOT re-emit (their epochs would double), rows
    // not yet seen must still emit, and the final corpus must equal the
    // batch pipe exactly. File sink: its _spark_metadata commit log is
    // the exactly-once half the memory sink doesn't have.
    implicit val sctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b"))
    val corpusDf = corpus.toDF("doc_id", "source")
    // the standing quota plan: built ONCE from the full static corpus
    // (the documented premise), shared by both query incarnations
    val plan = DomainMixturePipe.quotaPlanFromCounts(
      DomainMixturePipe.domainCounts(corpusDf, "source"),
      Seq("a" -> 3L, "b" -> 1L), budget = 60L, maxRepeat = 3)
      .localCheckpoint()
    val docs = mem.toDF().toDF("doc_id", "source")
    val expanded = DomainMixturePipe.expand(
      docs, plan, "doc_id", "source", seed = 23L, epochCol = "epoch")
    val root = java.nio.file.Files.createTempDirectory("mx-restart")
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    def start() = expanded.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // incarnation 1: first half of the corpus, then KILL
    val q1 = start()
    try { mem.addData(corpus.take(20): _*); q1.processAllAvailable() }
    finally q1.stop()
    // incarnation 2: restart from the checkpoint, second half arrives
    val q2 = start()
    try { mem.addData(corpus.drop(20): _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect().toSeq
    assert(streamed.size == streamed.toSet.size,
      "restart must not re-emit any (row, epoch) copy")
    val batch = DomainMixturePipe.expand(
      corpusDf, plan, "doc_id", "source", seed = 23L, epochCol = "epoch")
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect().toSet
    assert(streamed.toSet == batch,
      "the resumed stream's corpus must equal the batch expansion exactly")
  }

  test("refreshable plan: an overwritten quota plan takes effect at the next batch") {
    // the long-running-ingest drift story: per-domain statistics are
    // recomputed by a planner job and OVERWRITE the plan parquet — the
    // foreachBatch form re-reads it each micro-batch, so batch 2 expands
    // under the refreshed plan without a query restart
    implicit val sctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val corpus = Seq.tabulate(20)(i => (i.toLong, "a"))
    val corpusDf = corpus.toDF("doc_id", "source")
    val root = java.nio.file.Files.createTempDirectory("mx-refresh")
    val planPath = s"$root/plan"
    val outDir = s"$root/out"
    def writePlan(budget: Long): Unit =
      DomainMixturePipe.quotaPlanFromCounts(
        DomainMixturePipe.domainCounts(corpusDf, "source"),
        Seq("a" -> 1L), budget = budget, maxRepeat = 3)
        .write.mode("overwrite").parquet(planPath)
    // plan A: budget 20 over n=20 -> fe=1, rem=0 (one epoch per row)
    writePlan(20L)
    val q = graft.streaming.StreamingMixture.runRefreshable(
      mem.toDF().toDF("doc_id", "source"), planPath, "doc_id", "source",
      outDir, s"$root/ckpt")
    try {
      mem.addData(corpus.take(10): _*)
      q.processAllAvailable()
      // the refresh: budget 60 -> fe=3 (three epochs per row)
      writePlan(60L)
      mem.addData(corpus.drop(10): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = graft.streaming.StreamingMixture.emitted(spark, outDir)
      .select("doc_id", "epoch").as[(Long, Int)].collect().toSeq
    assert(out.size == out.toSet.size, "per-batch overwrite keeps exactly-once")
    val got = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    corpus.take(10).foreach { case (id, _) =>
      assert(got(id) == Seq(1), s"batch-1 row $id must expand under plan A")
    }
    corpus.drop(10).foreach { case (id, _) =>
      assert(got(id) == Seq(1, 2, 3),
        s"batch-2 row $id must expand under the REFRESHED plan")
    }
  }

  test("mixture report: realized vs owed, outage and eaten domains surface") {
    // weights: a (present, sampled), ghost (OWED but absent from the
    // source — the outage line), b (present in source, eaten by an
    // upstream filter before the report input)
    val src = frame // a: ids 0-3, b: 10-11, c: 20
    val mixed = DomainMixturePipe("id", "dom",
      Seq("a" -> 3L, "b" -> 1L), budget = 10L, maxRepeat = 2)(src)
    val report = MixtureReportPipe(src, "id", "dom",
      Seq("a" -> 3L, "ghost" -> 3L, "b" -> 1L), budget = 14L, maxRepeat = 2)(
      mixed.filter($"dom" =!= "b"))
      .select("dom", "needed", "capped", "fe", "emitted", "distinct_docs",
        "max_epoch", "quota_fill_bp")
      .as[(String, Long, Long, Long, Long, Long, Int, Long)]
      .collect().map(r => r._1 -> r).toMap
    // a: needed = 14*3/7 = 6, capped = min(6, 4*2) = 6, fe = 1; the
    // mixture above emitted per ITS OWN config (budget 10: 4 + partial)
    val aEmitted = report("a")._5
    assert(report("a")._2 == 6 && report("a")._3 == 6 && report("a")._4 == 1)
    assert(aEmitted >= 4 && report("a")._6 == 4 && report("a")._7 >= 1)
    assert(report("a")._8 == aEmitted * 10000 / 6)
    // ghost: owed 6, zero source rows -> capped 0, emitted 0, fill 0
    assert(report("ghost") == ("ghost", 6L, 0L, 0L, 0L, 0L, 0, 0L),
      s"outage row wrong: ${report("ghost")}")
    // b: owed 2, present in source (capped 2) but eaten upstream ->
    // emitted 0 with fill 0 — the report must SCREAM, not drop the row
    assert(report("b")._2 == 2 && report("b")._3 == 2 &&
      report("b")._5 == 0 && report("b")._8 == 0)
  }

  test("weights, budget, and epoch column fork the fingerprint") {
    val base = DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L)
    assert(base.fingerprint !=
      DomainMixturePipe("id", "dom", Seq("a" -> 2L), 10L).fingerprint)
    assert(base.fingerprint !=
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 11L).fingerprint)
    assert(base.fingerprint !=
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L,
        epochCol = "ep").fingerprint)
    assert(base.fingerprint ==
      DomainMixturePipe("id", "dom", Seq("a" -> 1L), 10L).fingerprint)
    // weights are a MAP: ordering must not fork the fingerprint
    assert(
      DomainMixturePipe("id", "dom", Seq("a" -> 1L, "b" -> 2L), 10L)
        .fingerprint ==
      DomainMixturePipe("id", "dom", Seq("b" -> 2L, "a" -> 1L), 10L)
        .fingerprint)
  }
}
