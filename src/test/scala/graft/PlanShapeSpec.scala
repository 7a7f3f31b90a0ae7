package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape guards: the scale properties the round-1 verdict
  * graded (pushdown reaching the scan, no unintended single-partition
  * exchanges, broadcasts on small sides) asserted against real plans so
  * regressions fail loudly.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    Queries.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (bm25 queries)") {
    val p = plan("s3_bm25")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,20)]"),
      s"missing pushed filter in:\n${p.take(2000)}")
  }

  test("nest has no bulk single-partition exchange") {
    val p = plan("n2_nest")
    // the per-partition offset table is allowed one tiny SinglePartition
    // window; the bulk data must move via rangepartitioning
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single <= 1, s"unexpected single-partition exchanges ($single)")
    assert(p.contains("rangepartitioning"))
  }

  test("perGroup padding shuffles by batch id, never through one partition") {
    val p = plan("l6b_padding_batch")
    // global rank is the zipWithIndex lineage (rangepartitioning), the
    // per-batch max is a window hash-partitioned on __grp__ — a
    // SinglePartition window here would mean the global-max scale hazard
    // snuck back in under the perGroup flag
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in perGroup padding:\n${p.take(2000)}")
    assert(p.contains("hashpartitioning(__grp__"),
      s"expected the batch-max window keyed on __grp__ in:\n${p.take(2000)}")
  }

  test("join-agg headliner broadcasts the small side") {
    val p = plan("q3_order_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"),
      s"expected a broadcast join in:\n${p.take(2000)}")
  }

  test("column pruning: projection query reads only selected columns") {
    val p = plan("u2_keep_columns")
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string>"),
      s"scan reads more than the projection:\n${p.take(2000)}")
  }

  test("passage generation stays shuffle-free") {
    val p = plan("t2_passages")
    // tokenize + generate = scan -> project -> generate; only the final
    // orderBy (gate determinism) may exchange
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"unexpected exchanges ($exchanges) in:\n${p.take(2000)}")
  }

  test("ParallelPipe fast path plans zero exchanges and zero joins") {
    import graft.pipes._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_partkey")
    val out = ParallelPipe.of(
      ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
      ApplyToCols(_ * 10, "x10", Seq("l_partkey")))(li)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"fast path shuffled:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"fast path joined:\n${p.take(2000)}")
  }

  test("shard assignment moves bulk data via rangepartitioning only") {
    val p = plan("sh_shard_assign")
    // one tiny SinglePartition window (the per-partition offset table) is
    // allowed; bulk rows must move by range partition
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single <= 1, s"unexpected single-partition exchanges ($single)")
    assert(p.contains("rangepartitioning"))
  }

  test("dsir probe side joins the broadcast weight table") {
    val p = plan("ir_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"weight table not broadcast:\n${p.take(2000)}")
  }

  test("hashed classifier gate plans no shuffle before the final sort") {
    val p = plan("qc_hash_score")
    // scoring itself is map-only: allowed exchanges are the gate orderBy
    // (rangepartitioning) and Pipe.widen's deliberate round-robin
    // repartition past a narrow scan; any hashpartitioning exchange means
    // the scorer grew a join/aggregate shuffle
    val exchanges = "Exchange".r.findAllIn(p).size
    val allowed = ("Exchange rangepartitioning".r.findAllIn(p).size
      + "Exchange RoundRobinPartitioning".r.findAllIn(p).size)
    assert(exchanges <= allowed,
      s"unexpected exchanges ($exchanges vs allowed $allowed) in:\n${p.take(2000)}")
  }

  test("hive-partitioned layout prunes partitions at plan time") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = "/tmp/graft_planshape_partitioned"
    graft.sources.Formats.writePartitioned(docs, path, Seq("lang"))
    val filtered = spark.read.parquet(path).filter(col("lang") === "en")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"no partition pruning in:\n${p.take(2000)}")
    // pruning must be value-preserving too
    assert(filtered.count() == docs.filter(col("lang") === "en").count())
  }

  test("take_subset small-n plans a topK heap, not a global sort") {
    val p = plan("u1_take_subset")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n${p.take(2000)}")
    assert(!p.contains("rangepartitioning"),
      s"global sort shuffle for a 500-row subset:\n${p.take(2000)}")
  }

  test("take_subset large-n prefilters instead of globally sorting") {
    import graft.pipes.TakeSubset
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val key = "spark.sql.execution.topKSortFallbackThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "5") // force every n >= 5 onto the large-n path
      val picked = TakeSubset(n = Some(40), hashKey = Some("p_partkey"))(part)
      // hash-range prefilter must select the SAME set a full sort would
      spark.conf.set(key, "1000000")
      val full = TakeSubset(n = Some(40), hashKey = Some("p_partkey"))(part)
      val a = picked.select("p_partkey").collect().map(_.getLong(0)).sorted.toSeq
      val b = full.select("p_partkey").collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b, s"prefiltered selection diverged: ${a.take(5)} vs ${b.take(5)}")
      // random mode: exact n rows out, and the sort input is pre-shrunk by
      // a Bernoulli Sample (the range shuffle that remains carries ~n
      // sampled rows, not the full table)
      spark.conf.set(key, "5")
      val rnd = TakeSubset(n = Some(40), seed = 7L)(part)
      assert(rnd.count() == 40)
      assert(rnd.queryExecution.executedPlan.toString.contains("Sample"),
        "large-n random path did not sample before sorting")
    } finally spark.conf.set(key, old)
  }

  test("no explicit broadcast hint on unbounded frames (group lookup)") {
    // the hint would be honored regardless of size and OOM at 100 TB; the
    // LOGICAL plan must carry no ResolvedHint — Catalyst may still choose
    // a broadcast join for a small lookup on its own
    val q = Queries.queries("s4_group_lookup")(spark, "/root/testdata/sf0.001")
    val logical = q.queryExecution.optimizedPlan.toString
    assert(!logical.contains("ResolvedHint") &&
      !logical.toLowerCase.contains("strategy=broadcast"),
      s"explicit broadcast hint present:\n${logical.take(2000)}")
  }
}
