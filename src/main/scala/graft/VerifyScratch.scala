package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver: 33 labeled checks across the curation,
  * selection, dedup, packing, streaming, and layout surfaces on real
  * sf0.001 parquet (the /verify recipe's step 1-2).
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

    // 1. RepetitionStats on real docs: fractions in [0,1], wall-clock sane
    // (the index-based runLengths formulation hung >200 s at sf0.01)
    val t0 = System.nanoTime()
    val rep = graft.llm.RepetitionStatsPipe("text")(docs)
      .select("doc_id", "dup_token_frac", "top_bigram_frac", "dup_bigram_frac")
    val repRows = rep.collect()
    val repSec = (System.nanoTime() - t0) / 1e9
    val inRange = repRows.forall { r =>
      (1 to 3).forall(i => r.getDouble(i) >= 0 && r.getDouble(i) <= 1) }
    println(f"[1] repetition ${repRows.length} rows in $repSec%.1f s, " +
      s"fracs in [0,1] -> ${inRange && repRows.nonEmpty && repSec < 30}")

    // 2. Decontaminate: every eval doc flags itself (a doc always shares
    // its own n-grams); drop mode removes exactly the flagged set
    val eval = docs.filter(col("doc_id") < 10)
    val flagged = graft.llm.DecontaminatePipe(eval, "text", "doc_id", 4)(docs)
    val nFlag = flagged.filter(col("contaminated")).count()
    val selfFlagged = flagged.filter(col("doc_id") < 10 && !col("contaminated")).count()
    val kept = graft.llm.DecontaminatePipe(eval, "text", "doc_id", 4,
      flagOnly = false)(docs).count()
    println(s"[2] decontaminate nFlag=$nFlag self=$selfFlagged kept=$kept " +
      s"-> ${selfFlagged == 0 && kept == docs.count() - nFlag}")

    // 3. Decontaminate plan: eval n-gram side is broadcast (no shuffle of
    // the train side for the semi-join probe)
    val dplan = flagged.queryExecution.executedPlan.toString
    val hasBcast = dplan.contains("BroadcastHashJoin") || dplan.contains("BroadcastExchange")
    println(s"[3] decontaminate broadcasts eval ngrams -> $hasBcast")

    // 4. PiiRedact on planted PII: counts match plants, text masked
    val planted = docs.select(col("doc_id"), concat(col("text"),
      lit(" reach me: a.b@c.org / 555-0101 / 192.168.0.1")).as("text"))
    val red = graft.llm.PiiRedactPipe("text")(planted)
    val ok4 = red.filter(col("n_emails") === 1 && col("n_phones") === 1 &&
      col("n_ips") === 1 && col("redacted").contains("<EMAIL>") &&
      col("redacted").contains("<PHONE>") && col("redacted").contains("<IP>") &&
      !col("redacted").rlike("@|555-0101")).count()
    println(s"[4] pii redaction all rows masked -> ${ok4 == docs.count()}")

    // 5. StratifiedSample: per-group realized rates near nominal
    val samp = graft.llm.StratifiedSamplePipe("doc_id", "lang",
      Seq("en" -> 0.3), defaultRate = 0.7)(docs)
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    val nEnKept = samp.filter(col("lang") === "en").count().toDouble
    val rEn = nEnKept / nEn
    println(f"[5] stratified en rate=$rEn%.2f (nominal 0.3) -> ${rEn > 0.15 && rEn < 0.45}")

    // 6. AsOfJoin on real events at sf0.001: every asof ts <= left ts,
    // and n_prior == exact count of visible right rows (spot-checked by
    // a per-row aggregate replay)
    val ev = graft.streaming.EventStream.readBatch(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"), col("value"))
    val aj = graft.operators.AsOfJoin.backward(clicks,
      purch.withColumnRenamed("pts", "ts"), Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"))
    val replay = clicks.as("l").join(purch.as("r"),
        col("l.user_id") === col("r.user_id") && col("pts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(count(col("r.event_id")).as("np"),
        max(struct(col("pts"), col("r.event_id"))).as("mx"))
      .select(col("event_id"), col("np"), col("mx.event_id").as("best"))
    val mismatch = aj.join(replay, "event_id")
      .filter(col("asof_n_prior") =!= col("np") ||
        !(col("asof_event_id") <=> col("best"))).count()
    println(s"[6] asof == join+argmax replay on ${clicks.count()} clicks " +
      s"-> ${mismatch == 0}")

    // 7. AsOfJoin plan shape: no join operator, exactly one Exchange on
    // the key (union + single window pass)
    val ajplan = aj.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(ajplan).length
    println(s"[7] asof plan join-free, exchanges=$nEx -> " +
      s"${!ajplan.contains("Join") && nEx <= 2}")

    // 8. forward as-of == join+argmin replay on the same real events
    val ajf = graft.operators.AsOfJoin.forward(clicks,
      purch.withColumnRenamed("pts", "ts"), Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"))
    val freplay = clicks.as("l").join(purch.as("r"),
        col("l.user_id") === col("r.user_id") && col("pts") >= col("l.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(count(col("r.event_id")).as("nn"),
        min(struct(col("pts"), (-col("r.event_id")).as("neg"))).as("mn"))
      .select(col("event_id"), col("nn"), (-col("mn.neg")).as("best"))
    val fmismatch = ajf.join(freplay, "event_id")
      .filter(col("asof_n_next") =!= col("nn") ||
        !(col("asof_event_id") <=> col("best"))).count()
    println(s"[8] forward asof == join+argmin replay -> ${fmismatch == 0}")

    // 9. tolerance: every surviving match obeys the bound; stale matches
    // are nulled but their visibility count survives
    val tol = 3600L * 1000000L // 1 h in micros
    val ajt = graft.operators.AsOfJoin.backward(clicks,
      purch.withColumnRenamed("pts", "ts"), Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"),
      within = Some((l, r) => unix_micros(l) - unix_micros(r) <= tol))
    val tBad = ajt.join(replay, "event_id")
      .join(purch.select(col("event_id").as("best2"), col("pts")),
        col("best") === col("best2"), "left")
      .filter(
        // survived -> must be within tolerance and equal the unfiltered best
        (col("asof_event_id").isNotNull &&
          (col("asof_event_id") =!= col("best"))) ||
        // nulled but a best exists -> best must be out of tolerance
        (col("asof_event_id").isNull && col("best").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("pts")) <= tol) ||
        col("asof_n_prior") =!= col("np")).count()
    println(s"[9] tolerance nulls stale matches only -> ${tBad == 0}")

    // 10. sequence packing on real docs: offsets tile exactly (loss-free
    // concat-and-chunk) and the prefix sum is range-partitioned
    val pdocs = docs.withColumn("n",
      size(split(trim(col("text")), "\\s+")).cast("long"))
    val packed = graft.llm.PackSequencesPipe("n", 128, "doc_id")(pdocs)
    val offs = packed.select(col("doc_id"),
        (col("pack_first") * 128 + col("pack_pos")).as("off"), col("n"))
      .orderBy("doc_id").collect()
    val tiles = offs.sliding(2).forall { case Array(a, b) =>
      b.getLong(1) == a.getLong(1) + a.getLong(2); case _ => true }
    val pplan = packed.queryExecution.executedPlan.toString
    println(s"[10] packing tiles exactly, RDD-lineage prefix sum -> " +
      s"${tiles && offs.head.getLong(1) == 0 && pplan.contains("ExistingRDD") &&
        !pplan.contains("Exchange SinglePartition")}")

    // 11. deterministic shuffle on real docs: permutation, layout-stable,
    // and the plan range-partitions on the slot (distributed sort)
    val sh = graft.llm.DeterministicShufflePipe("doc_id")(docs)
    val sh2 = graft.llm.DeterministicShufflePipe("doc_id")(docs.repartition(7))
    val stable = sh.select("doc_id", "shuffle_slot")
      .except(sh2.select("doc_id", "shuffle_slot")).count() == 0
    val shplan = sh.queryExecution.executedPlan.toString
    println(s"[11] shuffle permutation stable+range-partitioned -> " +
      s"${stable && sh.count() == docs.count() && shplan.contains("rangepartitioning")}")

    // 12. corpus stats: approx and exact percentiles agree on real data,
    // groupBy plan has a partial aggregate (map-side combine)
    val ex = graft.llm.CorpusStatsPipe(Seq("lang"), "n_chars", approx = false)(docs)
    val ap = graft.llm.CorpusStatsPipe(Seq("lang"), "n_chars", approx = true)(docs)
    val joined = ex.select(col("lang"), col("p50").as("e"))
      .join(ap.select(col("lang"), col("p50").as("a")), "lang")
    val csBad = joined.filter(abs(col("e") - col("a")) > col("e") * 0.05 + 5).count()
    val csplan = ex.queryExecution.executedPlan.toString
    println(s"[12] corpus stats approx~exact, partial agg -> " +
      s"${csBad == 0 && csplan.contains("partial_")}")

    // 13. line dedup on wrapped real docs: removed-line mass accounts for
    // the shrink exactly (token conservation), no doc lost
    val wrapped = docs.withColumn("text",
      regexp_replace(trim(col("text")), "((?:\\S+\\s+){7}\\S+)\\s+", "$1\n"))
    val ld = graft.llm.LineDedupPipe("text", "doc_id")(wrapped)
    val lines = (d: org.apache.spark.sql.DataFrame) =>
      d.select(explode(split(col("text"), "\n"))).filter(length(col("col")) > 0).count()
    val conserved = lines(wrapped) == lines(ld) + ld.agg(sum("n_lines_removed"))
      .collect()(0).getLong(0)
    println(s"[13] line dedup conserves line mass, ${ld.count()} docs -> " +
      s"${conserved && ld.count() == docs.count()}")

    // 14. url filter end-to-end: planted blocked/clean URLs classified
    val uplanted = docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(" x http://bad.example.com/p"))
        .otherwise(lit(" x https://good.org/p"))).as("text"))
    val uf = graft.llm.UrlFilterPipe("text", Seq("example.com"))(uplanted)
    val ufOk = uf.filter((col("doc_id") % 2 === 0) =!= col("url_blocked")).count() == 0
    println(s"[14] url filter classifies planted urls -> $ufOk")

    // 15. composed curate-v2 chain runs end-to-end and every stage bites
    val v2 = graft.SparkEntry.queries("pp_curate_v2")(spark, sf)
    val n = v2.count()
    val nRemoved = v2.filter(col("n_lines_removed") > 0).count()
    println(s"[15] curate-v2: $n/${docs.count()} survive, $nRemoved line-deduped " +
      s"-> ${n > 0 && n < docs.count() && nRemoved > 0}")

    // 16. unigram NLL on real docs: broadcast vocab probe (no shuffle of
    // the scoring side on the token), scores positive and finite
    val ug = graft.llm.UnigramLogProbPipe("text", "doc_id")(docs)
    val ugplan = ug.queryExecution.executedPlan.toString
    val ugOk = ug.filter(col("unigram_nll") <= 0 || col("unigram_nll").isNull ||
      col("unigram_nll") > 50).count() == 0
    println(s"[16] unigram nll sane + broadcast vocab -> " +
      s"${ugOk && ugplan.contains("BroadcastHashJoin")}")

    // 17. group top-k on real docs: every group has <= k rows and its
    // members dominate the group's excluded scores
    val topk = graft.operators.GroupTopKPipe(Seq("lang"), "n_chars", 3,
      "doc_id")(docs)
    val sizesOk = topk.groupBy("lang").count()
      .filter(col("count") > 3).count() == 0
    val worstKept = topk.groupBy("lang").agg(min("n_chars").as("wk"))
    val excluded = docs.join(topk.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(max("n_chars").as("be"))
    val dom = worstKept.join(excluded, "lang")
      .filter(col("be") > col("wk")).count() == 0
    println(s"[17] group top-k bounded + dominant -> ${sizesOk && dom}")

    // 18. binned range join == naive inequality join on real events
    val cl = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val wn = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + 600L * 1000000L).as("hi"))
    val binned = graft.operators.RangeJoin.pointInInterval(cl, wn,
      "ts_us", "lo", "hi", binWidth = 200L * 1000000L, // bins << span
      keyCols = Seq("user_id")).select("event_id", "err_id")
    val naive = cl.as("c").join(wn.as("w"),
      col("c.user_id") === col("w.user_id") &&
        col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .select("event_id", "err_id")
    val rjOk = binned.except(naive).count() == 0 &&
      naive.except(binned).count() == 0 && binned.count() == naive.count()
    println(s"[18] binned range join == naive join (${naive.count()} pairs) -> $rjOk")

    // 19. rolling window on real events == per-row subquery replay
    val rw = graft.operators.RollingWindowPipe(Seq("user_id"), "ts_us",
      "value", windowSize = 3600L * 1000000L)(
      ev.withColumn("ts_us", unix_micros(col("ts"))))
    val evu = ev.withColumn("ts_us", unix_micros(col("ts")))
    val rwNaive = evu.as("a").join(evu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts_us") <= col("a.ts_us") &&
          col("b.ts_us") >= col("a.ts_us") - 3600L * 1000000L)
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("nc"), round(sum(col("b.value")), 4).as("ns"))
    val rwBad = rw.select(col("event_id"), col("rolling_cnt"), col("rolling_sum"))
      .join(rwNaive, "event_id")
      .filter(col("rolling_cnt") =!= col("nc") ||
        col("rolling_sum") =!= col("ns")).count()
    println(s"[19] rolling window == naive self-join replay -> ${rwBad == 0}")

    // 20. cluster-balanced sample on real embeddings: caps hold and the
    // kept set is layout-invariant
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = graft.llm.ClusterBalancedSamplePipe.formulaCentroids(8, 64)
    val cs1 = graft.llm.ClusterBalancedSamplePipe("embedding", "vec_id",
      cents, cap = 10)(emb)
    val cs2 = graft.llm.ClusterBalancedSamplePipe("embedding", "vec_id",
      cents, cap = 10)(emb.repartition(11))
    val capOk = cs1.groupBy("cluster").count().filter(col("count") > 10).count() == 0
    val stable2 = cs1.select("vec_id", "cluster")
      .except(cs2.select("vec_id", "cluster")).count() == 0
    println(s"[20] cluster sample capped + layout-invariant -> ${capOk && stable2}")

    // 21. vocab learn+encode on real docs: decode round-trips every
    // zero-OOV doc, vocab probe is broadcast
    val vembDocs = docs
    val vEnc = graft.llm.VocabEncodePipe("text", "doc_id", 25)(vembDocs)
    val vMap = graft.llm.VocabOps.build(vembDocs, "text", 25)
      .select("id", "token").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val vBad = vEnc.filter(col("n_oov") === 0)
      .select("text", "token_ids").collect().count { r =>
        val dec = r.getSeq[Long](1).map(i => vMap(i.toInt)).mkString(" ")
        dec != r.getString(0).trim.split("\\s+").mkString(" ")
      }
    val vPlan = vEnc.queryExecution.executedPlan.toString
    println(s"[21] vocab encode round-trips, broadcast probe -> " +
      s"${vBad == 0 && vPlan.contains("BroadcastHashJoin")}")

    // 22. line dedup hashKey mode on wrapped real docs: identical output
    // to exact mode, and the count/join shuffle keys on the 8-byte hash
    // (xxhash64 in the plan, line text absent from the aggregate key)
    val ldh = graft.llm.LineDedupPipe("text", "doc_id", hashKey = true)(wrapped)
    val ldSame = ld.select("doc_id", "text", "n_lines_removed")
      .except(ldh.select("doc_id", "text", "n_lines_removed")).count() == 0 &&
      ldh.count() == ld.count()
    val ldhPlan = ldh.queryExecution.executedPlan.toString
    println(s"[22] line dedup hashKey == exact, hash shuffle key -> " +
      s"${ldSame && ldhPlan.contains("xxhash64")}")

    // 23. DSIR importance weights on real docs: English target lifts the
    // mean weight of English docs above non-English, weight table joins
    // broadcast (the 100 TB probe side must not shuffle on the feature)
    val iw = graft.llm.ImportanceWeightPipe("text", "doc_id",
      docs.filter(col("lang") === "en"), "text")(docs)
    val iwMeans = iw.groupBy(col("lang") === "en").agg(avg("dsir_logweight"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val iwPlan = iw.queryExecution.executedPlan.toString
    println(s"[23] dsir: en-target mean(en) > mean(other), broadcast table -> " +
      s"${iwMeans(true) > iwMeans(false) && iwPlan.contains("BroadcastHashJoin")}")

    // 24. hashed linear scorer is map-only: the only Exchange allowed is
    // Pipe.widen's deliberate round-robin past a narrow scan (weight
    // vector rides as a literal — no join/aggregate shuffle)
    def onlyWidenExchanges(p: String): Boolean =
      "Exchange".r.findAllIn(p).size ==
        "Exchange RoundRobinPartitioning".r.findAllIn(p).size
    val hls = graft.llm.HashedLinearScorerPipe("text",
      graft.llm.HashedLinearScorerPipe.formulaWeights(4096))(docs)
    val hlsPlan = hls.queryExecution.executedPlan.toString
    println(s"[24] hashed scorer map-only (no Exchange) -> " +
      s"${onlyWidenExchanges(hlsPlan) && hls.count() == docs.count()}")

    // 25. substring dedup on real docs + planted boilerplate: every 5th
    // doc loses >= the 7 planted tokens; clean docs keep token counts
    val sdPlanted = docs.withColumn("text",
      when(col("doc_id") % 5 === 0, concat(col("text"),
        lit(" subscribe to our newsletter for updates today")))
        .otherwise(col("text")))
    val sd = graft.llm.SubstringDedupPipe("text", "doc_id", k = 5)(sdPlanted)
    val sdBad = sd.filter(col("doc_id") % 5 === 0 && col("n_tokens_removed") < 7)
      .count()
    println(s"[25] substring dedup removes planted boilerplate -> ${sdBad == 0}")

    // 26. cross-corpus minhash: near-copy eval docs pair with their train
    // source (id_b = id_a + 100000 for every planted leak)
    val ccToks = split(col("text"), " ")
    val ccEval = docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 100000).as("eval_id"),
      array_join(slice(ccToks, lit(1), greatest(size(ccToks) - 2, lit(1))), " ")
        .as("text"))
    val cc = graft.llm.CrossCorpusMinHashPipe("text", "doc_id",
      ccEval, "text", "eval_id", jaccardThreshold = 0.5)(docs)
    val ccPairs = cc.select("id_a", "id_b").collect()
    val ccPlanted = ccPairs.count(r => r.getLong(1) == r.getLong(0) + 100000)
    val ccExpected = docs.filter(col("doc_id") % 10 === 0).count()
    println(s"[26] cross-corpus minhash finds planted leaks -> " +
      s"${ccPlanted == ccExpected}")

    // 27. trainable log-odds weights: two bucket-count aggregates on real
    // docs, weight vector sized by the hash space, scoring still map-only
    val (tw, tb) = graft.llm.HashedLinearScorerPipe.trainLogOdds(
      docs.withColumn("y", col("lang") === "en"), "text", "y", 512)
    val tScored = graft.llm.HashedLinearScorerPipe("text", tw, tb)(docs)
    val tPlan = tScored.queryExecution.executedPlan.toString
    println(s"[27] trained scorer: 512 weights, finite bias, map-only -> " +
      s"${tw.size == 512 && !tb.isNaN && onlyWidenExchanges(tPlan) &&
        tScored.count() == docs.count()}")

    // 28. BPE learn + encode on real docs: 6 merges learned, encode is
    // lossless (subword concat == word concat) and map-only — the only
    // exchange allowed is the deliberate round-robin widen that spreads
    // the interpreted merge folds (13 s -> 1.3 s at sf0.1); no KEYED
    // shuffle (hash/range) may appear
    val bpMerges = graft.text.BpeOps.learn(docs, "text", numMerges = 6)
    val bp = graft.text.BpeEncodePipe("text", bpMerges)(docs)
    val bpLossy = bp.filter(
      concat_ws("", col("bpe_tokens")) =!=
        concat_ws("", split(trim(col("text")), "\\s+"))).count()
    val bpPlan = bp.queryExecution.executedPlan.toString
    println(s"[28] bpe: 6 merges, lossless encode, no keyed shuffle -> " +
      s"${bpMerges.size == 6 && bpLossy == 0 &&
        !bpPlan.contains("hashpartitioning") &&
        !bpPlan.contains("rangepartitioning")}")

    // 29. temperature mix on real docs: the smallest lang survives whole,
    // the largest is downsampled hardest (counts flatten toward n^alpha),
    // rates broadcast
    val tmOut = graft.llm.TemperatureMixPipe("doc_id", "lang")(docs)
    val tmIn = docs.groupBy("lang").count().withColumnRenamed("count", "n0")
    val tmKept = tmOut.groupBy("lang").count()
    val tmJoined = tmIn.join(tmKept, Seq("lang"), "left")
      .select(col("lang"), col("n0"), coalesce(col("count"), lit(0L)).as("n1"))
      .collect()
    val tmMin = tmJoined.minBy(_.getLong(1))
    val tmMax = tmJoined.maxBy(_.getLong(1))
    val tmOk = tmMin.getLong(2) == tmMin.getLong(1) &&
      tmMax.getLong(2) < tmMax.getLong(1) &&
      tmJoined.forall(r => r.getLong(2) > 0 && r.getLong(2) <= r.getLong(1))
    println(s"[29] temperature mix keeps tail whole, downsamples head -> " +
      s"${tmOk && tmOut.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")}")

    // 30. bigram nll on real docs: finite, nonneg, broadcast conditional
    // table; short docs (n<2) score exactly 0
    val bgOut = graft.llm.BigramLogProbPipe("text", "doc_id")(docs)
    val bgBad = bgOut.filter(col("bigram_nll") < 0 ||
      col("bigram_nll").isNull || isnan(col("bigram_nll"))).count()
    println(s"[30] bigram nll finite+nonneg, broadcast table -> " +
      s"${bgBad == 0 && bgOut.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")}")

    // 31. pack materialization on real docs: token conservation + every
    // pack full except the last; prefix sum stays range-partitioned
    val pmDocs = docs.withColumn("toks", split(trim(col("text")), "\\s+"))
    val pm = graft.llm.PackMaterializePipe("toks", 128, "doc_id", "doc_id")(pmDocs)
    val pmSizes = pm.select("pack_id", "n_tokens").orderBy("pack_id").collect()
    val pmTotal = pmDocs.agg(sum(size(col("toks")))).head().getLong(0)
    val pmOk = pmSizes.dropRight(1).forall(_.getInt(1) == 128) &&
      pmSizes.map(_.getInt(1).toLong).sum == pmTotal &&
      pm.queryExecution.executedPlan.toString.contains("ExistingRDD")
    println(s"[31] pack materialization conserves tokens, tiles full -> $pmOk")

    // 32. resize stub: every output exactly targetBytes (non-empty media)
    val rz = graft.llm.ResampleBytesPipe("media", 32)(
      graft.llm.ToMediaColumnPipe("text")(docs))
    val rzBad = rz.filter(length(col("text")) > 0 &&
      octet_length(col("media_resized")) =!= 32).count()
    println(s"[32] resize stub emits fixed-size media -> ${rzBad == 0}")

    // 33. weighted interleave on real docs: 3:1 en/other — in every
    // window of 40 consecutive positions, en holds 65-85% of slots
    val ilv = graft.llm.InterleaveDatasets(Seq(
      docs.filter(col("lang") === "en").select("doc_id", "lang") -> 3.0,
      docs.filter(col("lang") =!= "en").select("doc_id", "lang") -> 1.0),
      "doc_id")
    val ilvFirst = ilv.filter(col("interleave_pos") < 200)
      .groupBy(expr("interleave_pos div 40")).agg(
        avg(when(col("source_idx") === 0, 1.0).otherwise(0.0)).as("frac"))
      .collect()
    val ilvOk = ilvFirst.forall(r => r.getDouble(1) > 0.65 && r.getDouble(1) < 0.85)
    println(s"[33] interleave holds the 3:1 mix in every window -> $ilvOk")

    // 34. resize on a 2.2MB binary: source positions exact past the int32
    // product range (pre-fix i*n wrapped negative, ADVICE r6)
    {
      import spark.implicits._
      val nBytes = 2200000
      val big = Array.tabulate[Byte](nBytes)(i => ((i / 8192) % 251).toByte)
      val t = 1024
      val out = graft.llm.ResampleBytesPipe("media", t)(
        Seq((1L, big)).toDF("doc_id", "media"))
        .select("media_resized").head().getAs[Array[Byte]](0)
      val ok = out.length == t && (0 until t by 61).forall { i =>
        out(i) == big((i.toLong * nBytes / t).toInt) }
      println(s"[34] resize exact past int32 product range -> $ok")
    }

    // 35. temperature mix with a NULL group: null rows are rate-filtered
    // like any group (pre-fix the === join let them pass whole, ADVICE r6)
    {
      val withNull = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("lang")).as("lang"))
      val tmN = graft.llm.TemperatureMixPipe("doc_id", "lang")(withNull)
      val nullIn = withNull.filter(col("lang").isNull).count()
      val nullKept = tmN.filter(col("lang").isNull).count()
      println(s"[35] null group rate-filtered ($nullKept/$nullIn kept) -> " +
        s"${nullKept > 0 && nullKept < nullIn}")
    }

    // 36. interleave guards: weight > 2e6 (zero fixed-point inverse) raises
    {
      val raised = try {
        graft.llm.InterleaveDatasets(
          Seq(docs.select("doc_id") -> 3e6), "doc_id"); false
      } catch { case _: IllegalArgumentException => true }
      println(s"[36] interleave rejects weight > 2e6 -> $raised")
    }

    // 37. hashed scorer trainLogOdds on an EMPTY frame: no NPE (ADVICE r6)
    {
      val empty = docs.filter(col("doc_id") < 0)
        .select(col("text"), (col("doc_id") > 2).as("y"))
      val (w, b) = graft.llm.HashedLinearScorerPipe.trainLogOdds(
        empty, "text", "y", numBuckets = 64)
      val ok = w.size == 64 && !b.isNaN && !b.isInfinite
      println(s"[37] empty-frame training returns finite weights -> $ok")
    }

    // 38. registry-built OPQ + residual default factory on real embeddings:
    // sane top-1 (every query's nearest neighbor is itself)
    {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val corpus = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.AutoSearchEngine("opq_ivf_pq", corpus,
        graft.search.SearchConfig(k = 3, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      val hits = eng(queries)
        .select(col("qid"), element_at(col("`index.idx`"), 1).as("top1"))
        .collect()
      val selfTop = hits.count(r => r.getLong(0) == r.getLong(1))
      println(s"[38] opq_ivf_pq registry engine: $selfTop/10 self-top1 -> " +
        s"${selfTop >= 8}")
    }

    // 39. dense scale trap: bare name refuses above the cap, dense_exact
    // opts in (the r6-verdict config-port hazard)
    {
      val big = spark.range(graft.search.BruteForceDenseEngine.BroadcastRowCap + 1)
        .select(col("id").as("idx"), array(lit(1.0f)).as("vector"))
      import spark.implicits._
      val queries = Seq((0L, Seq(1.0f))).toDF("qid", "query.vector")
      val cfg = graft.search.SearchConfig(k = 1, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val refused = try {
        graft.search.AutoSearchEngine("dense", big, cfg)(queries); false
      } catch { case e: IllegalStateException => e.getMessage.contains("dense_ivf") }
      val optIn = graft.search.AutoSearchEngine("dense_exact", big, cfg)(queries)
        .columns.contains("index.idx")
      println(s"[39] dense refuses cartesian, dense_exact opts in -> " +
        s"${refused && optIn}")
    }

    // 40. pretrained tokenizer lifecycle on real docs: learn -> export ->
    // import -> encode equals the learned path byte-for-byte
    {
      val merges = graft.text.BpeOps.learn(docs.select("doc_id", "text"), "text", 4)
      val dir = java.nio.file.Files.createTempDirectory("vs-bpe").toString
      graft.text.PretrainedVocab.saveMerges(spark, s"$dir/merges.txt", merges)
      val learned = graft.text.BpeEncodePipe("text", merges)(docs)
        .select("doc_id", "bpe_tokens").collect().map(_.toString).sorted.toSeq
      val frozen = graft.text.BpeEncodePipe.fromPretrained(
        spark, "text", s"$dir/merges.txt")(docs)
        .select("doc_id", "bpe_tokens").collect().map(_.toString).sorted.toSeq
      println(s"[40] pretrained merges round-trip encode identical -> " +
        s"${learned == frozen && merges.size == 4}")
    }

    // 42. PQ/IVF persisted-state keys use full-width content digests:
    // different fixed state -> different key, same content -> same key,
    // and the digest is wider than a 32-bit hashCode rendering
    {
      val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val bookA = Some(Seq(Seq(Seq(1.0, 2.0)), Seq(Seq(3.0, 4.0))))
      val bookB = Some(Seq(Seq(Seq(1.0, 2.0)), Seq(Seq(3.0, 5.0))))
      def key(b: Option[Seq[Seq[Seq[Double]]]]) =
        graft.search.PQDenseEngine(corpus, fixedCodebooks = b)
          .params("fixedBooks")
      val (ka, ka2, kb) = (key(bookA), key(bookA), key(bookB))
      println(s"[42] PQ state key is a content digest (len=${ka.length}) -> " +
        s"${ka == ka2 && ka != kb && ka.length == 16 &&
          ka.forall(c => c.isDigit || ('a' to 'f').contains(c))}")
    }

    // 43. single-line minified vocab.json whose tokens include the words
    // "token"/"id" parses as a vocab object; a genuine 1-row JSONL still
    // takes the JSONL branch (the ADVICE misdetection)
    {
      val dir = java.nio.file.Files.createTempDirectory("vs-vocab").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/minified.json"),
        """{"the": 0, "token": 1, "id": 2, "cat": 3}""")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/onerow.jsonl"),
        """{"token": "the", "id": 0}""" + "\n")
      val mini = graft.text.PretrainedVocab.loadVocab(spark, s"$dir/minified.json")
      val onerow = graft.text.PretrainedVocab.loadVocab(spark, s"$dir/onerow.jsonl")
      println(s"[43] minified vocab.json vs 1-row JSONL disambiguated -> " +
        s"${mini == Map("the" -> 0, "token" -> 1, "id" -> 2, "cat" -> 3) &&
          onerow == Map("the" -> 0)}")
    }

    // 44. tokenizer total-budget contract: maxLength=1 with specials is a
    // loud refusal; maxLength=2 on real docs emits exactly [bos, eos]
    {
      val refused = try {
        graft.text.TokenizerPipe(maxLength = Some(1),
          specialTokens = Some((101, 102))); false
      } catch { case _: IllegalArgumentException => true }
      val out = graft.text.TokenizerPipe(maxLength = Some(2),
        specialTokens = Some((101, 102)))(docs.limit(5))
      val ids = out.select("input_ids").collect()
        .map(_.getSeq[Int](0).toSeq)
      println(s"[44] specials budget: maxLength=1 refused, maxLength=2 -> " +
        s"${refused && ids.nonEmpty && ids.forall(_ == Seq(101, 102))}")
    }

    // 41. streaming near-dedup determinism: two full drains over the same
    // planted corpus produce the identical pair set
    {
      val d1 = graft.streaming.EventStream.runNearDedupStream(spark, sf)
        .dropDuplicates("id_a", "id_b")
        .select("id_a", "id_b").collect().map(_.toString).sorted.toSeq
      val d2 = graft.streaming.EventStream.runNearDedupStream(spark, sf)
        .dropDuplicates("id_a", "id_b")
        .select("id_a", "id_b").collect().map(_.toString).sorted.toSeq
      println(s"[41] streaming near-dedup rerun-identical (${d1.size} pairs) -> " +
        s"${d1 == d2 && d1.nonEmpty}")
    }

    // 45. BM25 build-side stats persist without a stateDir (the
    // build-once/query-many contract): postings report a storage level
    // and fillRange's stats.n equals the corpus row count
    {
      val eng = graft.search.BM25Engine(docs,
        graft.search.SearchConfig(k = 5, queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text")
      val lvl = eng.stats.postings.storageLevel
      val nOk = eng.stats.n == docs.count()
      println(s"[45] bm25 stats persisted (useMemory=${lvl.useMemory} " +
        s"useDisk=${lvl.useDisk}) n=${eng.stats.n} -> ${lvl.useMemory && lvl.useDisk && nOk}")
    }

    // 46. SRP hamming-early candidate pruning: planted near-copies on the
    // real embeddings (the dd_srp_cosine shape at a third scale) emit
    // exactly the planted pairs, and the executed plan filters on
    // bit_count strictly deeper than the vector-fetch joins
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val raw = emb.select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val plantedV = raw.unionByName(raw.filter(col("vec_id") < 30).select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
      val out = graft.llm.SRPCosineDedupPipe("embedding", "vec_id")(plantedV)
      val rows = out.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (0L until 30L).map(i => (i, i + 10000)).sorted
      // structural: the hamming (bit_count) predicate must evaluate over
      // signature-only inputs — Catalyst pushes it into the band join
      // condition itself — never downstream of a vector-fetch join (the
      // old plan filtered after v_a/v_b were already shuffled)
      val hamInputs = out.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("bit_count") =>
          f.children.flatMap(_.output)
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.toString.contains("bit_count")) =>
          j.children.flatMap(_.output)
      }
      val planOk = hamInputs.nonEmpty &&
        hamInputs.forall(!_.exists(_.name.startsWith("v_")))
      println(s"[46] srp planted pairs=${rows.size} hammingBelowVectorJoin=$planOk " +
        s"-> ${rows == want && planOk}")
    }

    // 47. SimHash hamming-early pruning: the bit_count predicate sits
    // BELOW the pair-dedup aggregate (candidates pruned before the
    // dedup shuffle), and output on real docs is non-empty with
    // hamming <= 3
    {
      val simBase = docs.select(col("doc_id"), col("text"))
      val sh = graft.llm.SimHashDedupPipe("text", "doc_id",
        tokenHash = "poly61")(simBase.unionByName(
        simBase.filter(col("doc_id") < 20).select(
          (col("doc_id") + 10000).as("doc_id"), col("text"))))
      val rows = sh.collect()
      val hamOk = rows.nonEmpty && rows.forall(_.getInt(2) <= 3)
      val aggs = sh.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.toString.contains("bit_count") => a
      }
      println(s"[47] simhash pairs=${rows.length} hammingBelowDedupAgg=" +
        s"${aggs.nonEmpty} -> ${hamOk && aggs.nonEmpty}")
    }

    // 48. Pipe.widen in LineDedup/VocabEncode/ResizeMediaStub: a
    // single-partition input is redistributed (RoundRobin exchange in the
    // plan) before the heavy map stage, and results match the unwidened
    // (already-wide) path value-for-value
    {
      val narrow = docs.coalesce(1)
      val wideIn = docs.repartition(8)
      type DF = org.apache.spark.sql.DataFrame
      def run(f: DF => DF, in: DF, cols: Seq[String]) =
        f(in).select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
      val cases: Seq[(String, DF => DF, Seq[String])] = Seq(
        ("line_dedup", graft.llm.LineDedupPipe("text", "doc_id")(_),
          Seq("doc_id", "text", "n_lines_removed")),
        ("vocab_encode", graft.llm.VocabEncodePipe("text", "doc_id",
          vocabSize = 25)(_), Seq("doc_id", "token_ids", "n_oov")),
        ("resize_stub", (df: DF) =>
          graft.llm.ResampleBytesPipe("media", targetBytes = 32)(
            graft.llm.ToMediaColumnPipe("text")(df)),
          Seq("doc_id", "resized_meta")))
      val results = cases.map { case (label, f, cols) =>
        val a = run(f, narrow, cols)
        val b = run(f, wideIn, cols)
        val plan = f(narrow).queryExecution.executedPlan.toString
        val widened = plan.contains("RoundRobinPartitioning")
        (label, a == b && widened)
      }
      println(s"[48] widen narrow-scan pipes ${results.map(r => s"${r._1}=${r._2}")
        .mkString(" ")} -> ${results.forall(_._2)}")
    }

    // 49. SQ8 plan shape: with the corpus under the code-row cap, the ADC
    // scan broadcasts the codes (BroadcastNestedLoopJoin, NO partitioned
    // CartesianProduct), and the min/max train aggregates with a partial
    // (map-side) combine ahead of the positional shuffle
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val qs = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.SQDenseEngine(emb,
        graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      val searchPlan = eng(qs).queryExecution.executedPlan.toString
      val broadcastScan = searchPlan.contains("BroadcastNestedLoopJoin") &&
        !searchPlan.contains("CartesianProduct")
      val statsPlan = eng.stats.queryExecution.executedPlan.toString
      val partialAgg = statsPlan.contains("partial_min") ||
        statsPlan.contains("HashAggregate")
      println(s"[49] sq8 broadcastScan=$broadcastScan partialTrainAgg=$partialAgg " +
        s"-> ${broadcastScan && partialAgg}")
    }

    // [50] r10 ops: RRF fusion / z-order layout / upsert merge
    {
      import graft.core.Pipe.qcol
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("idx"), col("text"),
          col("embedding").as("vector")).localCheckpoint()
      val qs = corpus.filter(col("idx") < 3)
        .select(col("idx").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("vector").as("query.vector"))
      val cfg = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val bm25 = graft.search.BM25Engine(corpus, cfg.copy(k = 10),
        corpusIdxCol = "idx", corpusTextCol = "text", roundScores = Some(4))
      val dense = graft.search.BruteForceDenseEngine(
        corpus.select(col("idx"), col("vector")), cfg.copy(k = 10))
      val fused = graft.search.RRFFusionPipe(Seq(bm25, dense), cfg)(qs)
      val frows = fused.select(col("qid"), qcol("index.idx")).orderBy("qid").collect()
      // self-doc on top (rank 1 in both engines), k honored
      val selfTop = frows.forall(r => r.getSeq[Long](1).head == r.getLong(0)) &&
        frows.forall(_.getSeq[Long](1).length == 5)
      println(s"[50] rrf selfTop=$selfTop rows=${frows.length} -> " +
        s"${selfTop && frows.length == 3}")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
      val z = graft.operators.ZOrder.layout(ord,
        Seq(col("o_custkey") % 256, col("o_orderkey") % 256), 8, 8)
      val zplan = z.queryExecution.executedPlan.toString
      val oneRange = "rangepartitioning".r.findAllIn(zplan.toLowerCase).size == 1
      println(s"[51] zorder layout single range exchange -> $oneRange")
      val base = ord.select("o_orderkey", "o_custkey", "o_totalprice")
      val changes = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      val merged = graft.operators.UpsertMerge(base, changes, Seq("o_orderkey"))
      val mplan = merged.queryExecution.executedPlan.toString
      val bcast = mplan.contains("BroadcastHashJoin") && mplan.contains("LeftAnti")
      val counts = (base.count(), merged.count())
      println(s"[52] upsert broadcastAnti=$bcast rowsPreserved=" +
        s"${counts._1 == counts._2} -> ${bcast && counts._1 == counts._2}")
    }

    // [53] maxsim re-rank: candidate join scored with nested HOFs, no UDF
    {
      import graft.core.Pipe.qcol
      def shl(c: org.apache.spark.sql.Column, p: Int) =
        concat(slice(c, lit(p + 1), size(c) - p), slice(c, lit(1), lit(p)))
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val corpus = emb.select(col("vec_id").cast("long").as("idx"),
        col("embedding").as("vector"))
      val mv = emb.select(col("vec_id").cast("long").as("idx"),
        array(col("embedding"), shl(col("embedding"), 1)).as("vectors"))
      val qs = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("long").as("qid"),
          col("embedding").as("query.vector"),
          array(col("embedding"), shl(col("embedding"), 1)).as("query.vectors"))
      val cfg = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val out = graft.search.IndexPipe(Seq(
        graft.search.BruteForceDenseEngine(corpus, cfg.copy(k = 10)),
        graft.search.MaxSimEngine(mv, cfg)))(qs)
      val rows = out.select(col("qid"), qcol("index.idx")).orderBy("qid").collect()
      val selfTop = rows.forall(r => r.getSeq[Long](1).head == r.getLong(0))
      val plan = out.queryExecution.executedPlan.toString
      val noUdf = !plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf")
      println(s"[53] maxsim selfTop=$selfTop noUdf=$noUdf -> ${selfTop && noUdf}")
    }

    // [54] r10 layout tooling: compaction writer + footer audit + zorder
    {
      val tmp = java.nio.file.Files.createTempDirectory("vs54").toString
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), (col("o_custkey") % 256).as("x"),
          (col("o_orderkey") % 256).as("y"))
      val n = graft.sources.Formats.writeCompacted(
        graft.operators.ZOrder.layout(ord, Seq(col("x"), col("y")), 8, 8),
        s"$tmp/z", 1L << 20)
      val st = graft.sources.ParquetStats.fileStats(spark, s"$tmp/z", Seq("x", "y"))
        .collect()
      val rowsOk = st.filter(_.getString(2) == "x").map(_.getLong(1)).sum ==
        ord.count()
      val filesOk = st.map(_.getString(0)).distinct.length == n
      println(s"[54] compact+audit files=$n rowsOk=$rowsOk filesOk=$filesOk " +
        s"-> ${rowsOk && filesOk}")
    }

    // [55] r11: streaming upsert replay idempotence + atomic pointer
    {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("vs55").toString
      val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      graft.streaming.StreamingUpsert.seed(base, s"$dir/t")
      val b0 = Seq((2L, 21.0, false), (3L, 30.0, false)).toDF("k", "v", "del")
      graft.streaming.StreamingUpsert.applyBatch(b0, 0, s"$dir/t", Seq("k"), Some("del"))
      val exp = graft.streaming.StreamingUpsert.latest(spark, s"$dir/t").get
        .orderBy("k").collect().toSeq
      // crash-between-flip-and-checkpoint replay: must be a clean no-op
      graft.streaming.StreamingUpsert.applyBatch(b0, 0, s"$dir/t", Seq("k"), Some("del"))
      val same = graft.streaming.StreamingUpsert.latest(spark, s"$dir/t").get
        .orderBy("k").collect().toSeq == exp
      val ptr = graft.streaming.StreamingUpsert.pointer(spark, s"$dir/t").contains("v0")
      val noTmp = !new java.io.File(s"$dir/t/._LATEST.tmp").exists()
      println(s"[55] upsert replay noop=$same ptrV0=$ptr noTmp=$noTmp -> ${same && ptr && noTmp}")
    }

    // [56] r11: null delete flag upserts instead of silently deleting
    {
      import spark.implicits._
      val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      val ch = Seq((2L, "B", Some(true)), (3L, "c", Option.empty[Boolean]))
        .toDF("k", "s", "del")
      val out = graft.operators.UpsertMerge(base, ch, Seq("k"), Some("del"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val ok = out == Seq((1L, "a"), (3L, "c"))
      println(s"[56] null delete flag -> upsert: $out -> $ok")
    }

    // [57] r11: fusion refuses a filling engine at construction
    {
      import spark.implicits._
      val corpus = Seq((0L, Seq(1.0f, 0.0f))).toDF("idx", "vector")
      val filling = graft.search.BruteForceDenseEngine(corpus,
        graft.search.SearchConfig(fillMaskedIndices = true, queryIdCol = Some("qid")))
      val refused = try { graft.search.RRFFusionPipe(Seq(filling)); false }
        catch { case e: IllegalArgumentException => e.getMessage.contains("fillMaskedIndices") }
      // a structurally non-filling re-ranker passes even with fill=true config
      val topkOk = try { graft.search.RRFFusionPipe(Seq(graft.search.TopkEngine())); true }
        catch { case _: Throwable => false }
      println(s"[57] fusion fill refusal refused=$refused topkOk=$topkOk -> ${refused && topkOk}")
    }

    // [58] r11: PQ engine state cache — second engine hits persisted state
    {
      val dir = java.nio.file.Files.createTempDirectory("vs58").toString
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").cast("long").as("idx"), col("embedding").as("vector"))
      val fp = "vs58-fixed-fp"
      def eng() = graft.search.PQDenseEngine(emb, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        stateDir = Some(dir), corpusFingerprint = fp)
      val qs = emb.filter(col("idx") < 3)
        .select(col("idx").as("qid"), col("vector").as("query.vector"))
      import graft.core.Pipe.qcol
      val r1 = eng()(qs).select(col("qid"), qcol("index.idx")).orderBy("qid")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      val caches = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && !f.getName.startsWith("_tmp"))
      // a hit never rewrites content, but CachedStage.apply TTL-touches
      // the entry DIR's mtime — so the hit proof is the contained files'
      // (path, mtime) set, not the dirs' mtimes
      def entryFiles() = caches.flatMap(_.listFiles())
        .map(f => f.getPath -> f.lastModified()).toSet
      val files = entryFiles()
      val r2 = eng()(qs).select(col("qid"), qcol("index.idx")).orderBy("qid")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
      val hit = entryFiles() == files
      println(s"[58] pq state cache stages=${caches.length} hit=$hit equal=${r1 == r2} -> ${caches.nonEmpty && hit && r1 == r2}")
    }

    // [59] r11: DatasetFingerprint distinguishes scan paths (cache-key fix)
    {
      val a = graft.pipes.DatasetFingerprint.of(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      val b = graft.pipes.DatasetFingerprint.of(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
      val a2 = graft.pipes.DatasetFingerprint.of(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      println(s"[59] dataset fp pathSensitive=${a != b} stable=${a == a2} -> ${a != b && a == a2}")
    }

    // [60] r11: incremental dedup — band equi-joins only, no cartesian
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      val toks = split(col("text"), " ")
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
            .as("text"))
      val out = graft.llm.IncrementalMinHashDedupPipe("text", "doc_id",
        docs, "text", "doc_id", jaccardThreshold = 0.5)(batch)
      val plan = out.queryExecution.executedPlan.toString
      val noCartesian = !plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin")
      val srcs = out.select("pair_src").distinct().collect()
        .map(_.getString(0)).toSet
      println(s"[60] incremental dedup noCartesian=$noCartesian " +
        s"srcs=$srcs -> ${noCartesian && srcs.contains("cross")}")
    }

    // [61] r11: fold_accents SQL registration over real fixtures
    {
      org.apache.spark.sql.graft.GraftExtensions.register(spark)
      spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("vs61")
      val n = spark.sql(
        "SELECT count(*) FROM vs61 WHERE fold_accents(text || ' café') LIKE '% cafe'")
        .head().getLong(0)
      val total = spark.table("vs61").count()
      println(s"[61] fold_accents sql n=$n total=$total -> ${n == total}")
    }

    // [62] r11: lineage manifest over a real composed pipeline
    {
      val pipe = graft.pipes.SequentialPipe(Seq(
        graft.llm.TextNormalizePipe("text"),
        graft.llm.ExactDedupPipe(Seq("text_norm"), "doc_id"),
        graft.llm.TokenCountPipe("text")))
      val json = graft.core.Manifest.json(pipe)
      val outline = graft.core.Manifest.outline(pipe)
      val det = json == graft.core.Manifest.json(pipe)
      val rootFp = json.contains(pipe.fingerprint)
      val lines = outline.linesIterator.size == 4
      // and the pipeline itself still runs on real data after introspection
      val rows = pipe(spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")).count()
      println(s"[62] manifest det=$det rootFp=$rootFp lines4=$lines rows=$rows " +
        s"-> ${det && rootFp && lines && rows > 0}")
    }

    // [63] r11: time-travel reads over the versioned CDC table
    {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("vs63").toString
      val base = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("v"))
      graft.streaming.StreamingUpsert.seed(base, s"$dir/t")
      val ch = base.filter(col("k") % 97 === 0)
        .select(col("k"), (col("v") + 1.0).as("v"), lit(false).as("del"))
      graft.streaming.StreamingUpsert.applyBatch(ch, 0, s"$dir/t", Seq("k"), Some("del"))
      val names = graft.streaming.StreamingUpsert.versions(spark, s"$dir/t")
      val v0 = graft.streaming.StreamingUpsert.read(spark, s"$dir/t", "vinit").count()
      val v1 = graft.streaming.StreamingUpsert.read(spark, s"$dir/t", "v0").count()
      val stable = v0 == base.count() && v1 == v0
      println(s"[63] time travel names=$names counts=$v0/$v1 -> " +
        s"${names == Seq("vinit", "v0") && stable}")
    }

    // [64] r12: SQL front ends of shared kernels — html_extract /
    // graft_langid / graft_fingerprint equal their pipe twins byte-for-
    // byte on real docs, and the projection stays codegen'd (map-only)
    {
      org.apache.spark.sql.graft.GraftExtensions.register(spark)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      docs.createOrReplaceTempView("vs64_docs")
      val viaSql = spark.sql(
        """SELECT doc_id, graft_langid(text) AS l, graft_fingerprint(text) AS f,
          |  html_extract('<p>' || text || '</p><!--x-->') AS h
          |FROM vs64_docs""".stripMargin)
      val viaCol = docs.select(col("doc_id"),
        graft.llm.TextAnalysisOps.languageId(col("text")).as("l"),
        graft.llm.TextAnalysisOps.fingerprint(col("text")).as("f"),
        graft.llm.TextExtractOps.htmlExtract(
          concat(lit("<p>"), col("text"), lit("</p><!--x-->"))).as("h"))
      val n = docs.count()
      val eq = viaSql.join(viaCol, Seq("doc_id", "l", "f", "h")).count()
      val noShuffle = !viaSql.queryExecution.executedPlan.toString
        .contains("Exchange")
      // langid/fingerprint are HOF kernels (interpreted, like their
      // pipes); the pure-string html_extract chain must stay inside a
      // WholeStageCodegen span when projected alone
      val htmlPlan = spark.sql(
        "SELECT doc_id, html_extract(text) AS h FROM vs64_docs")
        .queryExecution.executedPlan.toString
      val codegen = htmlPlan.linesIterator.exists(l => l.trim.startsWith("*("))
      println(s"[64] sql kernel twins eq=$eq/$n htmlCodegen=$codegen " +
        s"mapOnly=$noShuffle -> ${eq == n && codegen && noShuffle}")
    }

    // [65] r12: bloom decontamination — one-sided vs the exact semi-join
    // pipe on real docs (equal at m=2^20; superset under a saturated m)
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      val eval = docs.filter(col("doc_id") < 30)
      val exact = graft.llm.DecontaminatePipe(eval, "text", "doc_id",
        ngramSize = 4)(docs).filter(col("contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bloom = graft.llm.BloomDecontaminatePipe(eval, "text", "doc_id",
        ngramSize = 4)(docs).filter(col("contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val sat = graft.llm.BloomDecontaminatePipe(eval, "text", "doc_id",
        ngramSize = 4, mBits = 256, numHashes = 2)(docs)
        .filter(col("contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(s"[65] bloom decontam exact=${exact.size} bloom=${bloom.size} " +
        s"sat=${sat.size} -> ${bloom == exact && exact.subsetOf(sat) &&
          sat.size > exact.size}")
    }

    // [66] r13: WeightedSamplePipe quadratic-mixer draw — w<=0 rows are
    // excluded (short result, not padded), the plan stays
    // TakeOrderedAndProject, and the draw is layout-independent
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      // only 5 positive-weight rows but k=20: result must be exactly 5
      val scarce = docs.withColumn("w",
        when(col("doc_id") < 5, col("n_chars")).otherwise(lit(0L)))
      val short = graft.llm.WeightedSamplePipe("doc_id", "w", 20)(scarce)
      val nShort = short.count()
      val sampled = graft.llm.WeightedSamplePipe("doc_id", "n_chars", 50)(docs)
      val plan = sampled.queryExecution.executedPlan.toString
      val takeOrdered = plan.contains("TakeOrderedAndProject")
      val a = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
      val b = graft.llm.WeightedSamplePipe("doc_id", "n_chars", 50)(
        docs.repartition(13)).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      println(s"[66] weighted sample short=$nShort takeOrdered=$takeOrdered " +
        s"layoutEq=${a == b} -> ${nShort == 5 && takeOrdered && a == b}")
    }

    // [67] r13: CDC version diff + additive schema evolution on a real
    // seeded table — classification counts consistent with the merge,
    // evolved column null-filled on untouched rows
    {
      val dir = java.nio.file.Files.createTempDirectory("vs67").toString
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang", "n_chars")
      graft.streaming.StreamingUpsert.seed(docs, s"$dir/t")
      val changes = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + 1).as("n_chars"),
          lit(0.5).as("quality"), (col("doc_id") % 10 === 5).as("del"))
      graft.streaming.StreamingUpsert.applyBatch(changes, 0L, s"$dir/t",
        Seq("doc_id"), Some("del"), allowNewColumns = true)
      val d = graft.streaming.StreamingUpsert.diff(spark, s"$dir/t",
        "vinit", "v0", Seq("doc_id"))
      val byType = d.groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val latest = graft.streaming.StreamingUpsert.latest(spark, s"$dir/t").get
      val untouchedNull = latest.filter(col("doc_id") % 5 =!= 0)
        .filter(col("quality").isNotNull).count() == 0
      val touchedSet = latest.filter(col("quality").isNotNull).count() ==
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 =!= 5).count()
      // every %5 key changed (n_chars+1 or deleted): updates + deletes
      val expUpd = docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 =!= 5).count()
      val expDel = docs.filter(col("doc_id") % 10 === 5).count()
      println(s"[67] cdc diff+evolve byType=$byType nullFill=$untouchedNull " +
        s"-> ${byType.getOrElse("update", 0L) == expUpd &&
          byType.getOrElse("delete", 0L) == expDel &&
          byType.getOrElse("insert", 0L) == 0L && untouchedNull && touchedSet}")
    }

    // [68] r13: CMS heavy hitters drive — tiny width, result equals the
    // exact GROUP BY HAVING; estimate plan is broadcast-only
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val exact = docs.select(explode(graft.llm.CurationOps.wordNgrams(
          graft.llm.TextAnalysisOps.toks(col("text")), 2)).as("gram"))
        .groupBy("gram").count().filter(col("count") >= 8).count()
      val hh = graft.llm.HeavyHitterPipe("text", 2, 8L, depth = 3,
        width = 128)(docs)
      val got = hh.count()
      val plan = hh.queryExecution.executedPlan.toString
      val bcast = plan.contains("BroadcastHashJoin")
      println(s"[68] cms heavy hitters exact=$exact got=$got bcast=$bcast " +
        s"-> ${got == exact && exact > 0 && bcast}")
    }

    // [70] r13: crawl preset = ONE fused scan (filters in DataFilters,
    // 2-col ReadSchema, no data shuffle) and its streaming twin matches
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("text", regexp_replace(col("text"), " (fast|data) ", ".\n"))
      val pipe = graft.pipes.SequentialPipe(Seq(
        graft.llm.IntraDocLineDedupPipe("text"),
        graft.llm.C4CleanPipe("text"),
        graft.pipes.LambdaPipe(_.filter(col("c4_keep")), "c4_floor"),
        graft.llm.GopherQualityPipe("text")))
      val out = pipe(docs).select("doc_id", "text", "n_sentences")
      val plan = out.queryExecution.executedPlan.toString
      val fused = !plan.contains("hashpartitioning") &&
        plan.contains("DataFilters")
      println(s"[70] crawl preset fused scan rows=${out.count()} -> $fused")
    }

    // [71] r13: incremental residual IVF-PQ == pinned union build
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val qs = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val cfg = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val cents = graft.search.IVFDenseEngine.formulaCentroids(4, 64)
      val books = graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)
      val full = graft.search.IVFPQDenseEngine(emb, nlist = 4, nprobe = 2,
        m = 8, codebookSize = 16, config = cfg, residual = true,
        fixedCentroids = Some(cents), fixedCodebooks = Some(books))
      val inc = graft.search.IVFPQDenseEngine(
        emb.filter(col("idx") % 2 === 0), nlist = 4, nprobe = 2,
        m = 8, codebookSize = 16, config = cfg, residual = true,
        fixedCentroids = Some(cents), fixedCodebooks = Some(books))
        .addVectors(emb.filter(col("idx") % 2 =!= 0))
      val eq = inc(qs).orderBy("qid").collect()
        .sameElements(full(qs).orderBy("qid").collect())
      println(s"[71] ivfpq incremental == union build -> $eq")
    }

    // [72] r13: BoundLevenshteinRule bounds the predicate AND the
    // guarded projection; values equal the unbounded column form
    {
      org.apache.spark.sql.graft.GraftExtensions.register(spark)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"),
          regexp_replace(col("text"), " \\S+ \\S+$", "").as("mtext"))
      docs.createOrReplaceTempView("vs_lev")
      val df = spark.sql("SELECT doc_id, levenshtein(text, mtext) AS d " +
        "FROM vs_lev WHERE levenshtein(text, mtext) <= 12")
      var bounded = 0; var unbounded = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case l: org.apache.spark.sql.catalyst.expressions.Levenshtein =>
          if (l.threshold.isDefined) bounded += 1 else unbounded += 1
        case _ =>
      }))
      val ref = docs.withColumn("d", levenshtein(col("text"), col("mtext")))
        .filter(col("d") <= 12).select("doc_id", "d")
      val eq = df.except(ref).count() == 0 && ref.except(df).count() == 0
      println(s"[72] lev rule bounded=$bounded unbounded=$unbounded " +
        s"valuesEq=$eq -> ${bounded == 2 && unbounded == 0 && eq}")
    }

    // [73] r14: a `= -1` bounded predicate (distance > k rows) must NOT
    // propagate a bound into the projection — the true distance, never
    // the -1 sentinel, is reported
    {
      org.apache.spark.sql.graft.GraftExtensions.register(spark)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"),
          regexp_replace(col("text"), " \\S+ \\S+$", "").as("mtext"))
      docs.createOrReplaceTempView("vs_lev_neg")
      val df = spark.sql("SELECT doc_id, levenshtein(text, mtext) AS d " +
        "FROM vs_lev_neg WHERE levenshtein(text, mtext, 5) = -1")
      var unbounded = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case l: org.apache.spark.sql.catalyst.expressions.Levenshtein =>
          if (l.threshold.isEmpty) unbounded += 1
        case _ =>
      }))
      val ref = docs.withColumn("d", levenshtein(col("text"), col("mtext")))
        .filter(col("d") > 5).select("doc_id", "d")
      val eq = df.except(ref).count() == 0 && ref.except(df).count() == 0
      val noSentinel = df.filter(col("d") === -1).count() == 0
      println(s"[73] lev = -1 guard unbounded=$unbounded valuesEq=$eq " +
        s"noSentinel=$noSentinel -> ${unbounded == 1 && eq && noSentinel}")
    }

    // [74] r14: StreamingWeightedSample crash-window recovery — a
    // complete _staging with no _CURRENT is renamed into place by
    // latest(), reservoir unchanged
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("vs-sws").toString
      graft.streaming.StreamingWeightedSample.seed(
        docs, s"$dir/t", "n_chars", "doc_id")
      graft.streaming.StreamingWeightedSample.applyBatch(
        docs, s"$dir/t", "doc_id", "n_chars", 25, Nil, 17L)
      val before = graft.streaming.StreamingWeightedSample
        .latest(spark, s"$dir/t").get
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(s"$dir/t/_CURRENT"),
        new org.apache.hadoop.fs.Path(s"$dir/t/_staging"))
      val after = graft.streaming.StreamingWeightedSample
        .latest(spark, s"$dir/t").get
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val healed = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/t/_CURRENT"))
      println(s"[74] weighted-sample staging recovery eq=${before == after} " +
        s"healed=$healed -> ${before == after && healed}")
    }

    // [69] r13: graft_gopher_keep SQL front end == pipe flag, map-only plan
    {
      org.apache.spark.sql.graft.GraftExtensions.register(spark)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      docs.createOrReplaceTempView("vs_gq_docs")
      val viaSql = spark.sql(
        "SELECT doc_id, graft_gopher_keep(text) AS k FROM vs_gq_docs")
      val viaPipe = graft.llm.GopherQualityPipe("text")(docs)
        .select(col("doc_id"), col("gopher_keep").as("k"))
      val eq = viaSql.except(viaPipe).count() == 0 &&
        viaPipe.except(viaSql).count() == 0
      val plan = viaSql.queryExecution.executedPlan.toString
      val mapOnly = !plan.contains("Exchange")
      val kept = viaSql.filter(col("k")).count()
      println(s"[69] gopher_keep sql==pipe eq=$eq mapOnly=$mapOnly " +
        s"kept=$kept -> ${eq && mapOnly}")
    }

    // [75] r15: WriterLock refuses a lease whose pid matches but whose
    // applicationId differs (HDFS pid-collision scenario), and still
    // reclaims a same-pid same-app stopped lease
    {
      val dir = java.nio.file.Files.createTempDirectory("vs_wl").toString
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val lp = new org.apache.hadoop.fs.Path(s"$dir/_WRITER_LOCK")
      val pid = ProcessHandle.current().pid()
      val foreign = s"""{"token":"x","pid":$pid,"app":"application_foreign_1",""" +
        s""""label":"other-host","ts":0}"""
      val out = fs.create(lp, false)
      out.write(foreign.getBytes("UTF-8")); out.close()
      val refused = try {
        graft.streaming.WriterLock.acquire(spark, dir, "vs"); false
      } catch { case _: IllegalStateException => true }
      // now rewrite as OUR pid + OUR app (a stopped same-process lease):
      // acquire must reclaim
      fs.delete(lp, false)
      val ours = s"""{"token":"y","pid":$pid,""" +
        s""""app":"${spark.sparkContext.applicationId}","label":"me","ts":0}"""
      val out2 = fs.create(lp, false)
      out2.write(ours.getBytes("UTF-8")); out2.close()
      val tok = graft.streaming.WriterLock.acquire(spark, dir, "vs2")
      graft.streaming.WriterLock.release(spark, dir, tok)
      println(s"[75] writer-lock foreign-app refused=$refused reclaimed=" +
        s"${tok.nonEmpty} -> ${refused && tok.nonEmpty}")
    }

    // [76] r15: DatasetFingerprint folds applicationId for RDD-backed
    // leaves — two same-schema RDD frames differ, and each embeds the
    // session's applicationId in its keyed identity (checked indirectly:
    // fingerprints are stable within the session but distinct across rdds)
    {
      import spark.implicits._
      val a = spark.sparkContext.parallelize(Seq(1, 2, 3)).toDF("v")
      val b = spark.sparkContext.parallelize(Seq(1, 2, 3)).toDF("v")
      val fa = graft.pipes.DatasetFingerprint.of(a)
      val fb = graft.pipes.DatasetFingerprint.of(b)
      val stable = fa == graft.pipes.DatasetFingerprint.of(a)
      println(s"[76] rdd fingerprints distinct=${fa != fb} stable=$stable " +
        s"-> ${fa != fb && stable}")
    }

    // [77] r16: wide-PCM decode routes through the converter — a 24-bit
    // little-endian WAV decodes to its TOP 16 bits (±1 JDK rounding), not
    // the low-16 noise the old passthrough produced; 16-bit path unchanged
    {
      import spark.implicits._
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      def wav(bits: Int, nf: Int, sample: Int => Int): Array[Byte] = {
        val bps = bits / 8
        val data = new Array[Byte](nf * bps)
        for (i <- 0 until nf; b <- 0 until bps)
          data(i * bps + b) = ((sample(i) >> (8 * b)) & 0xFF).toByte
        val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, bits, 1, bps, 8000f, false)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, nf.toLong),
          AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      def s24(i: Int): Int = i * 1000000 - 4000000
      def s16(i: Int): Int = i * 1000 - 5000
      val df = Seq((1L, wav(24, 10, s24)), (2L, wav(16, 10, s16)))
        .toDF("doc_id", "media")
      val rows = graft.llm.DecodeAudioPipe("media")(df)
        .select("doc_id", "audio").orderBy("doc_id").collect()
      val g24 = rows(0).getStruct(1).getSeq[Int](3)
      val g16 = rows(1).getStruct(1).getSeq[Int](3)
      val top16 = (0 until 10).forall(i => math.abs(g24(i) - (s24(i) >> 8)) <= 1)
      val exact16 = (0 until 10).forall(i => g16(i) == s16(i))
      println(s"[77] wide-pcm decode top16=$top16 exact16=$exact16 " +
        s"-> ${top16 && exact16}")
    }

    // [78] r16: weight-file import — formula weights round-tripped through
    // a real safetensors file produce BIT-IDENTICAL batched inference to
    // the in-code model on the sf0.001 embeddings, and the loaded model's
    // fingerprint is the file digest (distinct from the structural hash)
    {
      import graft.predict.{BatchedPredictPipe, MlpModel, WeightIO}
      val m0 = MlpModel.formula(64, 32, 16)
      val p = "/tmp/graft-fixtures/vscratch_mlp.safetensors"
      WeightIO.writeSafeTensors(p, Seq(
        "w1" -> WeightIO.Tensor(Seq(64, 32), m0.w1.flatten.toArray),
        "b1" -> WeightIO.Tensor(Seq(32), m0.b1.toArray),
        "w2" -> WeightIO.Tensor(Seq(32, 16), m0.w2.flatten.toArray),
        "b2" -> WeightIO.Tensor(Seq(16), m0.b2.toArray)))
      val mf = MlpModel.fromSafeTensors(p)
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("vec_id", "embedding")
      def run(m: MlpModel) =
        BatchedPredictPipe(m, "embedding", "vector", "vec_id", blockSize = 128)(emb)
          .select("vec_id", "vector").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val a = run(mf); val b = run(m0)
      val eq = a.keySet == b.keySet && a.forall { case (k, v) => v == b(k) }
      val fpOk = mf.fingerprint != m0.fingerprint &&
        mf.sourceDigest.exists(_.length == 64)
      println(s"[78] weight-file import bitEq=$eq rows=${a.size} " +
        s"digestFp=$fpOk -> ${eq && fpOk && a.nonEmpty}")
    }

    // [79] r16: SrpLayout auto-sizing — the sf0.001 embeddings corpus
    // (2k vectors) sizes to a valid layout whose occupancy meets the
    // target, the sized pipe runs end-to-end on the real parquet and
    // equals the pinned-default pipe at this scale, and 200k sizes to
    // the wide 120/6 layout the r14 audit hand-fixed
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      // plant exact copies (hamming 0, cosine 1 at ANY layout width) of
      // the first 10 vectors at id+100000
      val planted = emb.unionByName(emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val n = planted.count()
      val l = graft.llm.SrpLayout.forCorpus(n)
      val occOk = n.toDouble / math.pow(2, l.bitsPerBand) <= 1.0 ||
        l.bitsPerBand == 60
      val auto = graft.llm.SRPCosineDedupPipe.sized(
        "embedding", "vec_id", n)(planted)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plantsFound = (0 until 10).forall(i =>
        auto.contains((i.toLong, i + 100000L)))
      val wide = graft.llm.SrpLayout.forCorpus(200000L)
      println(s"[79] srp auto-layout n=$n r=${l.bitsPerBand} occOk=$occOk " +
        s"plants=$plantsFound wide200k=${wide.nBits}/${wide.bands} " +
        s"-> ${occOk && plantsFound && wide == graft.llm.SrpLayout.Layout(120, 6, 5)}")
    }

    // [80] r16: BF16 checkpoint path end-to-end — a hand-built BF16
    // safetensors file (formula weights truncated to bf16 = top 16 float
    // bits) loads and runs BatchedPredictPipe on the real sf0.001
    // embeddings BIT-IDENTICALLY to an in-code model carrying the same
    // truncated weights (the widening chain bf16 -> f32 -> f64 is exact)
    {
      import graft.predict.{BatchedPredictPipe, MlpModel}
      def bf16(d: Double): Double = java.lang.Float.intBitsToFloat(
        (java.lang.Float.floatToRawIntBits(d.toFloat) >>> 16) << 16).toDouble
      val m0 = graft.predict.MlpModel.formula(64, 32, 16)
      // perturb the formula weights so bf16 truncation actually bites
      // (formula values are exactly representable at any width)
      def jig(m: Seq[Seq[Double]]) = m.map(_.map(v => v + 1.0 / 3.0))
      val w1 = jig(m0.w1); val w2 = jig(m0.w2)
      val truncated = MlpModel(
        w1.map(_.map(bf16)), m0.b1.map(bf16), w2.map(_.map(bf16)),
        m0.b2.map(bf16))
      val p = "/tmp/graft-fixtures/vscratch_bf16.safetensors"
      // hand-write the BF16 buffer (writer emits F32/F64 only)
      val flat = Seq("w1" -> (Seq(64, 32), w1.flatten),
        "b1" -> (Seq(32), m0.b1), "w2" -> (Seq(32, 16), w2.flatten),
        "b2" -> (Seq(16), m0.b2))
      val header = flat.foldLeft((Seq.empty[String], 0L)) {
        case ((hs, off), (nm, (shape, vs))) =>
          val end = off + vs.size * 2
          (hs :+ s""""$nm":{"dtype":"BF16","shape":[${shape.mkString(",")}],"data_offsets":[$off,$end]}""",
            end)
      }
      val hj = ("{" + header._1.mkString(",") + "}").getBytes("UTF-8")
      val pad = (8 - hj.length % 8) % 8
      val buf = java.nio.ByteBuffer
        .allocate(8 + hj.length + pad + header._2.toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong((hj.length + pad).toLong).put(hj)
        .put(Array.fill(pad)(' '.toByte))
      flat.foreach { case (_, (_, vs)) => vs.foreach(v => buf.putShort(
        (java.lang.Float.floatToRawIntBits(v.toFloat) >>> 16).toShort)) }
      java.nio.file.Files.write(java.nio.file.Paths.get(p), buf.array())
      val mf = MlpModel.fromSafeTensors(p)
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("vec_id", "embedding")
      def run(m: MlpModel) =
        BatchedPredictPipe(m, "embedding", "vector", "vec_id", blockSize = 64)(emb)
          .select("vec_id", "vector").collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val a = run(mf); val b = run(truncated)
      val eq = a.keySet == b.keySet && a.forall { case (k, v) => v == b(k) }
      val bites = mf.w1 != w1 // truncation must have changed something
      println(s"[80] bf16 checkpoint bitEq=$eq rows=${a.size} " +
        s"truncationBites=$bites -> ${eq && bites && a.nonEmpty}")
    }

    // [81] r17: filtered ANN — the member predicate must (a) restrict the
    // result set exactly, (b) survive into the PHYSICAL plan as a data
    // filter on the tagged-state scan (PushedFilters on the carried
    // payload column once the state is persisted parquet), composing with
    // the probe pruning rather than post-filtering the top-k.
    {
      import graft.search._
      val dir = java.nio.file.Files
        .createTempDirectory("vs-ivf-filter").toString
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"),
          col("label"))
      val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val qs = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 6)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = IVFDenseEngine(emb, nlist = 4, nprobe = 2, cfg,
        fixedCentroids = Some(IVFDenseEngine.formulaCentroids(4, 64)),
        stateDir = Some(dir), corpusFingerprint = "vs81",
        carryCols = Seq("label"),
        memberFilter = Some(col("label") % 3 === 1))
      val out = eng(qs)
      val plan = out.queryExecution.executedPlan.toString
      // the tagged state is parquet on disk after the first run — re-plan
      // and check the predicate reached that scan
      out.collect()
      val plan2 = eng(qs).queryExecution.executedPlan.toString
      val pushed = plan2.contains("PushedFilters") &&
        plan2.matches("(?s).*PushedFilters: \\[[^\\]]*label[^\\]]*\\].*")
      val lbl = emb.select(col("idx").cast("long"), col("label"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val idxs = out.select(explode(col("`index.idx`")).as("i"))
        .select(col("i").cast("long")).collect().map(_.getLong(0))
      val allMatch = idxs.nonEmpty && idxs.forall(i => lbl(i) % 3 == 1)
      println(s"[81] filtered ivf predMatch=$allMatch pushedToStateScan=$pushed " +
        s"results=${idxs.length} -> ${allMatch && pushed}")
      if (!pushed) println(plan.linesIterator.take(40).mkString("\n"))
    }

    // [82] r17: index DELETION — removeVectors/removeDocuments must (a)
    // search exactly like a pinned build over the survivors, (b) fuse the
    // delete predicate into the persisted tagged-state scan (a NOT filter
    // as PushedFilters — the zero-shuffle deletion claim), (c) BM25: stop
    // returning removed docs AND shift df/n/avgdl to the survivors'.
    {
      import graft.search._
      val dir = java.nio.file.Files
        .createTempDirectory("vs-ivf-remove").toString
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val qs = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 6)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val base = IVFDenseEngine(emb, nlist = 4, nprobe = 2, cfg,
        fixedCentroids = Some(IVFDenseEngine.formulaCentroids(4, 64)),
        stateDir = Some(dir), corpusFingerprint = "vs82")
      base.tagged.count() // warm the persisted state
      val rm = base.removeVectors(col("idx") % 4 === 1, fingerprint = "vs82rm")
      val out = rm(qs)
      val survivors = IVFDenseEngine(emb.filter(col("idx") % 4 =!= 1),
        nlist = 4, nprobe = 2, cfg,
        fixedCentroids = Some(IVFDenseEngine.formulaCentroids(4, 64)))
      val eq = out.orderBy("qid").collect()
        .sameElements(survivors(qs).orderBy("qid").collect())
      val plan = out.queryExecution.executedPlan.toString
      // the delete predicate must reach the persisted tagged parquet scan
      val pushed = plan.matches(
        "(?s).*PushedFilters: \\[[^\\]]*(Not|NOT)[^\\]]*\\].*")
      val idxs = out.select(explode(col("`index.idx`")).as("i"))
        .select(col("i").cast("long")).collect().map(_.getLong(0))
      val noneRemoved = idxs.nonEmpty && idxs.forall(i => i % 4 != 1)
      // BM25 side: removed doc ids unreachable, stats shifted exactly
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val bcfg = SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val beng = BM25Engine(docs, bcfg, corpusIdxCol = "doc_id",
        corpusTextCol = "text", roundScores = Some(4))
        .removeDocuments(col("docId") % 4 === 1)
      val brebuild = BM25Engine(docs.filter(col("doc_id") % 4 =!= 1), bcfg,
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        roundScores = Some(4))
      val bqs = docs.filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ")
            .as("query.text"))
      val bEq = beng(bqs).orderBy("qid").collect()
        .sameElements(brebuild(bqs).orderBy("qid").collect())
      val statsEq = beng.stats.n == brebuild.stats.n &&
        beng.stats.avgdl == brebuild.stats.avgdl
      println(s"[82] index deletion ivfEq=$eq pushedNot=$pushed " +
        s"noneRemoved=$noneRemoved bm25Eq=$bEq statsEq=$statsEq -> " +
        s"${eq && pushed && noneRemoved && bEq && statsEq}")
      if (!pushed) println(plan.linesIterator.take(40).mkString("\n"))
    }

    // [83] r17: deletion family completion — SQ8, LSH, and Jaccard
    // removeVectors/removeDocuments each ≡ a build over the survivors at
    // the package surface (stats/hyperplanes/shingles pinned or
    // corpus-free, so the filter IS the delete).
    {
      import graft.search._
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val qs = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") < 6)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      def out(e: SearchEngine) = e(qs)
        .select(col("qid"), col("`index.idx`"),
          transform(col("`index.score`"), v => round(v, 6)).as("s"))
        .orderBy("qid").collect().map(_.toString).toSeq
      val sqFull = SQDenseEngine(emb, cfg)
      val row = sqFull.stats.head()
      val sqEq = out(sqFull.removeVectors(col("idx") % 4 === 1)) ==
        out(SQDenseEngine(emb.filter(col("idx") % 4 =!= 1), cfg,
          fixedStats = Some((row.getSeq[Double](0), row.getSeq[Double](1)))))
      val lshEq = out(LSHDenseEngine(emb, config = cfg)
          .removeVectors(col("idx") % 4 === 1)) ==
        out(LSHDenseEngine(emb.filter(col("idx") % 4 =!= 1), config = cfg))
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val jqs = docs.filter(col("doc_id") < 6)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 8), " ")
            .as("query.text"))
      def jout(e: SearchEngine) = e(jqs)
        .select(col("qid"), col("`index.idx`"), col("`index.score`"))
        .orderBy("qid").collect().map(_.toString).toSeq
      def jeng(c: org.apache.spark.sql.DataFrame) = JaccardEngine(c, cfg,
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        roundScores = Some(6))
      val jacEq = jout(jeng(docs).removeDocuments(col("docId") % 4 === 1)) ==
        jout(jeng(docs.filter(col("doc_id") % 4 =!= 1)))
      println(s"[83] deletion family sqEq=$sqEq lshEq=$lshEq jacEq=$jacEq " +
        s"-> ${sqEq && lshEq && jacEq}")
    }

    spark.stop()
  }
}
