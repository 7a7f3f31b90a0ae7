package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of the reference surface: repetition-based quality signals,
  * eval-set decontamination, PII redaction, and deterministic stratified
  * sampling. All are shuffle-minimal by construction — the per-document
  * stats are pure codegen'd Column expressions (no shuffle at all), and
  * the two relational ops shuffle once on their natural key.
  */
object CurationOps {

  /** Word n-grams as space-joined strings; empty array when the doc has
    * fewer than `n` tokens (guarded — `sequence(0, k)` with k < 0 would
    * produce a DESCENDING range, not an empty one).
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    // one-pass codegen kernel for the >= n branch (the former
    // transform/slice/concat_ws chain ran interpreted and allocated a
    // sliced array per window — twice per corpus pass on every n-gram
    // path); the n < n-gram-size and null-array branches stay relational
    // here, exactly like the shingle kernel (parity: MinhashExprsSpec)
    when(size(tokens) >= n,
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.graft.WordNgramsExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n, " ")))
      .otherwise(array().cast("array<string>"))

  /** Membership count of `grams` (array<string>) against a fixed key
    * set BROADCAST once per executor and hash-probed per element —
    * [[org.apache.spark.sql.graft.StringSetCountExpr]]. The exact,
    * O(#docGrams)-per-row form of `size(array_intersect(grams,
    * lit(keys)))` / `arrays_overlap(grams, lit(keys))`, whose per-row
    * cost is linear in |keys| (the intersect builds a |keys|-entry hash
    * set per row, and both duplicate the literal per task).
    */
  def setCount(
      spark: org.apache.spark.sql.SparkSession,
      grams: Column, keys: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.StringSetCountExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(grams),
        spark.sparkContext.broadcast(keys.toArray),
        org.apache.spark.sql.graft.StringSetCountExpr.fingerprint(keys)))

  /** Duplicate statistics of a SORTED array in ONE `aggregate` pass:
    * returns struct(top, dup) where `top` is the longest run of equal
    * adjacent elements and `dup` the total length of runs longer than 1.
    *
    * Deliberately a single linear scan referencing `sorted` exactly once:
    * an index-based run-length formulation (`get(sorted, i)` inside a
    * lambda) re-evaluates the whole producing expression per element once
    * CollapseProject inlines it — measured as a >200 s hang at sf0.01 vs
    * seconds for this shape (see SURVEY §6 HOF-inline note).
    */
  def runStats(sorted: Column): Column = {
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0).as("run"), lit(0).as("top"), lit(0).as("dup"))
    def closedTop(a: Column) = greatest(a.getField("top"), a.getField("run"))
    def closedDup(a: Column) = a.getField("dup") +
      when(a.getField("run") > 1, a.getField("run")).otherwise(0)
    aggregate(sorted, zero,
      (a, x) => {
        val same = x <=> a.getField("prev")
        struct(x.as("prev"),
          when(same, a.getField("run") + 1).otherwise(lit(1)).as("run"),
          when(same, a.getField("top")).otherwise(closedTop(a)).as("top"),
          when(same, a.getField("dup")).otherwise(closedDup(a)).as("dup"))
      },
      a => struct(closedTop(a).as("top"), closedDup(a).as("dup")))
  }
}

/** Gopher-style repetition signals for quality filtering: the fraction of
  * repeated tokens, and the share of bigram occurrences held by the most
  * frequent bigram / by any duplicated bigram. Entirely per-row Column
  * expressions (sorted-array run lengths instead of an explode+groupBy) —
  * zero shuffle, so at 100 TB it is a map-only pass that scales linearly
  * with input splits.
  *
  * Signals follow the repetition-removal family of Rae et al. (Gopher,
  * arXiv:2112.11446 §A1.1); thresholds are the caller's policy.
  */
case class RepetitionStatsPipe(textCol: String) extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // Stage each expensive array as a (multiply-referenced) output column
    // so CollapseProject cannot inline it into a per-element lambda.
    // Widened: the run-scan HOFs are interpreted and the input may plan
    // a single scan task (one-row-group parquet).
    val staged = Pipe.widen(df)
      .withColumn("__rs_toks__", TextAnalysisOps.toks(qcol(textCol)))
      .withColumn("__rs_bg__",
        array_sort(CurationOps.wordNgrams(col("__rs_toks__"), 2)))
      .withColumn("__rs_run__", CurationOps.runStats(col("__rs_bg__")))
    val nt = size(col("__rs_toks__")).cast("double")
    val nbg = size(col("__rs_bg__")).cast("double")
    val top = col("__rs_run__").getField("top").cast("double")
    val dup = col("__rs_run__").getField("dup").cast("double")
    val dupTok = lit(1d) - size(array_distinct(col("__rs_toks__"))).cast("double") / nt
    val outs: Seq[(String, Column)] = Seq(
      "dup_token_frac" -> round(dupTok, 4),
      "top_bigram_frac" -> round(when(nbg > 0, top / nbg).otherwise(0d), 4),
      "dup_bigram_frac" -> round(when(nbg > 0, dup / nbg).otherwise(0d), 4))
    finish(staged, outs).drop("__rs_toks__", "__rs_bg__", "__rs_run__")
  }
}

/** Eval-set decontamination: flag (or drop) training documents that share
  * any word `n`-gram with a benchmark/eval corpus — the standard guard
  * against test-set leakage into training data.
  *
  * Shape at scale: the eval side is DISTINCT n-grams of a benchmark suite
  * (thousands of docs, ~millions of n-grams) and is broadcast, so the
  * train side is a map-only semi-join probe — no shuffle of the 100 TB
  * side. Set `broadcastEval = false` for an oversized eval corpus to fall
  * back to a shuffled left-semi join on the n-gram key.
  */
case class DecontaminatePipe(
    evalDf: DataFrame,
    textCol: String,
    idCol: String,
    ngramSize: Int = 3,
    /** true → add boolean `flagCol`; false → drop contaminated rows. */
    flagOnly: Boolean = true,
    flagCol: String = "contaminated",
    broadcastEval: Boolean = true) extends Pipe {
  override def params = Map("text" -> textCol, "id" -> idCol,
    "n" -> ngramSize.toString, "flagOnly" -> flagOnly.toString,
    "flag" -> flagCol, "broadcastEval" -> broadcastEval.toString)

  /** Stage the token array as a kept column before building n-grams: the
    * split expression would otherwise be inlined into wordNgrams' slice
    * lambda and re-evaluated once per n-gram (the HOF-inline hazard,
    * SURVEY §6) — measured ~2x on the sf0.1 gate.
    */
  private def ngramRows(df: DataFrame, extra: Seq[Column]): DataFrame =
    df.withColumn("__dc_tk__", TextAnalysisOps.toks(qcol(textCol)))
      .select(extra :+
        explode(CurationOps.wordNgrams(col("__dc_tk__"), ngramSize)).as("__ng__"): _*)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val evalNg = ngramRows(evalDf, Nil).distinct()
    val probe = if (broadcastEval) broadcast(evalNg) else evalNg
    // widen the train side: the n-gram HOF probe is map-only and would
    // otherwise run on the input's (possibly single) scan tasks
    val wide = Pipe.widen(df)
    val hits = ngramRows(wide, Seq(qcol(idCol).as("__cid__")))
      .join(probe, Seq("__ng__"), "left_semi")
      .select(col("__cid__")).distinct()
    if (flagOnly)
      wide.join(hits, qcol(idCol) === col("__cid__"), "left")
        .withColumn(flagCol, col("__cid__").isNotNull)
        .drop("__cid__")
    else
      wide.join(hits, qcol(idCol) === col("__cid__"), "left_anti")
  }
}

/** Overlap-FRACTION decontamination — the published large-model
  * protocol next to [[DecontaminatePipe]]'s any-shared-n-gram flag:
  * GPT-3 (Brown et al. 2005.14165, Appendix C) and PaLM (Chowdhery et
  * al. 2204.02311, §8 "Dataset Contamination") flag a training document
  * only when a high FRACTION of its n-grams appears in the eval set
  * (PaLM: ≥70% of 8-grams) — a single shared n-gram is common phrasing,
  * not leakage, so the exists-flag over-fires on long benchmark suites.
  *
  * Semantics: per document, over its DISTINCT word `ngramSize`-grams,
  * `matched` = how many appear among the eval corpus's distinct n-grams,
  * `total` = how many there are; the document is contaminated when
  * `matched * 10000 >= thresholdBp * total` (and `total > 0`). All
  * integer arithmetic — no float fraction ever compared, so any engine
  * replays the flag exactly; `overlap_bp` (= matched*10000 div total, 0
  * when gramless) is emitted for audit/threshold-tuning.
  *
  * Shape at scale: `total` is map-only (array_distinct + size on the
  * token array); `matched` explodes the distinct grams, semi-joins the
  * broadcast eval set, and counts per doc id — one shuffle on the doc id
  * (unique key, perfectly even) plus the count join back. The 100 TB
  * side is never shuffled by gram text; set `broadcastEval = false` for
  * an oversized eval corpus.
  */
case class OverlapFractionPipe(
    evalDf: DataFrame,
    textCol: String,
    idCol: String,
    ngramSize: Int = 8,
    /** Contamination threshold in basis points of distinct n-grams
      * matched (7000 = PaLM's 70%).
      */
    thresholdBp: Int = 7000,
    flagCol: String = "contaminated",
    matchedCol: String = "matched_ngrams",
    totalCol: String = "total_ngrams",
    bpCol: String = "overlap_bp",
    broadcastEval: Boolean = true) extends Pipe {
  require(thresholdBp > 0 && thresholdBp <= 10000,
    s"thresholdBp must be in (0, 10000], got $thresholdBp")
  override def params = Map("text" -> textCol, "id" -> idCol,
    "n" -> ngramSize.toString, "thresholdBp" -> thresholdBp.toString,
    // all three output column names participate: two pipes differing
    // only in output naming must not share a fingerprint (a keyed
    // CachedStage replay would serve the other instance's columns)
    "flag" -> flagCol, "matched" -> matchedCol, "total" -> totalCol,
    "bp" -> bpCol, "broadcastEval" -> broadcastEval.toString)

  /** Distinct n-grams of a doc, null text folded to the empty set. */
  private def grams(text: Column): Column = {
    val tk = TextAnalysisOps.toks(text)
    coalesce(array_distinct(CurationOps.wordNgrams(tk, ngramSize)),
      array().cast("array<string>"))
  }

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val evalNg = evalDf
      .select(explode(grams(qcol(textCol))).as("__ng__")).distinct()
    val probe = (if (broadcastEval) broadcast(evalNg) else evalNg)
      .withColumn("__hit__", lit(1))
    // widen: the per-row n-gram HOF is map-only and would serialize on a
    // single input split (the recurring widen hazard)
    val wide = Pipe.widen(df)
    // ONE evaluation of the tokenizer + n-gram chain per document: stage
    // (id, grams), carry the total THROUGH the generator, mark matches
    // with a left join against the (distinct) eval set — 0/1 hit per
    // distinct doc gram — and fold to one (id, matched, total) row. The
    // raw side of the final join never touches the gram chain (the first
    // cut computed it on BOTH join branches — measured ~2x on the sf0.1
    // gate; explode_outer keeps gramless docs as a (null-gram, total 0)
    // row so every doc id survives the fold).
    val counts = wide
      .select(qcol(idCol).as("__cid__"), grams(qcol(textCol)).as("__of_ng__"))
      .select(col("__cid__"), size(col("__of_ng__")).as("__tot__"),
        explode_outer(col("__of_ng__")).as("__ng__"))
      .join(probe, Seq("__ng__"), "left")
      .groupBy(col("__cid__"))
      .agg(first(col("__tot__")).as("__tot__"),
        sum(coalesce(col("__hit__"), lit(0))).cast("int").as("__mc__"))
    val m = coalesce(col("__mc__"), lit(0)).cast("int")
    val tot = coalesce(col("__tot__"), lit(0)).cast("int")
    wide.join(counts, qcol(idCol) === col("__cid__"), "left")
      .withColumn(matchedCol, m)
      .withColumn(totalCol, tot)
      .withColumn(bpCol, {
        // exact integer division (Column./ is DOUBLE division — its floor
        // can round a near-integer quotient the wrong way): subtract the
        // remainder first, then the double division is remainder-free and
        // IEEE-exact for any quotient below 2^53
        val num = m.cast("long") * 10000L
        val den = tot.cast("long")
        when(tot > 0,
          ((num - pmod(num, den)) / den).cast("int")).otherwise(lit(0))
      })
      .withColumn(flagCol,
        tot > 0 && m.cast("long") * 10000L >= lit(thresholdBp.toLong) * tot.cast("long"))
      .drop("__cid__", "__mc__", "__tot__")
  }
}

/** Engine-reproducible Bloom position algebra shared by
  * [[BloomDecontaminatePipe]] and its gate oracle.
  */
object BloomOps {
  val BloomPrime: Long = 2147483647L // 2^31 - 1

  /** Engine-reproducible wide n-gram hashing, structured so each CHAR is
    * folded exactly once per document: two independent per-token
    * polynomial char folds (31 mod 1000003 seed 7; 131 mod 1000000007
    * seed 11), then per n-gram the same two fold families over the n
    * TOKEN hashes, combined as f1·1000000007 + f2 — ~1e15 distinct
    * values, every intermediate product < 2^63 so any 64-bit engine
    * replays exactly. (Hashing gram STRINGS directly re-folds each char
    * n times — measured 5.1 s vs 1.5 s on the sf0.1 gate.)
    *
    * NOT [[DedupOps.polySig61]]: that one's mixing chain starts from a
    * SINGLE fold mod 1000003, so it has only ~1e6 distinct values — fine
    * for SimHash's per-token majority votes, but as a Bloom key it makes
    * every eval/train gram pair collide at rate n/1e6 (measured: 34
    * spurious docs on the sf0.001 spec corpus; at real corpus sizes the
    * filter would saturate). Residual hash-collision FP rate here is
    * nEvalGrams/1e15 per probe.
    */
  def tokenFold31(t: Column): Column =
    aggregate(filter(split(t, ""), c => length(c) > 0), lit(7L),
      (h, c) => pmod(h * 31 + ascii(c).cast("long"), lit(1000003L)))

  def tokenFold131(t: Column): Column =
    aggregate(filter(split(t, ""), c => length(c) > 0), lit(11L),
      (h, c) => pmod(h * 131 + ascii(c).cast("long"), lit(1000000007L)))

  /** Gram hashes over pre-staged token-hash arrays (STAGE t1s/t2s as
    * kept columns first — the SURVEY §6 HOF-inline hazard; a raw column
    * reference inside the per-gram lambda is an array lookup, an inlined
    * producer expression is a per-gram re-fold of the whole doc).
    */
  def gramHashes(t1s: Column, t2s: Column, n: Int): Column =
    when(size(t1s) >= n,
      arrTransform(sequence(lit(0), size(t1s) - n), i =>
        aggregate(slice(t1s, i + 1, lit(n)), lit(7L),
          (h, x) => pmod(h * 31 + x, lit(1000003L))) * lit(1000000007L) +
        aggregate(slice(t2s, i + 1, lit(n)), lit(11L),
          (h, x) => pmod(h * 131 + x, lit(1000000007L)))))
      .otherwise(array().cast("array<long>"))

  /** Fixed-seed (a, b) affine pairs — a DIFFERENT seed than
    * [[DedupOps.minhashCoeffs]] so bloom positions and minhash buckets
    * stay statistically independent when both run over one corpus.
    */
  def bloomCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0xb100f17e)
    (0 until numHashes).map { _ =>
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong)
    }
  }

  /** The k bit positions of one 61-bit shingle hash: pos_j =
    * ((h mod P)·a_j + b_j mod P) mod m — bounded integer arithmetic an
    * external engine replays exactly (hp < 2^31, hp·a < 2^62).
    */
  def positions(h: Column, numHashes: Int, mBits: Int): Seq[Column] = {
    val hp = pmod(h, lit(BloomPrime))
    bloomCoeffs(numHashes).map { case (a, b) =>
      pmod(pmod(hp * lit(a) + lit(b), lit(BloomPrime)), lit(mBits.toLong))
    }
  }

  /** Distinct eval n-grams → gramHash → k positions each → per-partition
    * local bitmaps OR-folded to one Array[Long]. Runs one Spark job over
    * the (small) eval side only. Shared by [[BloomDecontaminatePipe]] and
    * [[graft.streaming.StreamingDecontaminate.bloom]].
    */
  def buildBitmap(evalDf: DataFrame, textCol: String, ngramSize: Int,
      numHashes: Int, mBits: Int): Array[Long] = {
    val words = mBits / 64
    val pos = evalDf
      .select(explode(gramHashesNative(
        coalesce(Pipe.qcol(textCol), lit("")), ngramSize)).as("__h__"))
      .distinct()
      .select(explode(array(
        positions(col("__h__"), numHashes, mBits): _*)).as("p"))
    pos.select(col("p").cast("long")).rdd
      .mapPartitions { it =>
        val w = new Array[Long](words)
        it.foreach { r =>
          val p = r.getLong(0)
          w((p >>> 6).toInt) |= 1L << (p & 63L).toInt
        }
        Iterator.single(w)
      }
      .fold(new Array[Long](words)) { (x, y) =>
        var i = 0
        while (i < words) { x(i) |= y(i); i += 1 }
        x
      }
  }

  /** The MAP-ONLY train-side probe: stage tokens, both token-hash
    * arrays, gram hashes, and bit positions as kept columns (HOF-inline
    * hazard, SURVEY §6), test every gram against the bitmap with the
    * codegen'd [[org.apache.spark.sql.graft.BloomProbeExpr]], and drop
    * the staging. Pure projection — legal on a STREAMING frame (zero
    * state) exactly as on a batch one.
    */
  def withFlag(df: DataFrame, textCol: String, ngramSize: Int,
      numHashes: Int, mBits: Int, bits: Array[Long],
      flagCol: String): DataFrame = {
    val staged = df.withColumn("__bd_ps__",
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.graft.BloomGramPositionsExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            coalesce(Pipe.qcol(textCol), lit(""))),
          ngramSize, mBits,
          bloomCoeffs(numHashes).flatMap(p => Seq(p._1, p._2)).toArray)))
    val probe = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.BloomProbeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__bd_ps__")),
        bits, numHashes))
    staged.withColumn(flagCol, probe).drop("__bd_ps__")
  }

  /** The native kernel form of the tokenFold/gramHashes chain (same
    * integer arithmetic compiled — [[org.apache.spark.sql.graft
    * .BloomGramHashExpr]]); the HOF Column versions above remain the
    * readable reference the oracle SQL mirrors, and the differential
    * spec pins the two equal.
    */
  def gramHashesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.BloomGramHashExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Power-of-two bitmap size targeting `bitsPerGram` bits per distinct
    * eval gram. At the default 64 bits/gram with k=4 hashes the fill is
    * ~1-exp(-4/64) ≈ 6%, per-gram FP ≈ 1.3e-5 — a 100-gram clean doc
    * probes positive at ~0.1%, so the exact confirm behind the probe
    * runs on ~1/1000 of clean rows. Clamped to [2^20, 2^27] bits
    * (128 KiB – 16 MiB of bitmap shipped once per executor with the
    * task binary).
    */
  def sizedBits(nGrams: Long, bitsPerGram: Int = 64): Int = {
    val target = nGrams * bitsPerGram
    var m = 1L << 20
    while (m < target && m < (1L << 27)) m <<= 1
    m.toInt
  }
}

/** Bloom-filter eval-set decontamination — the O(1)-broadcast sibling of
  * [[DecontaminatePipe]] (Bloom 1970, CACM 13(7)). Where that pipe
  * broadcasts the eval side's DISTINCT n-gram strings (broadcast size
  * grows with the eval corpus), this one compresses the eval side to a
  * FIXED `mBits`-bit bitmap: each eval n-gram sets `numHashes` positions
  * derived from the engine-reproducible [[BloomOps.gramHash]]; a
  * training doc is flagged iff ANY of its n-grams finds all its positions
  * set. One-sided error only — every truly contaminated doc is flagged
  * (no false negatives); false positives occur at rate ~fill^k (size
  * `mBits` >= ~10x expected distinct eval n-grams to keep it negligible).
  *
  * Shape at 100 TB: the bitmap build touches only the (small) eval side
  * — per-partition OR of local bitmaps, one fold — and the train side is
  * MAP-ONLY: no join, no shuffle, no broadcast-table hash lookup; just a
  * codegen'd bit test ([[org.apache.spark.sql.graft.BloomProbeExpr]])
  * against an Array[Long] that ships once per stage with the task
  * binary. Deterministic on any cluster size/retry/engine — the gate
  * oracle replays every bit collision.
  */
case class BloomDecontaminatePipe(
    evalDf: DataFrame,
    textCol: String,
    idCol: String,
    ngramSize: Int = 3,
    mBits: Int = 1 << 20,
    numHashes: Int = 4,
    /** true → add boolean `flagCol`; false → drop flagged rows. */
    flagOnly: Boolean = true,
    flagCol: String = "contaminated") extends Pipe {
  require((mBits & (mBits - 1)) == 0 && mBits >= 64,
    s"mBits must be a power of two >= 64, got $mBits")
  override def update: Boolean = flagOnly
  override def params = Map("text" -> textCol, "id" -> idCol,
    "n" -> ngramSize.toString, "m" -> mBits.toString,
    "k" -> numHashes.toString, "flagOnly" -> flagOnly.toString,
    "flag" -> flagCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val bits = BloomOps.buildBitmap(evalDf, textCol, ngramSize, numHashes,
      mBits)
    // no widen: the flag probe is k hash ops per ngram against a
    // broadcast bitmap — cheaper than a round-robin exchange of the
    // full text rows (r19: 0.38 -> 0.70 s regression with widen)
    val flagged = BloomOps.withFlag(df, textCol, ngramSize,
      numHashes, mBits, bits, flagCol)
    if (flagOnly) flagged
    else flagged.filter(!qcol(flagCol)).drop(flagCol)
  }
}

/** PII redaction: count and mask pattern families (emails, phone numbers,
  * IPv4 by default) with placeholder tags. Pure regexp expressions —
  * map-only, codegen'd, no shuffle.
  */
case class PiiRedactPipe(
    textCol: String,
    outputCol: String = "redacted",
    patterns: Seq[(String, String, String)] = PiiRedactPipe.defaults)
    extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "out" -> outputCol,
    "patterns" -> patterns.map(p => s"${p._1}:${p._2}:${p._3}").mkString("|"))

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = qcol(textCol)
    val counts = patterns.map { case (pname, regex, _) =>
      s"n_$pname" -> (size(regexp_extract_all(text, lit(regex), lit(0)))
        .cast("int"): Column)
    }
    val redacted = patterns.foldLeft(text) { case (acc, (_, regex, tag)) =>
      regexp_replace(acc, lit(regex), lit(tag))
    }
    // codegen'd but still bounded by the input's scan tasks — widen past
    // a single-row-group file's one split
    finish(Pipe.widen(df), counts :+ (outputCol -> redacted))
  }
}

object PiiRedactPipe {
  /** (name, regex, replacement) — identical semantics in Java regex and
    * DuckDB's RE2, so an oracle can replay them verbatim.
    */
  val defaults: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phones", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ips", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))
}

/** URL/domain blocklist filtering (the C4-style source cleaner): extract
  * every `http(s)://host` from the text, flag (or drop) documents whose
  * host — or any parent domain of it — is blocklisted. Pure codegen'd
  * expressions over an inlined blocklist: map-only, zero shuffle, linear
  * in input splits. For blocklists too large to inline (millions of
  * domains), follow the [[DecontaminatePipe]] shape instead: explode
  * hosts and left-semi probe a broadcast blocklist table.
  */
case class UrlFilterPipe(
    textCol: String,
    blockedDomains: Seq[String],
    /** true → add `n_urls` + boolean `flagCol`; false → drop flagged rows. */
    flagOnly: Boolean = true,
    flagCol: String = "url_blocked") extends Pipe {
  require(blockedDomains.nonEmpty, "blockedDomains must not be empty")
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "flagOnly" -> flagOnly.toString,
    "flag" -> flagCol, "blocked" -> blockedDomains.mkString("|"))

  private val hostRe = "https?://([A-Za-z0-9.-]+)"

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val hosts = regexp_extract_all(qcol(textCol), lit(hostRe), lit(1))
    val blockedLit = array(blockedDomains.map(lit): _*)
    // host matches d iff host == d or host ends with "." + d
    val hit = exists(hosts, h =>
      exists(blockedLit, d => h === d || h.endsWith(concat(lit("."), d))))
    if (flagOnly)
      finish(df, Seq(
        "n_urls" -> size(hosts).cast("int"),
        flagCol -> (hit: Column)))
    else df.filter(!hit)
  }
}

/** URL canonicalization (the crawl-dedup key normalizer): lowercase the
  * scheme and authority, strip the scheme's default port (`:80` for
  * http, `:443` for https), default an empty path to `/`, drop the
  * fragment, and rewrite the query to its canonical form — split on
  * `&`, drop empty params and the cross-site tracking params (`utm_*`,
  * `fbclid`, `gclid`, `msclkid`, `mc_eid`), byte-sort the survivors,
  * rejoin (and drop the `?` entirely when none survive). Two URLs that
  * differ only in case/port/fragment/tracker-noise/param order then
  * compare equal, which is what crawl frontier dedup and per-host
  * aggregation key on.
  *
  * Emits `outputCol` (NULL for non-URL input), `hostCol` (the
  * canonical authority with any port stripped), and `validCol`. The
  * parse is one anchored regex — scheme `://` authority path
  * [?query][#fragment] — with no lookaround, so Java regex and RE2
  * agree; IPv6 literal authorities and userinfo pass through
  * lowercased but otherwise untouched. Map-only: pure per-row Column
  * expressions, zero shuffle at any scale.
  */
case class UrlCanonicalizePipe(
    urlCol: String,
    outputCol: String = "url_canonical",
    hostCol: String = "url_host",
    validCol: String = "url_valid") extends Pipe {
  override def update: Boolean = true
  override def params = Map("url" -> urlCol, "out" -> outputCol,
    "host" -> hostCol, "valid" -> validCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    import UrlCanonicalOps._
    val url = coalesce(qcol(urlCol), lit(""))
    val valid = url.rlike(re)
    finish(df, Seq(
      outputCol -> when(valid, canonical(url)).otherwise(lit(null).cast("string")),
      hostCol -> when(valid, host(url)).otherwise(lit(null).cast("string")),
      validCol -> (valid: Column)))
  }
}

/** The canonicalization algebra as column expressions — shared by
  * [[UrlCanonicalizePipe]] and the `graft_url_canonical` SQL function.
  */
object UrlCanonicalOps {
  val re =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
  private val trackers = Seq("fbclid", "gclid", "msclkid", "mc_eid")

  private def auth(url: Column): Column = {
    val scheme = lower(regexp_extract(url, re, 1))
    val auth0 = lower(regexp_extract(url, re, 2))
    when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
  }

  /** Canonical form of a syntactically valid URL (callers gate on
    * [[re]] validity; on a non-match this yields `scheme:///`-ish
    * garbage, by construction never consulted). */
  def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, re, 1))
    val path0 = regexp_extract(url, re, 3)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val kept = array_sort(filter(split(regexp_extract(url, re, 4), "&"),
      p => {
        val k = element_at(split(p, "="), 1)
        p =!= "" && !k.startsWith("utm_") &&
          !k.isin(trackers.map(lit): _*)
      }))
    val query = when(size(kept) > 0,
      concat(lit("?"), concat_ws("&", kept))).otherwise(lit(""))
    concat(scheme, lit("://"), auth(url), path, query)
  }

  def host(url: Column): Column =
    regexp_replace(auth(url), ":[0-9]+$", "")

  /** Validity-gated canonical as ONE scalar (NULL for non-URLs) — the
    * `graft_url_canonical` SQL surface, sharing the kernel with the pipe.
    */
  def canonicalOrNull(url0: Column): Column = {
    val url = coalesce(url0, lit(""))
    when(url.rlike(re), canonical(url)).otherwise(lit(null).cast("string"))
  }
}

/** Line-level exact deduplication (the CCNet/RefinedWeb corpus cleaner):
  * drop every line whose exact text occurs in more than `maxOccurrences`
  * (doc, line) slots across the WHOLE corpus — boilerplate headers,
  * navigation chrome, cookie banners — and reassemble each document from
  * its surviving lines in original order.
  *
  * Scale shape: one explode (map-only), one map-side-combined count
  * aggregate on the line key, one line→count join (AQE splits the hot
  * keys — the empty line and top boilerplate are exactly the skewed ones),
  * one groupBy(id) reassembly. No window over the corpus, no driver
  * state; every shuffle key is either the line key or the doc id.
  *
  * `hashKey = true` counts and joins on `xxhash64(line)` instead of the
  * full line text — the 100 TB shape: boilerplate lines run to kilobytes
  * and the count+join shuffle then moves 8-byte keys instead of whole
  * lines (CCNet itself dedups on a 64-bit hash of the normalized line).
  * Trade-off: a 64-bit collision merges two distinct lines' counts
  * (P ≈ n²/2⁶⁵ — negligible below ~10¹² distinct lines, and the failure
  * mode is an over-removed line, never corrupted text). Default stays
  * exact; a spec asserts hashKey ≡ exact on real data.
  */
case class LineDedupPipe(
    textCol: String,
    idCol: String,
    maxOccurrences: Long = 1,
    removedCol: String = "n_lines_removed",
    hashKey: Boolean = false) extends Pipe {
  require(maxOccurrences >= 1, "maxOccurrences must be >= 1")
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "id" -> idCol,
    "max" -> maxOccurrences.toString, "removed" -> removedCol,
    "hashKey" -> hashKey.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // widen: the line explode otherwise runs on the input's (possibly
    // single) scan tasks before any shuffle redistributes
    val wide = Pipe.widen(df)
    val exploded = wide.select(qcol(idCol).as("__ld_id__"),
      posexplode(split(coalesce(qcol(textCol), lit("")), "\n"))
        .as(Seq("__ld_pos__", "__ld_line__")))
    // exact mode keys on the line itself (no duplicated column in the
    // shuffle); hash mode adds the 8-byte key and keeps the text only on
    // the rebuild side
    val keyName = if (hashKey) "__ld_key__" else "__ld_line__"
    val lines =
      if (hashKey) exploded.withColumn(keyName, xxhash64(col("__ld_line__")))
      else exploded
    val counts = lines.groupBy(keyName)
      .agg(count(lit(1)).as("__ld_cnt__"))
    val keep = col("__ld_cnt__") <= maxOccurrences
    val rebuilt = lines.join(counts, Seq(keyName))
      .groupBy("__ld_id__")
      .agg(
        concat_ws("\n", arrTransform(
          array_sort(collect_list(when(keep,
            struct(col("__ld_pos__").as("p"), col("__ld_line__").as("v"))))),
          x => x.getField("v"))).as("__ld_clean__"),
        sum(when(keep, 0L).otherwise(1L)).as("__ld_removed__"))
    wide.join(rebuilt, qcol(idCol) === col("__ld_id__"), "left")
      .withColumn(textCol, coalesce(col("__ld_clean__"), lit("")))
      .withColumn(removedCol, coalesce(col("__ld_removed__"), lit(0L)))
      .drop("__ld_id__", "__ld_clean__", "__ld_removed__")
  }
}

/** Intra-document line deduplication (the within-page half of repetition
  * removal): keep only the FIRST occurrence of each exact line within a
  * document, preserving order — navigation chrome and templated blocks
  * repeated inside one page collapse without consulting any other row.
  * Complements [[LineDedupPipe]] (corpus-frequency line removal, which
  * shuffles) — this variant is MAP-ONLY: a per-row array filter, zero
  * shuffle, so at 100 TB it's free to run before anything that
  * shuffles, shrinking every downstream exchange.
  */
case class IntraDocLineDedupPipe(
    textCol: String,
    removedCol: String = "n_intra_removed") extends Pipe {
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "removed" -> removedCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val text = coalesce(qcol(textCol), lit(""))
    val staged = Pipe.widen(df)
      .withColumn("__idl_lines__", split(text, "\n"))
    val lines = col("__idl_lines__")
    // first-occurrence filter: 1-based array_position vs 0-based index
    val kept = filter(lines, (l, i) => array_position(lines, l) === i + 1)
    finish(staged, Seq(
      textCol -> concat_ws("\n", kept),
      removedCol -> (size(lines) - size(kept)).cast("long")))
      .drop("__idl_lines__")
  }
}

/** Cross-corpus sentence-span deduplication (the C4 dedup, Raffel et al.
  * arXiv:1910.10683 §2.2): group each document's sentences into tumbling
  * `spanSentences`-wide spans, and for every span whose (trimmed) text
  * occurs more than once across the WHOLE corpus keep only the FIRST
  * occurrence — ordered by (id, position) — rebuilding every document
  * from its surviving spans in original order. Complements
  * [[LineDedupPipe]] (which drops ALL occurrences of over-frequent
  * lines; this keeps one survivor — the dedup keep-best policy at span
  * granularity).
  *
  * Sentences are the maximal `[^.!?]*[.!?]+` regex matches — leftmost
  * non-overlapping in both Java regex and RE2, so an external oracle
  * segments identically — which means inter-sentence whitespace rides
  * the FOLLOWING match and concatenating spans reproduces the original
  * text exactly. Any trailing fragment with no terminal punctuation is
  * outside every span and is dropped by the rewrite (compose after
  * [[C4CleanPipe]], which already removes unterminated lines).
  *
  * Scale shape: one map-only explode, one map-side-combined min
  * aggregate on the span key, one key join (AQE splits the hot
  * boilerplate keys), one groupBy(id) reassembly — the LineDedupPipe
  * shuffle discipline. `hashKey = true` (default) keys the count+join
  * shuffle on `xxhash64` of the span instead of the span text — at
  * 100 TB spans run to kilobytes and the shuffle then moves 8-byte
  * keys; a 64-bit collision merges two spans' occurrence lists
  * (P ≈ n²/2⁶⁵), mis-dropping a span, never corrupting surviving text.
  */
case class SpanDedupPipe(
    textCol: String,
    idCol: String,
    spanSentences: Int = 3,
    removedCol: String = "n_spans_removed",
    hashKey: Boolean = true) extends Pipe {
  require(spanSentences >= 1, "spanSentences must be >= 1")
  override def update: Boolean = true
  override def params = Map("text" -> textCol, "id" -> idCol,
    "span" -> spanSentences.toString, "removed" -> removedCol,
    "hashKey" -> hashKey.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val wide = Pipe.widen(df)
    val sents = regexp_extract_all(
      coalesce(qcol(textCol), lit("")), lit("[^.!?]*[.!?]+"), lit(0))
    // tumbling spans: span i = sentences [i*w, i*w + w)
    val w = spanSentences
    val nSpans = floor((size(sents) + lit(w - 1)) / lit(w)).cast("int")
    val spans = when(size(sents) === 0, array().cast("array<string>"))
      .otherwise(arrTransform(
        sequence(lit(0), nSpans - 1),
        i => concat_ws("", slice(sents, i * w + 1, lit(w)))))
    val exploded = wide.select(qcol(idCol).as("__sd_id__"),
      posexplode(spans).as(Seq("__sd_pos__", "__sd_span__")))
    val keyed =
      if (hashKey) exploded.withColumn("__sd_key__",
        xxhash64(trim(col("__sd_span__"))))
      else exploded.withColumn("__sd_key__", trim(col("__sd_span__")))
    // global first occurrence per span key: min over (id, pos)
    val winners = keyed.groupBy("__sd_key__")
      .agg(min(struct(col("__sd_id__"), col("__sd_pos__"))).as("__sd_win__"))
    val keep = col("__sd_win__") ===
      struct(col("__sd_id__"), col("__sd_pos__"))
    val rebuilt = keyed.join(winners, Seq("__sd_key__"))
      .groupBy("__sd_id__")
      .agg(
        concat_ws("", arrTransform(
          array_sort(collect_list(when(keep,
            struct(col("__sd_pos__").as("p"), col("__sd_span__").as("v"))))),
          x => x.getField("v"))).as("__sd_clean__"),
        sum(when(keep, 0L).otherwise(1L)).as("__sd_removed__"))
    wide.join(rebuilt, qcol(idCol) === col("__sd_id__"), "left")
      .withColumn(textCol, coalesce(col("__sd_clean__"), lit("")))
      .withColumn(removedCol, coalesce(col("__sd_removed__"), lit(0L)))
      .drop("__sd_id__", "__sd_clean__", "__sd_removed__")
  }
}

/** Corpus-derived unigram log-probability scoring (the CCNet-style LM
  * quality signal, with the corpus itself as the language model): score
  * each document by the mean negative log probability of its tokens under
  * the corpus unigram distribution. Low scores read as fluent/typical
  * text; high scores flag gibberish, rare-token soup, and wrong-language
  * contamination.
  *
  * Scale shape: one map-side-combined aggregate builds the unigram table
  * (|vocab| rows — bounded by language, not corpus size), which is
  * BROADCAST; the scoring side is then a map-only explode + broadcast-join
  * + per-doc re-aggregate on the id. The 100 TB side never shuffles on
  * the token. For vocabularies too large to broadcast, pass
  * `broadcastVocab = false` for a shuffled join.
  */
case class UnigramLogProbPipe(
    textCol: String,
    idCol: String,
    outputCol: String = "unigram_nll",
    broadcastVocab: Boolean = true) extends Pipe {
  override def params = Map("text" -> textCol, "id" -> idCol,
    "out" -> outputCol, "broadcastVocab" -> broadcastVocab.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // (three consumers re-run the scan + explode — an eager
    // widen+localCheckpoint re-measured SLOWER at sf0.1, 8.5 s vs 7.5 s:
    // the MATERIALIZATION job costs more than the two re-reads it saves.
    // A plain widen is different: no materialization, each re-run just
    // explodes 32-way instead of on the input's single scan task)
    // NO widen here: toks feeds two aggregate consumers (counted, scored)
    // plus the df-side join — a round-robin exchange would be re-executed
    // per consumer (projection pruning defeats exchange reuse) and
    // measured 1.75 s vs 0.94 s at sf0.1; the aggregates' partial sides
    // spread the explode work at any real scan width
    val toks = df.select(qcol(idCol).as("__ug_id__"),
      explode(TextAnalysisOps.toks(qcol(textCol))).as("__ug_tok__"))
    // per-token counts FIRST; the corpus token total is then Σ of the
    // group counts — a fold over the vocabulary-sized table instead of a
    // separate count(*) pass over every token occurrence (one fewer full
    // tokenize+explode execution of the corpus at any scale)
    val counted = toks.groupBy("__ug_tok__")
      .agg(count(lit(1)).as("__ug_cnt__"))
    val total = counted.agg(
      sum("__ug_cnt__").cast("double").as("__ug_n__"))
    val vocabRaw = counted
      .crossJoin(broadcast(total))
      .select(col("__ug_tok__"),
        (-log(col("__ug_cnt__") / col("__ug_n__"))).as("__ug_nll__"))
    val vocab = if (broadcastVocab) broadcast(vocabRaw) else vocabRaw
    // fixed-point per-token nll: integer sums are exact and order-free, so
    // the score is bit-identical on any partitioning AND in any engine
    // (a double avg depends on summation order). The MEAN rounds half-up
    // on the exact rational — floor((2·sum+n)/(2·n)) — because round()
    // on the double quotient diverges across engines whenever sum/n lands
    // on a .00005 boundary (Java rounds the shortest-decimal repr, DuckDB
    // the binary value; measured 48/50k rows at the sf1 audit)
    val scored = toks.join(vocab, Seq("__ug_tok__"))
      .groupBy("__ug_id__")
      .agg((floor(
        (sum(round(col("__ug_nll__") * 10000).cast("long")) * 2 + count(lit(1))) /
          (count(lit(1)) * 2)) / 10000d).as("__ug_score__"))
    // original frame on the left: it contributes no per-row kernel work,
    // so widening it would only add a round-robin exchange of the full
    // text ahead of a join that re-distributes by id anyway
    df.join(scored, qcol(idCol) === col("__ug_id__"), "left")
      .withColumn(outputCol, coalesce(col("__ug_score__"), lit(0d)))
      .drop("__ug_id__", "__ug_score__")
  }
}

/** Corpus-derived BIGRAM log-probability scoring — the order-2 upgrade of
  * [[UnigramLogProbPipe]] (the KenLM-style fluency signal of the CCNet
  * lineage with the corpus as its own LM): score each document by the
  * mean negative log of `p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) /
  * (c(w_{i-1}) + V)` (add-one smoothing over the corpus vocabulary V)
  * across positions with a predecessor; documents under two tokens score
  * 0. Low = fluent/typical word ORDER, not just typical words — word
  * salad with a common vocabulary sails past a unigram score but not
  * this one.
  *
  * Scale shape mirrors the unigram pipe: bigram and unigram count tables
  * are vocabulary-bounded aggregates, joined into one conditional table
  * that is BROADCAST; the corpus side is explode + broadcast-probe +
  * per-doc re-aggregate. Fixed-point (x1e4) per-position terms make the
  * mean bit-identical on any partitioning and replayable externally.
  */
case class BigramLogProbPipe(
    textCol: String,
    idCol: String,
    outputCol: String = "bigram_nll",
    broadcastTable: Boolean = true) extends Pipe {
  override def params = Map("text" -> textCol, "id" -> idCol,
    "out" -> outputCol, "broadcastTable" -> broadcastTable.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    // NO widen — same multi-consumer rationale as the unigram pipe
    val staged = df.select(qcol(idCol).as("__bg_id__"),
      TextAnalysisOps.toks(coalesce(qcol(textCol), lit(""))).as("__bg_tk__"))
    val tk = col("__bg_tk__")
    // (prev, cur) rows for positions 1..n-1
    val bigrams = staged.select(col("__bg_id__"),
      explode(when(size(tk) >= 2,
        arrTransform(sequence(lit(0), size(tk) - 2), i =>
          struct(element_at(tk, (i + 1).cast("int")).as("p"),
            element_at(tk, (i + 2).cast("int")).as("c"))))
        .otherwise(array().cast("array<struct<p:string,c:string>>")))
        .as("__bg__"))
      .select(col("__bg_id__"), col("__bg__.p").as("__bg_p__"),
        col("__bg__.c").as("__bg_c__"))
    val unigrams = staged.select(explode(tk).as("__bg_p__"))
    val uniCnt = unigrams.groupBy("__bg_p__")
      .agg(count(lit(1)).as("__bg_un__"))
    // |vocabulary| = number of uniCnt groups: a fold over the
    // vocabulary-sized count table, not a second count-distinct pass
    // over every token occurrence (same values, one fewer corpus pass)
    val vocabSize = uniCnt.agg(count(lit(1)).as("__bg_v__"))
    val biCnt = bigrams.groupBy("__bg_p__", "__bg_c__")
      .agg(count(lit(1)).as("__bg_bn__"))
    val table = biCnt.join(uniCnt, Seq("__bg_p__"))
      .crossJoin(broadcast(vocabSize))
      .select(col("__bg_p__"), col("__bg_c__"),
        round(-log((col("__bg_bn__") + 1).cast("double") /
          (col("__bg_un__") + col("__bg_v__")).cast("double")) * 10000)
          .cast("long").as("__bg_f__"))
    val probe = if (broadcastTable) broadcast(table) else table
    // every (prev, cur) a doc probes exists in the table by construction
    // exact half-up mean of the fixed-point terms (same boundary-free
    // form as the unigram pipe)
    val scored = bigrams.join(probe, Seq("__bg_p__", "__bg_c__"))
      .groupBy("__bg_id__")
      .agg((floor((sum("__bg_f__") * 2 + count(lit(1))) /
        (count(lit(1)) * 2)) / 10000d).as("__bg_s__"))
    // original frame on the left — same rationale as the unigram pipe
    df.join(scored, qcol(idCol) === col("__bg_id__"), "left")
      .withColumn(outputCol, coalesce(col("__bg_s__"), lit(0d)))
      .drop("__bg_id__", "__bg_s__")
  }
}

/** Deterministic stratified sampling for domain/language rebalancing:
  * keep a row iff an engine-reproducible hash of its id falls under the
  * group's rate threshold. A pure filter — no shuffle, no RNG state, and
  * the SAME rows survive on any cluster size or retry (unlike
  * `sample()`, whose output is partitioning-dependent), which makes
  * training-data mixes reproducible and auditable.
  *
  * Hash is the repo's polynomial scheme ((id*131+7) mod 1000003 mod 1e4 —
  * same family as [[FingerprintPipe]]), replayable in any engine.
  */
case class StratifiedSamplePipe(
    idCol: String,
    groupCol: String,
    rates: Seq[(String, Double)],
    defaultRate: Double = 1.0) extends Pipe {
  require(rates.forall { case (_, r) => r >= 0 && r <= 1 } &&
    defaultRate >= 0 && defaultRate <= 1, "rates must be in [0, 1]")
  override def params = Map("id" -> idCol, "group" -> groupCol,
    "rates" -> rates.map(r => s"${r._1}:${r._2}").mkString("|"),
    "default" -> defaultRate.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val slot = pmod(pmod(qcol(idCol).cast("long") * 131 + 7, lit(1000003L)),
      lit(10000L))
    val thr = rates.foldRight(lit((defaultRate * 10000).toLong): Column) {
      case ((g, r), acc) =>
        when(qcol(groupCol) === g, lit((r * 10000).toLong)).otherwise(acc)
    }
    df.filter(slot < thr)
  }
}
