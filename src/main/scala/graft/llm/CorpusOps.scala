package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random global shuffle for training-data ordering:
  * assign each row a slot from an engine-reproducible hash of its id and
  * range-partition + sort by (slot, id). Unlike `orderBy(rand(seed))`
  * (whose sample is partitioning-dependent) or an RNG column (whose state
  * is retry-dependent), the SAME permutation comes out on any cluster
  * size, retry, or engine — auditable training-data order.
  *
  * Scale shape: range partition on the slot is a distributed sort (no
  * single-partition window, no driver collect); downstream writers get
  * well-mixed partitions (consecutive doc_ids land far apart).
  *
  * The mixer is QUADRATIC on purpose: an affine hash ((id*a+b) mod p —
  * the [[StratifiedSamplePipe]] family) maps consecutive ids a constant
  * stride apart, which is order-preserving until the modulus wraps — not
  * a shuffle at all for a contiguous id range. s = (id*131+seed) mod p;
  * slot = (s² + s) mod p destroys locality (~50% adjacent inversions,
  * measured) while staying exactly replayable in any engine (all
  * intermediates < 2⁶³; DuckDB BIGINT multiplication would error on a
  * 64-bit-wrap mixer).
  */
case class DeterministicShufflePipe(
    idCol: String,
    seed: Long = 7L,
    slotCol: String = "shuffle_slot") extends Pipe {
  override def update: Boolean = true
  override def params = Map("id" -> idCol, "seed" -> seed.toString,
    "slot" -> slotCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    val p = lit(1000003L)
    val s1 = pmod(qcol(idCol).cast("long") * 131 + seed, p)
    val slot = pmod(s1 * s1 + s1, p)
    df.withColumn(slotCol, slot)
      .repartitionByRange(col(slotCol), qcol(idCol))
      .sortWithinPartitions(col(slotCol), qcol(idCol))
  }
}

/** Temperature-based source rebalancing (the multilingual-pretraining
  * `p_s ∝ n_s^alpha` mix of Devlin et al./XLM, arXiv:1901.07291 §3.1,
  * recast as a deterministic without-replacement filter): group s keeps
  * rate `(n_min / n_s)^(1-alpha)`, so surviving counts are
  * `n_s^alpha * n_min^(1-alpha)` — PROPORTIONAL TO `n_s^alpha`: the
  * smallest group is kept whole, overrepresented heads are downsampled,
  * `alpha = 1` keeps the natural distribution and `alpha = 0` flattens
  * to uniform. Rows are kept by the same engine-reproducible hash-slot
  * filter as [[StratifiedSamplePipe]], so the surviving set is identical
  * on any cluster size, retry, or engine.
  *
  * Scale shape: one map-side-combined count per group (|groups| rows),
  * rates broadcast back — the 100 TB side is a map-only filter probe.
  * With `alpha = 0.5` the rate is a bare sqrt (correctly-rounded IEEE),
  * so external replays are bit-exact.
  */
case class TemperatureMixPipe(
    idCol: String,
    groupCol: String,
    alpha: Double = 0.5) extends Pipe {
  require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
  override def params = Map("id" -> idCol, "group" -> groupCol,
    "alpha" -> alpha.toString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    val counts = df.groupBy(qcol(groupCol).as("__tm_g__"))
      .agg(count(lit(1)).as("__tm_n__"))
    val nmin = counts.agg(min("__tm_n__").as("__tm_min__"))
    // keep rate (n_min/n_s)^(1-alpha); sqrt (not pow(x, 0.5)) for the
    // default: IEEE-754 sqrt is correctly rounded, so any engine replays
    // the threshold bit-for-bit; pow is not
    val ratio = col("__tm_min__").cast("double") / col("__tm_n__")
    val rate = if (alpha == 0.5) sqrt(ratio)
               else if (alpha == 0.0) ratio
               else if (alpha == 1.0) lit(1.0)
               else pow(ratio, 1 - alpha)
    // clamp to >= 1: round(rate*10000) truncates keep-rates below 1e-4 to
    // 0, which would DROP an extreme head group entirely instead of
    // downsampling it toward n^alpha (ADVICE r6) — the floor keeps ~1e-4
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col("__tm_g__"),
        greatest(round(rate * 10000).cast("long"), lit(1L)).as("__tm_thr__"))
    val slot = pmod(pmod(qcol(idCol).cast("long") * 131 + 7, lit(1000003L)),
      lit(10000L))
    // <=> (null-safe): groupBy counts a null group, so null-group rows get
    // their computed rate instead of silently passing the filter whole
    df.join(broadcast(rates), qcol(groupCol) <=> col("__tm_g__"), "left")
      .filter(slot < coalesce(col("__tm_thr__"), lit(10000L)))
      .drop("__tm_g__", "__tm_thr__")
  }
}

/** Deterministic shard assignment for training-corpus materialization:
  * `shardCol` = rank/shardSize and `posCol` = rank%shardSize where rank is
  * the 0-based global position in `orderCol` order — the layout a training
  * job reads back as fixed-size shards. Compose after
  * [[DeterministicShufflePipe]] (ordering by a unique mix of its slot and
  * the id) for reproducible SHUFFLED shards; write with
  * `df.repartitionByRange(col(shardCol)).sortWithinPartitions(posCol)`.
  *
  * Scale shape: the rank comes from [[graft.pipes.NestingOps
  * .withGlobalRank]] — range-partitioned sort, per-partition positions,
  * broadcast offset table; NEVER a corpus-wide single-partition window.
  * Ties in `orderCol` are only partition-stable; pass a unique order key
  * for fully deterministic shards.
  */
case class ShardAssignPipe(
    orderCol: String,
    shardSize: Long,
    shardCol: String = "shard_id",
    posCol: String = "pos_in_shard") extends Pipe {
  require(shardSize > 0, "shardSize must be positive")
  override def update: Boolean = true
  override def params = Map("order" -> orderCol, "size" -> shardSize.toString,
    "shard" -> shardCol, "pos" -> posCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame =
    graft.pipes.NestingOps.withGlobalRank(df, orderCol, "__sh_rank__")
      // `div`, not `/`: long/long in Column algebra is DOUBLE division,
      // inexact past 2^53 — integer div is exact at any rank
      .withColumn(shardCol, expr(s"`__sh_rank__` div ${shardSize}L"))
      .withColumn(posCol, pmod(col("__sh_rank__"), lit(shardSize)))
      .drop("__sh_rank__")
}

/** Deterministic curriculum (quality-annealed) training order: rows are
  * ranked by `(scoreCol, idCol)`, cut into `buckets` equal rank slices
  * (bucket 0 = lowest scores), and ordered `(bucket, quadratic-M31 slot
  * of the id, id)` — so a training job reading in `posCol` order sees
  * quality ascend phase by phase (the mid-training annealing recipe:
  * highest-quality data last, when it shapes the final weights most)
  * while WITHIN a phase the order is the engine-reproducible shuffle,
  * not the score order (adjacent examples stay decorrelated). The whole
  * layout is a pure function of (scores, ids, config): identical on any
  * cluster size, retry, or engine.
  *
  * Buckets are RANK-based (exact integer `r·B div n`), not
  * quantile-sketch-based: equal-population phases by construction, and
  * an external SQL oracle replays them exactly — `percentile_approx`
  * boundaries would be neither. Null scores sort FIRST (Spark ascending
  * order; an external replay must say NULLS FIRST explicitly).
  *
  * Scale shape: two range-partitioned global ranks (the
  * [[graft.pipes.NestingOps.withGlobalRank]] design — per-partition
  * positions + a broadcast offset table, NEVER a corpus-wide
  * single-partition window) and a one-row count broadcast; everything
  * else is map-only. Compose with [[ShardAssignPipe]] on `posCol` to
  * materialize the phases as fixed-size shards.
  */
case class CurriculumOrderPipe(
    idCol: String,
    scoreCol: String,
    buckets: Int = 4,
    seed: Long = 29L,
    bucketCol: String = "curriculum_bucket",
    posCol: String = "curriculum_pos") extends Pipe {
  require(buckets >= 1, "need at least one bucket")
  // r·B must stay under 2⁶³: at the B=1000 cap that bounds the corpus
  // at ~9.2e15 rows — far past any real corpus, but NOT structural for
  // arbitrary B (raising the cap shrinks the rankable corpus 1:1)
  require(buckets <= 1000, "more than 1000 curriculum phases is a config typo")
  override def update: Boolean = true
  override def params = Map("id" -> idCol, "score" -> scoreCol,
    "buckets" -> buckets.toString, "seed" -> seed.toString,
    "bucket" -> bucketCol, "pos" -> posCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    // the counted rank: the bucket cut needs n, and the rank's own
    // per-partition counting job already derives it — a separate
    // count() would pay a WHOLE extra pass over the upstream lineage
    val (ranked0, n) = graft.pipes.NestingOps.withGlobalRankCounted(
      df, Seq(qcol(scoreCol), qcol(idCol)), "__cu_r__")
    val ranked = ranked0
      // empty input: no rows reach the division, so n = 0 is harmless
      .withColumn(bucketCol, expr(s"(__cu_r__ * $buckets) div ${math.max(n, 1L)}L"))
      .drop("__cu_r__")
    val slot = WeightedSamplePipe.quadraticSlotM31(
      qcol(idCol).cast("long") * 131 + seed)
    graft.pipes.NestingOps.withGlobalRank(
      ranked.withColumn("__cu_s__", slot),
      Seq(col(bucketCol), col("__cu_s__"), qcol(idCol)), posCol)
      .drop("__cu_s__")
  }
}

/** Deterministic weighted interleaving of multiple corpora — the
  * at-scale equivalent of HF `datasets.interleave_datasets`: source `s`
  * with weight `w_s` contributes rows at rate proportional to `w_s` in
  * the output order. Each source gets dense per-source ranks (the
  * scale-safe global rank), row r of source s gets the integer key
  * `(r+1) * round(1e6 / w_s)` (fixed-point inverse weight — exact, no
  * float ordering ambiguity across engines), and the interleaved order is
  * ascending `(key, source_idx, orderCol)`. The whole layout is a pure
  * function of (sources, weights, order) — reproducible on any cluster
  * size, retry, or engine.
  *
  * Emits the union of all sources (by name, missing columns null) plus
  * `source_idx` and the dense `interleave_pos`. Scale shape: one
  * range-partitioned rank per source, one union, one final rank — no
  * single-partition window anywhere.
  */
object InterleaveDatasets {
  def apply(sources: Seq[(DataFrame, Double)], orderCol: String,
      srcCol: String = "source_idx",
      posCol: String = "interleave_pos"): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._2 > 0), "weights must be positive")
    // source_idx rides in the last 3 decimal digits of the order key, so
    // the key is only unique below 1000 sources (ADVICE r6)
    require(sources.size < 1000, "at most 999 sources supported")
    val tagged = sources.zipWithIndex.map { case ((df, w), i) =>
      val invw = math.round(1e6 / w)
      // invw = 0 (weight > 2e6) would collapse every row of the source to
      // one key (ADVICE r6)
      require(invw > 0,
        s"weight $w too large (must be <= 2e6 for a nonzero fixed-point inverse)")
      // invw*1000 must itself fit a long, or maxRank below would be
      // computed from a wrapped product and let keys overflow silently
      require(invw <= Long.MaxValue / 1000L,
        s"weight $w too small (fixed-point inverse $invw overflows the key space)")
      // the order key (r+1)*invw*1000 + src must stay under 2^63, so the
      // largest representable rank is 2^63/(invw*1000) - 2 — ~9.2e12 rows
      // at weight 1 and ~9.2e9 at weight 1e-3. Checked per ROW and raised
      // loudly: with ANSI off the multiply would wrap silently and
      // corrupt the interleave order (ADVICE r6)
      val maxRank = Long.MaxValue / (invw * 1000L) - 2L
      graft.pipes.NestingOps.withGlobalRank(df, orderCol, "__il_r__")
        .withColumn(srcCol, lit(i))
        .withColumn("__il_key__",
          when(col("__il_r__") <= maxRank, (col("__il_r__") + 1) * invw)
            .otherwise(raise_error(concat(
              lit(s"interleave key overflow: source $i (weight $w) rank "),
              col("__il_r__"),
              lit(s" exceeds max $maxRank — use a larger weight or fewer rows")))))
        .drop("__il_r__")
    }
    val unioned = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    // final interleave order: key*1000 + source_idx is UNIQUE (per-source
    // keys are distinct, source_idx < 1000 disambiguates equal keys), so
    // the rank is fully deterministic with no tie-break column needed
    val keyed = unioned.withColumn("__il_ord__",
      col("__il_key__") * 1000 + col(srcCol))
    graft.pipes.NestingOps.withGlobalRank(keyed, "__il_ord__", posCol)
      .drop("__il_key__", "__il_ord__")
  }
}

/** Per-group corpus profiling: count, mean, min, max, and quantiles of a
  * numeric column — the length/score distribution summaries a curation
  * run reports per language or source.
  *
  * `approx = true` (the 100 TB default) uses `percentile_approx`
  * (GK-sketch, bounded memory per group); `approx = false` uses exact
  * `percentile`, which buffers each group's values — fine for bounded
  * group counts and the DuckDB-replayable correctness gate, a memory
  * hazard for billion-row groups.
  */
case class CorpusStatsPipe(
    groupCols: Seq[String],
    valueCol: String,
    quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
    approx: Boolean = true,
    accuracy: Int = 10000,
    /** Also emit the distinct cardinality of this column per group —
      * HyperLogLog-sketched when `approx` (bounded memory at any group
      * size), exact `count_distinct` otherwise.
      */
    distinctCol: Option[String] = None) extends Pipe {
  require(groupCols.nonEmpty, "CorpusStatsPipe needs at least one group column")
  require(quantiles.forall(p => p >= 0 && p <= 1), "quantiles must be in [0, 1]")
  override def update: Boolean = false
  override def params = Map("group" -> groupCols.mkString(","),
    "value" -> valueCol, "q" -> quantiles.mkString(","),
    "approx" -> approx.toString, "accuracy" -> accuracy.toString,
    "distinct" -> distinctCol.mkString)

  private def qname(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val v = qcol(valueCol)
    val qaggs = quantiles.map { p =>
      val c =
        if (approx) percentile_approx(v, lit(p), lit(accuracy)).cast("double")
        else percentile(v, lit(p))
      round(c, 4).as(qname(p))
    }
    val daggs = distinctCol.toSeq.map { c =>
      (if (approx) approx_count_distinct(qcol(c))
       else count_distinct(qcol(c))).as("n_distinct")
    }
    val aggs = Seq(
      count(v).as("n"),
      round(avg(v), 4).as("mean"),
      min(v).as("min"),
      max(v).as("max")) ++ qaggs ++ daggs
    df.groupBy(groupCols.map(qcol): _*).agg(aggs.head, aggs.tail: _*)
  }
}

/** Deterministic train/val/test split assignment: each row's split comes
  * from the engine-reproducible quadratic mixer (the
  * [[DeterministicShufflePipe]] hash) of its id — NOT from `rand()`, whose
  * sample is partitioning- and retry-dependent. The same row lands in the
  * same split on any cluster size, any engine, any rerun — the property
  * an auditable eval holdout needs; and because the hash ignores every
  * column but the id, each subpopulation splits at ~the assigned rates.
  *
  * Thresholds are `floor(cumFraction · p)` over the mixer's modulus, so
  * an external replay is integer-exact. Map-only: zero shuffles.
  */
case class SplitPipe(
    idCol: String,
    splits: Seq[(String, Double)] = Seq(
      ("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: Long = 11L,
    splitCol: String = "split") extends Pipe {
  require(splits.nonEmpty && splits.forall(_._2 > 0),
    "splits need positive fractions")
  require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
    s"split fractions must sum to 1, got ${splits.map(_._2).sum}")

  override def update: Boolean = true
  override def params = Map("id" -> idCol, "seed" -> seed.toString,
    "splits" -> splits.map { case (n, f) => s"$n:$f" }.mkString(","),
    "splitCol" -> splitCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    val p = 1000003L
    val s1 = pmod(qcol(idCol).cast("long") * 131 + seed, lit(p))
    val slot = pmod(s1 * s1 + s1, lit(p))
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(c => (c * p).toLong)
    val assigned = splits.zip(cuts).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), cut), rest) =>
      when(slot < cut, name).otherwise(rest)
    }
    df.withColumn(splitCol, assigned)
  }
}

/** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis, IPL
  * 2006): draw `k` rows with inclusion odds proportional to a weight
  * column by ranking on `key = ln(u) / w` with `u ∈ (0,1)` and keeping
  * the top k (equivalent to the paper's `u^(1/w)` order, log-domain for
  * numeric range). The one-pass distributed-top-k formulation is THE
  * scale shape for weighted corpus subsampling: no global sort of the
  * 100 TB side, no rejection loop — `orderBy(desc).limit(k)` plans as
  * TakeOrderedAndProject (O(k) state per partition, O(k·partitions)
  * collected), or per-group via [[graft.operators.GroupTopKPipe]].
  *
  * `u` is NOT `rand()` (partitioning/retry-dependent) but the repo's
  * engine-reproducible QUADRATIC mixer (the [[DeterministicShufflePipe]]
  * hash, with the Mersenne modulus M31) mapped into (0,1):
  * s = (id·131 + seed) mod 2147483647; slot = (s² + s) mod 2147483647;
  * u = (slot + 1) / 2³¹ — the same draw on any cluster size, any
  * engine, any rerun, and exactly replayable by an external SQL oracle
  * (every intermediate < 2⁶³, so BIGINT arithmetic never wraps). The
  * quadratic step breaks the contiguous-id order correlation an affine
  * hash would have, and the ~2³¹ draw lattice keys collision odds at
  * ~n²/2³² (vs ~n²/2²¹ for the earlier 1e6-slot draw) — at 10⁹ rows the
  * id tie-break still pins any residual equal-key case.
  *
  * Rows with `w <= 0` are FILTERED OUT before the top-k (the paper's
  * domain is w > 0): they can never be emitted, even when a group — or
  * the whole input — has fewer than k positive-weight rows; the result
  * is then shorter than k rather than padded with unsampleable rows.
  *
  * Engine-replay caveat (1-ulp): `ln` is not a correctly-rounded IEEE
  * operation, so Spark's Math.log and an external engine's libm log may
  * differ in the last ulp on some lattice points. A near-tie at the
  * rank-k boundary could in principle flip the selected set between
  * engines; on the M31 lattice no such boundary pair has been observed
  * (the sf1 audit replays the full selection bit-for-bit in DuckDB).
  * For an exactness-critical replay, compare keys at reduced precision
  * with the id tie-break, or replay the Spark-side key column verbatim.
  */
case class WeightedSamplePipe(
    idCol: String,
    weightCol: String,
    k: Int,
    groupCols: Seq[String] = Nil,
    seed: Long = 17L,
    keyCol: String = "sample_key") extends Pipe {
  require(k > 0, "k must be positive")
  override def params = Map("id" -> idCol, "w" -> weightCol,
    "k" -> k.toString, "group" -> groupCols.mkString(","),
    "seed" -> seed.toString, "key" -> keyCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    // w <= 0 is outside the paper's domain: excluded from the draw
    // entirely (not keyed -inf) so a short group emits < k rows rather
    // than padding with unsampleable ones
    val keyed = df.filter(qcol(weightCol) > 0).withColumn(keyCol,
      WeightedSamplePipe.sampleKey(qcol(idCol), qcol(weightCol), seed))
    if (groupCols.isEmpty)
      // global top-k: TakeOrderedAndProject — O(k) per partition, no sort
      keyed.orderBy(col(keyCol).desc, qcol(idCol).asc).limit(k)
    else
      graft.operators.GroupTopKPipe(groupCols, keyCol, k, idCol,
        rankCol = None)(keyed)
  }
}

object WeightedSamplePipe {
  /** The Efraimidis-Spirakis rank key ln(u)/w with the quadratic-M31
    * draw — shared by the batch pipe and
    * [[graft.streaming.StreamingWeightedSample]] so the stream's
    * surviving set is BIT-IDENTICAL to the batch sample (the key is a
    * pure function of (id, w, seed), independent of arrival order).
    */
  /** M31: s² + s < 2⁶³, so no engine's BIGINT wraps. */
  val M31 = 2147483647L

  /** Loud plan-time refusal for a missing or non-numeric id under the
    * quadratic draw: `cast("long")` on a string/uuid id yields NULL per
    * row, so every slot goes NULL and the "deterministic shuffle"
    * silently degrades to plain id order (and external replays diverge —
    * Spark sorts NULL first, SQL windows default NULLS LAST). A MISSING
    * column would only surface as an unresolved-column error deep in the
    * draw expression, so that fails loudly here too (ADVICE r18: the
    * find→foreach silently no-op'd on absent columns). Every pipe that
    * builds the cast("long") draw calls this first —
    * [[DomainMixturePipe]], [[CurriculumOrderPipe]],
    * [[DeterministicShufflePipe]], [[SplitPipe]], [[TemperatureMixPipe]],
    * [[WeightedSamplePipe]].
    */
  private[graft] def requireNumericId(df: DataFrame, idCol: String,
      pipe: String): Unit = {
    // resolve the way Spark will: case-insensitively unless the session
    // says otherwise — a == comparison would reject "DOC_ID" against a
    // doc_id schema that every downstream qcol() resolves fine
    val caseSensitive = df.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val t = df.schema.find(f =>
        if (caseSensitive) f.name == idCol
        else f.name.equalsIgnoreCase(idCol))
      .map(_.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"$pipe: idCol '$idCol' not found in the input schema " +
            s"[${df.columns.mkString(", ")}]"))
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$pipe: idCol '$idCol' must be numeric for the deterministic " +
        s"quadratic draw (got $t) — cast or hash it to a long first")
  }

  /** The quadratic-M31 slot — slot = (s² + s) mod M31 over
    * s = pre mod M31 — single-sourced for every pipe whose scaladoc
    * promises "the same engine-reproducible draw" (this pipe's sample
    * key, [[graft.streaming.StreamingWeightedSample]],
    * [[DomainMixturePipe]]'s partial-epoch filter), so the formula
    * cannot drift between copies. `pre` must stay under 2⁶³ (callers
    * mix id·131 + seed (+ epoch·7919) — all far below the bound).
    */
  def quadraticSlotM31(pre: Column): Column = {
    val s1 = pmod(pre, lit(M31))
    pmod(s1 * s1 + s1, lit(M31))
  }

  def sampleKey(id: Column, w: Column, seed: Long): Column = {
    val u = (quadraticSlotM31(id.cast("long") * 131 + seed) + 1) /
      lit((M31 + 1).toDouble)
    log(u) / w.cast("double")
  }
}
