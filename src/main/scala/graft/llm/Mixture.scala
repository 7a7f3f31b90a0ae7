package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain-mixture sampling WITH bounded repetition — the
  * published data-mixing recipe (GPT-3 Brown et al. 2005.14165 §2.2
  * Table 2.2, where high-quality corpora are "sampled 2-3 times" while
  * CommonCrawl is sampled under once per epoch; The Pile, Gao et al.
  * 2101.00027 Table 1's per-set epoch counts; DoReMi, Xie et al.
  * 2305.10429's reweighted domain mixture) recast as a deterministic,
  * engine-replayable generator: given target mixture weights `w_d` and a
  * total row `budget`, domain d owes `needed_d = budget·w_d / Σw`
  * output rows. With `n_d` rows on hand the pipe emits
  * `capped_d = min(needed_d, n_d·maxRepeat)` rows: every row repeats
  * `fe_d = capped_d div n_d` full epochs, and the remainder
  * `rem_d = capped_d mod n_d` comes from ONE partial epoch that keeps a
  * row iff its quadratic-M31 hash slot clears `thr_d = rem_d·P div n_d`
  * — the same engine-reproducible draw as [[WeightedSamplePipe]] (per
  * (id, epoch), so each epoch's partial subset is independent), which
  * makes the partial epoch a RATE: ~rem_d rows in expectation,
  * identically replayable on any cluster size, retry, or engine. The
  * emitted `epochCol` (1-based) disambiguates the repeats, so downstream
  * shuffling/sharding ([[DeterministicShufflePipe]] on a unique mix of
  * id and epoch, then [[ShardAssignPipe]]) keeps copies apart and the
  * repetition auditable — a training job can count actual epochs per
  * domain with one GROUP BY.
  *
  * `sizeCol` switches the budget's UNIT from rows to that column's sum
  * — the published recipes budget TOKENS, not documents: quotas, caps,
  * and full epochs are then computed over per-domain token totals
  * `S_d = Σ size`, and the partial epoch keeps each row independently
  * at rate `rem/S_d`, so its expected token yield is exactly `rem`
  * regardless of the length distribution (the hash is independent of
  * size). Full epochs still replicate whole rows — a row is the unit of
  * replication, a token the unit of accounting, exactly the published
  * protocol (The Pile's epochs are per-document, its budget per-token).
  *
  * Semantics at the edges: `needed` is computed driver-side in BigInt
  * (config-only inputs — budget and weights — so no data-dependent
  * overflow); a domain in the data but NOT in `weights` has weight 0 and
  * is dropped (so is a NULL domain); a weight naming a domain absent
  * from the data leaves its quota unfilled — deliberately NO
  * renormalization, so the mix stays a pure function of the config and
  * each domain's own count (a renormalizing sampler would let one
  * domain's outage silently inflate every other domain's repetition).
  * `thr` is exact at any corpus size: `rem·P` is computed in
  * DECIMAL(38,0) (a BIGINT product would wrap past n_d ≈ 4.3e9 rows —
  * or past ~4.3e9 summed size units under `sizeCol`); a null `sizeCol`
  * value contributes 0 to its domain's total (the row still replicates
  * with its domain's epochs).
  *
  * Scale shape: ONE map-side-combined count per domain (|domains| rows),
  * the plan broadcast back; the 100 TB side is a map-only bounded
  * explode (≤ maxRepeat+1 copies) + filter — zero big-side shuffles.
  *
  * Reference: the reference has no mixing stage (its pipelines start
  * from an already-mixed dataset); this is §8.1 extension surface next
  * to [[TemperatureMixPipe]] (rate-only, no repetition) and
  * [[InterleaveDatasets]] (ordering, not selection).
  */
case class DomainMixturePipe(
    idCol: String,
    domainCol: String,
    /** Target mixture weights, integer so every replay is exact. */
    weights: Seq[(String, Long)],
    /** Total output rows owed across all domains (pre-cap). */
    budget: Long,
    /** Repetition cap: no row is emitted more than this many times. */
    maxRepeat: Int = 3,
    seed: Long = 23L,
    epochCol: String = "epoch",
    /** When set, `budget` counts this column's SUM (e.g. tokens), not
      * rows: quotas/caps/epochs computed over per-domain size totals.
      */
    sizeCol: Option[String] = None) extends Pipe {
  require(weights.nonEmpty, "need at least one domain weight")
  require(weights.forall(_._2 > 0), "weights must be positive")
  require(weights.map(_._1).distinct.size == weights.size,
    "duplicate domain in weights")
  require(budget >= 0, "budget must be non-negative")
  require(maxRepeat >= 1, "maxRepeat must be at least 1")
  // the explode emits up to maxRepeat+1 copies PER ROW — an unbounded
  // cap would let a config typo amplify a 100 TB corpus a thousandfold
  // before any filter runs. Published recipes repeat single digits
  // (GPT-3/Pile <= ~4); refuse absurd caps loudly.
  require(maxRepeat <= 1000,
    s"maxRepeat = $maxRepeat amplifies every row up to ${maxRepeat + 1}x " +
      "before filtering — repetition caps above 1000 are refused " +
      "(published mixing recipes repeat single-digit epochs)")

  override def params = Map("id" -> idCol, "domain" -> domainCol,
    // sorted: the weights are a MAP (order never affects the mixture),
    // so two orderings of the same set must share a fingerprint — an
    // order-sensitive render would fork CachedStage keys for nothing
    "weights" -> weights.sortBy(_._1)
      .map { case (d, w) => s"$d:$w" }.mkString(","),
    "budget" -> budget.toString, "maxRepeat" -> maxRepeat.toString,
    "seed" -> seed.toString, "epochCol" -> epochCol,
    "sizeCol" -> sizeCol.mkString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    WeightedSamplePipe.requireNumericId(df, idCol, name)
    DomainMixturePipe.expand(df,
      DomainMixturePipe.quotaPlan(df, domainCol, weights, budget, maxRepeat,
        sizeCol),
      idCol, domainCol, seed, epochCol)
  }
}

/** Realized-vs-owed mixture AUDIT — the |domains|-row report a training
  * job reads before trusting a mixed corpus: for every domain in the
  * quota plan, what the plan OWED (`needed`, the post-cap `capped`, the
  * planned full epochs `fe`) next to what the mixture actually EMITTED
  * (`emitted` rows — or size units under `sizeCol` — `distinct_docs`,
  * `max_epoch`), plus `quota_fill_bp = emitted·10⁴ div capped` (the
  * remainder-stripped integer division every audit column here uses, so
  * any engine replays it). Because the partial epoch is a RATE,
  * `quota_fill_bp` hovers near 10000 without pinning it — the audit's
  * point is to surface domains that are OFF plan: an outage domain
  * (owed but absent: emitted 0), a weight typo (capped ≪ needed shows
  * the repetition cap binding), or an upstream filter that ate a domain.
  *
  * Takes the SOURCE corpus as a constructor frame (the
  * [[ImportanceWeightPipe]] convention) because the quota plan derives
  * from source-domain counts the mixture output no longer carries. The
  * owed side is built from the WEIGHTS list itself, so every planned
  * domain reports — including a true OUTAGE (weighted but absent from
  * the source: needed > 0, capped = 0, emitted = 0, fill 0 bp), the
  * audit's most important line, which a counts-derived plan would drop.
  * `quota_fill_bp` edge rule, exactly replayable: capped > 0 → the
  * division; capped = 0 with needed = 0 → 10000 (nothing owed, nothing
  * missing); capped = 0 with needed > 0 → 0 (outage).
  *
  * Scale shape: two map-side-combined |domains|-row aggregates (source
  * counts, output realized) + broadcast joins between tiny frames —
  * nothing touches the big side beyond the two aggregates.
  */
case class MixtureReportPipe(
    source: org.apache.spark.sql.DataFrame,
    idCol: String,
    domainCol: String,
    weights: Seq[(String, Long)],
    budget: Long,
    maxRepeat: Int = 3,
    epochCol: String = "epoch",
    sizeCol: Option[String] = None) extends Pipe {
  require(weights.nonEmpty, "need at least one domain weight")
  override def update: Boolean = false
  override def params = Map("id" -> idCol, "domain" -> domainCol,
    "weights" -> weights.sortBy(_._1)
      .map { case (d, w) => s"$d:$w" }.mkString(","),
    "budget" -> budget.toString, "maxRepeat" -> maxRepeat.toString,
    "epochCol" -> epochCol, "sizeCol" -> sizeCol.mkString)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the owed side: the WEIGHTS list with quotaPlanFromCounts' exact
    // arithmetic (needed driver-side in BigInt, cap in DECIMAL) — built
    // from the config, not the counts, so outage domains still report
    val sumW = weights.map(w => BigInt(w._2)).sum
    val owed0 = weights.map { case (dom, wt) =>
      (dom, (BigInt(budget) * wt / sumW).toLong)
    }.toDF(domainCol, "needed")
    val counts = DomainMixturePipe.domainCounts(source, domainCol, sizeCol)
    val owed = owed0
      .join(broadcast(counts), qcol(domainCol) === col("__mx_d__"), "left")
      .withColumn("__rp_n__", coalesce(col("__mx_n__"), lit(0L)))
      .withColumn("capped",
        least(col("needed").cast("decimal(38,0)"),
          expr(s"CAST(__rp_n__ AS DECIMAL(38,0)) * $maxRepeat"))
          .cast("long"))
      .withColumn("fe", when(col("__rp_n__") > 0,
        expr("capped div __rp_n__")).otherwise(lit(0L)))
      .drop("__mx_d__", "__mx_n__", "__rp_n__")
    val emittedCol = sizeCol.fold(count(lit(1)))(c =>
      coalesce(sum(qcol(c)), lit(0L)).cast("long"))
    val realized = df.groupBy(qcol(domainCol).as("__rp_d__"))
      .agg(emittedCol.as("emitted"),
        count_distinct(qcol(idCol)).as("distinct_docs"),
        max(qcol(epochCol)).cast("int").as("max_epoch"))
    val joined = owed.join(broadcast(realized),
      qcol(domainCol) === col("__rp_d__"), "left")
    val em = coalesce(col("emitted"), lit(0L))
    val num = em * 10000L
    joined
      .withColumn("emitted", em)
      .withColumn("distinct_docs", coalesce(col("distinct_docs"), lit(0L)))
      .withColumn("max_epoch", coalesce(col("max_epoch"), lit(0)))
      // exact integer division (the RecallEval/OverlapFraction pattern),
      // with the documented capped-0 edge rule
      .withColumn("quota_fill_bp",
        when(col("capped") > 0,
          ((num - pmod(num, col("capped"))) / col("capped")).cast("long"))
          .when(col("needed") === 0, lit(10000L))
          .otherwise(lit(0L)))
      .drop("__rp_d__")
  }
}

object DomainMixturePipe {
  // the draw modulus — shared with WeightedSamplePipe so the promised
  // "same engine-reproducible draw" is one definition, not two copies
  private val P = WeightedSamplePipe.M31

  /** The fixture-gate weight table shared VERBATIM by the batch gate
    * (mx_domain_mixture), the streaming twin (ev_stream_domain_mixture),
    * the parity spec, and — mirrored as a CASE table — the DuckDB
    * oracle: one definition so the three Scala sites can never drift
    * apart while the oracle still describes them. Skewed so every
    * regime fires at once on the 20-source documents fixture: src19
    * (wt 200) hits the maxRepeat=3 cap, wt-60 sources land one full
    * epoch + a partial, wt-11/21 are partial-only, and the wt-1 quota
    * rounds to 0 at sf≤0.01 (dropped).
    */
  val fixtureGateWeights: Seq[(String, Long)] = (0 until 20).map { i =>
    s"src$i" -> (if (i == 19) 200L else Seq(1L, 11L, 21L, 60L)(i % 4))
  }

  /** Per-domain totals in [[quotaPlanFromCounts]]'s shape — row counts,
    * or `sizeCol` sums (token accounting) when set. Split out so a
    * caller that ALSO needs the corpus total (the streaming gate derives
    * budget = |corpus|) can fold it from this one aggregate instead of
    * scanning the corpus a second time.
    */
  def domainCounts(df: DataFrame, domainCol: String,
      sizeCol: Option[String] = None): DataFrame =
    df.groupBy(qcol(domainCol).as("__mx_d__"))
      .agg(sizeCol.fold(count(lit(1)))(c =>
        coalesce(sum(qcol(c)), lit(0L)).cast("long")).as("__mx_n__"))

  /** The |domains|-row quota plan: (domain, fullEpochs, remainder,
    * partial-epoch threshold) from the corpus's per-domain counts —
    * the aggregate half of the pipe, split out so a STREAM can apply
    * [[expand]] against a plan built once from the static corpus
    * (per-domain counts are corpus statistics, known to the planner up
    * front — the same premise as the decontamination eval literal).
    */
  def quotaPlan(df: DataFrame, domainCol: String,
      weights: Seq[(String, Long)], budget: Long,
      maxRepeat: Int, sizeCol: Option[String] = None): DataFrame =
    quotaPlanFromCounts(domainCounts(df, domainCol, sizeCol), weights,
      budget, maxRepeat)

  /** [[quotaPlan]] over an already-computed [[domainCounts]] frame. */
  def quotaPlanFromCounts(counts: DataFrame,
      weights: Seq[(String, Long)], budget: Long,
      maxRepeat: Int): DataFrame = {
    val sumW = weights.map(w => BigInt(w._2)).sum
    // budget·w/Σw in BigInt — exact for any (budget, weight) config
    val needed = typedLit(weights.map { case (d, w) =>
      d -> (BigInt(budget) * w / sumW).toLong
    }.toMap)
    counts
      // a zero/negative total (possible only under sizeCol: all-null or
      // degenerate sizes) has nothing to account — drop it BEFORE the
      // divisions below rather than divide by zero
      .filter(col("__mx_n__") > 0)
      .withColumn("__mx_need__", element_at(needed, col("__mx_d__")))
      // unlisted (weight-0) domains and null domains drop here
      .filter(col("__mx_need__").isNotNull)
      // the cap product in DECIMAL too: a BIGINT n·maxRepeat wraps
      // negative past S_d ≈ 9.2e18/maxRepeat summed size units and the
      // wrapped least() would silently DROP the domain; the final cap
      // ≤ needed always fits a long
      .withColumn("__mx_cap__",
        least(col("__mx_need__").cast("decimal(38,0)"),
          expr(s"CAST(__mx_n__ AS DECIMAL(38,0)) * $maxRepeat"))
          .cast("long"))
      // capped = 0 emits nothing — filtered BEFORE expand's sequence so
      // its end bound is always >= 1 (sequence(1, 0) would DESCEND)
      .filter(col("__mx_cap__") > 0)
      .withColumn("__mx_fe__", expr("__mx_cap__ div __mx_n__"))
      .withColumn("__mx_rem__", pmod(col("__mx_cap__"), col("__mx_n__")))
      // rem·P div n: DECIMAL(38,0) product — BIGINT wraps past n ≈ 4.3e9
      .withColumn("__mx_thr__",
        expr(s"(CAST(__mx_rem__ AS DECIMAL(38,0)) * $P) div __mx_n__"))
      .select("__mx_d__", "__mx_fe__", "__mx_rem__", "__mx_thr__")
  }

  /** The map-only half: replicate each row of `df` per the standing
    * quota plan — broadcast join + bounded explode (≤ maxRepeat+1) +
    * the quadratic-M31 partial-epoch filter. STATELESS, so it runs
    * unchanged on a streaming frame in append mode (stream-static
    * broadcast join; every arriving row emits its copies exactly once).
    */
  def expand(df: DataFrame, plan: DataFrame, idCol: String,
      domainCol: String, seed: Long, epochCol: String): DataFrame = {
    // loud refusal on name collisions (ADVICE r18): a pre-existing
    // epochCol would be silently OVERWRITTEN by the explode (user data
    // lost), and an input column named like the internal plan columns
    // would make the join/drop ambiguous — both are config errors, not
    // things to paper over. Matching follows the session's resolution
    // rule (case-INsensitive by default): withColumn("epoch") replaces a
    // column named "Epoch" just the same, so a == check would miss the
    // exact overwrite this guard exists to refuse.
    val caseSensitive = df.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val reserved = epochCol +: plan.columns.toSeq
    val clash = df.columns.filter(c => reserved.exists(r =>
      if (caseSensitive) r == c else r.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"DomainMixturePipe: input columns [${clash.mkString(", ")}] collide " +
        s"with the emitted epoch column '$epochCol' or the internal " +
        "__mx_* plan columns — rename them (or pass a different epochCol)")
    // epochs 1..fe, plus the partial epoch fe+1 only when rem > 0
    val end = (col("__mx_fe__") +
      when(col("__mx_rem__") > 0, 1L).otherwise(0L)).cast("int")
    val slot = WeightedSamplePipe.quadraticSlotM31(
      qcol(idCol).cast("long") * 131 + seed + col(epochCol) * 7919)
    df.join(broadcast(plan), qcol(domainCol) === col("__mx_d__"))
      .withColumn(epochCol, explode(sequence(lit(1), end)))
      .filter(col(epochCol) <= col("__mx_fe__") || slot < col("__mx_thr__"))
      .drop("__mx_d__", "__mx_fe__", "__mx_rem__", "__mx_thr__")
  }
}
