package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins and aggregations.
  *
  * A single hot key (one language, one null-ish default, one celebrity
  * user) lands its entire partition on one task; AQE's skew-join split
  * handles the SORT side but cannot split a hash aggregate's hot group or
  * a broadcast-ineligible build side. Salting shards the hot key into
  * `saltFactor` synthetic sub-keys: the skewed side gets a uniform salt
  * per ROW, the other side is replicated once per salt value, and the
  * join key becomes (key, salt) — load spreads by construction, at the
  * cost of replicating the small side saltFactor times (keep it the
  * dimension side).
  */
object Salting {

  private val SaltCol = "__salt__"

  /** Join `skewed` (salted per row) with `dim` (replicated per salt) on
    * `key`. Result == skewed.join(dim, key) row-for-row; only the
    * partitioning changes.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, on: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic-enough uniform salt: hash of a per-row unique id.
    // (rand() would also work; the id hash keeps a row's salt stable
    // within the query, which retries/speculative tasks require)
    val salted = skewed.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val replicated = dim.withColumn(SaltCol,
      explode(typedLit((0L until saltFactor.toLong).toSeq)))
    salted.join(replicated, on :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-phase aggregation for a skewed groupBy: partial-aggregate on
    * (keys, salt), then merge on keys. `aggs` maps column -> one of
    * sum/count/min/max (the decomposable aggregates: sum of sums, sum of
    * counts, min of mins, max of maxes). Spark's map-side partial
    * aggregation already covers most skew; use this when a hot KEY
    * overwhelms even the single reducer that merges its partials
    * (billions of rows under one group).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
      aggs: Map[String, String], saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = df.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val partials = aggs.toSeq.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "count") => count(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, fn) => throw new IllegalArgumentException(
        s"saltedAgg: '$fn' on '$c' is not decomposable (sum/count/min/max)")
    }
    val merged = aggs.toSeq.map {
      case (c, "count") => sum(col(c)).as(c) // counts merge by summing
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, _) => sum(col(c)).as(c)
    }
    salted
      .groupBy((keys.map(col) :+ col(SaltCol)): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }
}
