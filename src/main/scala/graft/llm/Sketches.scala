package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg 55(1) 2005) over a
  * hashed key column — the fixed-memory frequency summary that rounds
  * out the repo's sketch family (HLL distinct counts, MinHash/SimHash
  * similarity, Bloom membership, CMS frequency).
  *
  * The sketch is a `depth × width` counter grid kept RELATIONAL — a
  * `(j, bucket, cnt)` frame of at most depth·width rows — so the build
  * is one explode + one map-side-combined groupBy (per-partition hash
  * state ≤ depth·width regardless of input size, shuffle ≤
  * depth·width·partitions rows), and the query side is `depth`
  * BROADCAST joins + `least(...)`: map-only over the probed frame.
  * Estimates are ONE-SIDED: est(x) >= true(x) always (every counter
  * sums a superset); overestimates decay at ~n/width per row of depth.
  *
  * Buckets are affine maps of the key over the M31 modulus (same
  * bounded-arithmetic discipline as [[BloomOps.positions]], independent
  * fixed seed) — deterministic on any cluster size, retry, or engine.
  */
object CountMinOps {
  val P: Long = 2147483647L // M31: every intermediate < 2^63

  /** Fixed-seed (a, b) affine pairs — seed differs from bloomCoeffs and
    * minhashCoeffs so CMS buckets stay independent of both families.
    */
  def coeffs(depth: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0xc3a117e5L)
    (0 until depth).map { _ =>
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong)
    }
  }

  /** Row j's bucket for hash column `h`. */
  def bucket(h: Column, j: Int, depth: Int, width: Int): Column = {
    val (a, b) = coeffs(depth)(j)
    pmod(pmod(pmod(h, lit(P)) * lit(a) + lit(b), lit(P)), lit(width.toLong))
  }

  /** Build the sketch frame `(j, bucket, cnt)` from one row per
    * OCCURRENCE of the key (duplicates are the point — cnt sums them).
    */
  def sketch(occ: DataFrame, hashCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    occ
      .select(posexplode(array((0 until depth).map(j =>
        bucket(qcol(hashCol), j, depth, width)): _*)).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** CMS is a LINEAR sketch: the grid of (corpus A ++ corpus B) is the
    * cell-wise SUM of the two grids. Merging sketch frames is therefore
    * a union + groupBy — the incremental-corpus shape: keep one sketch
    * frame per ingest batch (or per shard), merge on demand, never
    * re-scan old data. Deterministic: merge(sketch(A), sketch(B)) is
    * row-identical to sketch(A ++ B).
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch frame")
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Add `estCol` = the CMS estimate of `hashCol`'s global frequency:
    * `depth` broadcast joins against the sketch frame, `least` across
    * rows. An absent (j, bucket) pair means zero occurrences hashed
    * there, so the estimate coalesces to 0.
    */
  def withEstimate(df: DataFrame, hashCol: String, sketchDf: DataFrame,
      depth: Int, width: Int, estCol: String = "cms_est"): DataFrame = {
    val ests = (0 until depth).foldLeft(df) { (acc, j) =>
      val sk = sketchDf.filter(col("j") === j)
        .select(col("bucket").as(s"__cms_b$j"), col("cnt").as(s"__cms_c$j"))
      acc.join(broadcast(sk),
        bucket(qcol(hashCol), j, depth, width) === col(s"__cms_b$j"), "left")
        .drop(s"__cms_b$j")
    }
    ests.withColumn(estCol,
      least((0 until depth).map(j =>
        coalesce(col(s"__cms_c$j"), lit(0L))): _*))
      .drop((0 until depth).map(j => s"__cms_c$j"): _*)
  }
}

/** Exact heavy-hitter n-grams by the two-pass CMS shape — the 100 TB
  * boilerplate detector: pass 1 builds the fixed-memory sketch over
  * every n-gram occurrence; pass 2 re-derives occurrences, keeps only
  * those whose ESTIMATE reaches `minCount` (map-only vs the broadcast
  * sketch — the one-sided bound guarantees no true heavy hitter is
  * dropped), and exact-counts the survivors. The final `HAVING cnt >=
  * minCount` removes CMS false positives, so the result is EXACTLY the
  * grams occurring >= minCount times — but the exact aggregation's
  * shuffle and state carry only candidate occurrences, not the full
  * gram vocabulary (the part that doesn't fit at 100 TB).
  */
case class HeavyHitterPipe(
    textCol: String,
    ngramSize: Int = 2,
    minCount: Long = 100L,
    depth: Int = 4,
    width: Int = 1 << 16,
    gramCol: String = "gram",
    countCol: String = "n_occurrences") extends Pipe {
  require(minCount >= 1, "minCount must be positive")
  override def params = Map("text" -> textCol, "n" -> ngramSize.toString,
    "min" -> minCount.toString, "depth" -> depth.toString,
    "width" -> width.toString, "gram" -> gramCol, "cnt" -> countCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val occ = HeavyHitterPipe.gramOccurrences(df, textCol, ngramSize, gramCol)
    // the sketch frame is read `depth` times by the estimate joins —
    // materialize once (<= depth*width rows)
    val sk = CountMinOps.sketch(occ, "__hh_h__", depth, width)
      .localCheckpoint(true)
    HeavyHitterPipe.secondPass(occ, sk, minCount, depth, width, gramCol,
      countCol)
  }
}

object HeavyHitterPipe {
  /** One row per n-gram OCCURRENCE: (gram, __hh_h__ = xxhash64(gram)). */
  private[graft] def gramOccurrences(df: DataFrame, textCol: String,
      ngramSize: Int, gramCol: String = "gram"): DataFrame =
    Pipe.widen(df)
      .withColumn("__hh_tk__",
        TextAnalysisOps.toks(coalesce(Pipe.qcol(textCol), lit(""))))
      .select(explode(CurationOps.wordNgrams(col("__hh_tk__"), ngramSize))
        .as(gramCol))
      .withColumn("__hh_h__", xxhash64(Pipe.qcol(gramCol)))

  /** The exact second pass against a PREBUILT sketch (the pipe's own, or
    * one accumulated on the stream by
    * [[graft.streaming.StreamingCountMin]]): estimate-prune occurrences,
    * exact-count survivors, HAVING >= minCount. The sketch only has to
    * be a VALID CMS of a SUPERSET of the occurrences (one-sided
    * estimates only grow), so a stream-accumulated sketch over the same
    * corpus yields exactly the batch result.
    */
  private[graft] def secondPass(occ: DataFrame, sketch: DataFrame,
      minCount: Long, depth: Int, width: Int, gramCol: String,
      countCol: String): DataFrame =
    CountMinOps.withEstimate(occ, "__hh_h__", sketch, depth, width)
      .filter(col("cms_est") >= minCount)
      .groupBy(Pipe.qcol(gramCol))
      .agg(count(lit(1)).as(countCol))
      .filter(col(countCol) >= minCount)

  /** Heavy hitters with an externally-supplied sketch frame. */
  def withSketch(df: DataFrame, sketch: DataFrame, textCol: String,
      ngramSize: Int, minCount: Long, depth: Int, width: Int,
      gramCol: String = "gram",
      countCol: String = "n_occurrences"): DataFrame =
    secondPass(gramOccurrences(df, textCol, ngramSize, gramCol),
      sketch.localCheckpoint(true), minCount, depth, width, gramCol,
      countCol)
}
