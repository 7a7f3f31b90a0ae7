package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contrastive triplet mining for embedding-model training — the
  * training-data side of the reference's retrieval domain: turn a
  * near-duplicate pair list (any `(id_a, id_b)` frame — MinHash-LSH,
  * SimHash, SRP, cross-corpus) into `(anchor_id, pos_id, neg_id)`
  * triplets with a DETERMINISTIC pseudo-random negative per pair.
  *
  * The negative is the corpus member at global rank
  * `(anchor*131 + pos*31 + seed) mod N` (the repo's replayable hash
  * family over the corpus's dense id ranks); if that lands on the anchor
  * or the positive, the next (then next-next) rank cyclically is taken —
  * two blocked values, so three candidates always suffice. No RNG state,
  * no partitioning dependence: the SAME triplets come out on any cluster
  * size, retry, or engine.
  *
  * Scale shape: the corpus ranks come from the scale-safe global rank;
  * candidate resolution is THREE equi-joins of the pair list against the
  * slim (rank, id) projection (pairs are few next to the corpus, AQE
  * broadcasts them); nothing shuffles the corpus beyond its rank build.
  */
case class TripletMiningPipe(
    corpusDf: DataFrame,
    corpusIdCol: String,
    seed: Long = 7L) extends Pipe {
  override def params = Map("corpusId" -> corpusIdCol, "seed" -> seed.toString)

  protected def transform(pairs: DataFrame, ks: Seq[String]): DataFrame = {
    val ranked = graft.pipes.NestingOps.withGlobalRank(
      corpusDf.select(qcol(corpusIdCol).cast("long").as("__tm_cid__")),
      "__tm_cid__", "__tm_rk__")
    val n = ranked.agg(count(lit(1)).as("__tm_n__"))
    val base = pairs.select(col("id_a").cast("long").as("anchor_id"),
      col("id_b").cast("long").as("pos_id"))
      .crossJoin(broadcast(n))
      // lazy guard (no action at plan build): with fewer than 3 corpus
      // rows every cyclic candidate collides with the anchor or positive,
      // so a negative cannot exist — fail loudly instead of emitting junk
      .filter(when(col("__tm_n__") >= 3, lit(true)).otherwise(
        raise_error(concat(lit("TripletMiningPipe: corpus has "),
          col("__tm_n__"),
          lit(" rows < 3 — no valid negative can exist"))).cast("boolean")))
      .withColumn("__tm_s0__",
        pmod(col("anchor_id") * 131 + col("pos_id") * 31 + seed, col("__tm_n__")))
    def cand(i: Int): Column = pmod(col("__tm_s0__") + i, col("__tm_n__"))
    val withCands = (0 until 3).foldLeft(base) { (df, i) =>
      df.join(ranked.select(col("__tm_rk__").as(s"__tm_r$i"),
        col("__tm_cid__").as(s"__tm_c$i")),
        cand(i) === col(s"__tm_r$i"), "left")
        .drop(s"__tm_r$i")
    }
    val c0 = col("__tm_c0"); val c1 = col("__tm_c1"); val c2 = col("__tm_c2")
    val a = col("anchor_id"); val p = col("pos_id")
    withCands
      .withColumn("neg_id",
        when(c0 =!= a && c0 =!= p, c0)
          .when(c1 =!= a && c1 =!= p, c1)
          .otherwise(c2))
      .select("anchor_id", "pos_id", "neg_id")
  }
}
