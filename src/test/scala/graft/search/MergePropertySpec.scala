package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[SearchResultOps.merge]] equals the dict-based oracle
  * (reference sum_scores semantics, result.py:199-239) on RANDOM ranked
  * lists including -1/-inf padding, duplicate indices across sides, and
  * negative scores. Generalizes the fixed cases in [[SearchSpec]].
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val NegInf = Double.NegativeInfinity

  private def mergeOracle(
      a: (Seq[Long], Seq[Double]), b: (Seq[Long], Seq[Double]))
      : (Seq[Long], Seq[Double]) = {
    def realMin(s: Seq[Double]): Double = {
      val fin = s.filter(_ != NegInf)
      if (fin.isEmpty) 0.0 else fin.min
    }
    val minA = realMin(a._2)
    val minB = realMin(b._2)
    val contrib = a._1.zip(a._2.map(_ - minA)) ++ b._1.zip(b._2.map(_ - minB))
    val uniq = (a._1 ++ b._1).distinct
    val entries = uniq.map { i =>
      val s =
        if (i == -1L) NegInf
        else contrib.collect { case (`i`, v) => v }.sum + minA + minB
      (i, s)
    }
    val sorted = entries.sortBy { case (i, s) => (-s, i) }
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Ranked list: k descending scores over small index space (forces
    * overlaps), with a chance of -1/-inf padding at the tail.
    */
  private val genResult: Gen[(Seq[Long], Seq[Double])] = for {
    k <- Gen.choose(1, 8)
    idxs <- Gen.pick(k, 0L until 20L)
    scores <- Gen.listOfN(k, Gen.choose(-50.0, 50.0))
    pad <- Gen.choose(0, 3)
  } yield {
    val ranked = idxs.toSeq.zip(scores).sortBy(-_._2)
    (ranked.map(_._1) ++ Seq.fill(pad)(-1L),
      ranked.map(_._2) ++ Seq.fill(pad)(NegInf))
  }

  test("merge equals the dict oracle on 200 seeded random ranked-list pairs") {
    val gen = Gen.zip(genResult, genResult)
    val cases = (0 until 200).flatMap { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(cases.size >= 190, "generator should rarely fail")
    val df = cases.map { case (a, b) => (a._1, a._2, b._1, b._2) }
      .toDF("ai", "as", "bi", "bs")
    val (mi, ms) = SearchResultOps.merge(
      col("ai"), col("as"), col("bi"), col("bs"))
    val got = df.select(mi.as("i"), ms.as("s")).collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Double](1)))
    got.zip(cases).foreach { case ((gi, gs), (a, b)) =>
      val (wi, ws) = mergeOracle(a, b)
      assert(gi == wi, s"indices a=$a b=$b got=$gi want=$wi")
      gs.zip(ws).foreach { case (g, w) =>
        assert(g == w || math.abs(g - w) < 1e-9,
          s"scores a=$a b=$b got=$gs want=$ws")
      }
    }
  }
}
