package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[AsOfJoin.backward]] equals a scala-side argmax oracle
  * on RANDOM key/timestamp data — dense ts collisions (left==right ts,
  * right==right ts), keys missing on either side, empty sides.
  * Generalizes the fixed cases in [[AsOfJoinSpec]].
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id) triples; oracle match = max visible right by (ts, eid)
  private def oracle(ls: Seq[(String, Long, Long)],
      rs: Seq[(String, Long, Long)]): Map[Long, (Option[Long], Long)] =
    ls.map { case (lk, lt, lid) =>
      val vis = rs.filter { case (rk, rt, _) => rk == lk && rt <= lt }
      val best = if (vis.isEmpty) None
        else Some(vis.maxBy { case (_, rt, eid) => (rt, eid) }._3)
      lid -> (best, vis.size.toLong)
    }.toMap

  test("backward as-of == argmax oracle on random dense-tie data") {
    // small ts/key domains force heavy collisions — the hard cases
    val genL = Gen.listOfN(40, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 12L)
    } yield (k, t))
    val genR = Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.choose(0L, 12L)
    } yield (k, t))
    for (caseNo <- 0 until 8) {
      val seed = Seed(4242L + caseNo)
      val lraw = genL.pureApply(Gen.Parameters.default, seed)
      val rraw = genR.pureApply(Gen.Parameters.default, seed.next)
      val ls = lraw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = rraw.zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val out = AsOfJoin.backward(ls.toDF("key", "ts", "lid"),
        rs.toDF("key", "ts", "eid"),
        Seq("key"), "ts", "ts", Seq("eid"))
        .select("lid", "asof_eid", "asof_n_prior")
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2)))
        .toMap
      val exp = oracle(ls, rs)
      assert(out == exp, s"case $caseNo diverged")
    }
    // degenerate sides
    val empty = AsOfJoin.backward(
      Seq(("a", 1L, 1L)).toDF("key", "ts", "lid"),
      Seq.empty[(String, Long, Long)].toDF("key", "ts", "eid"),
      Seq("key"), "ts", "ts", Seq("eid"))
    assert(empty.count() == 1 && empty.select("asof_n_prior")
      .as[Long].head() == 0L)
  }
}
