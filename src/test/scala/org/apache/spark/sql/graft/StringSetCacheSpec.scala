package org.apache.spark.sql.graft

import graft.SparkSpec

/** The executor-side built-set cache must evict by LRU, not wholesale:
  * a multi-tenant decontamination service rotating through more than
  * [[StringSetCountExpr.MaxCachedSets]] eval corpora should rebuild one
  * set per rotation, not all of them (the r18 verdict's clear-all
  * thrash).
  */
class StringSetCacheSpec extends SparkSpec {

  test("a 9th distinct broadcast evicts only the LRU set, hot sets stay built") {
    val sc = spark.sparkContext
    val bs = (0 until 9).map(i => sc.broadcast(Array(s"key-$i")))
    // build the first 8 — the cache is exactly these after the inserts
    // (any earlier tests' entries age out as these go in)
    val built = bs.take(8).map(StringSetCountExpr.setFor)
    // 9th distinct broadcast: evicts ONLY the least-recently-used
    // (bs(0), untouched since its build)
    StringSetCountExpr.setFor(bs(8))
    (1 until 8).foreach { i =>
      assert(StringSetCountExpr.setFor(bs(i)) eq built(i),
        s"set $i was rebuilt — eviction must hit only the LRU entry")
    }
    // the evicted set rebuilds on demand (a re-hash, not a failure) with
    // the same membership
    val again = StringSetCountExpr.setFor(bs(0))
    assert(!(again eq built(0)) &&
      again.contains(org.apache.spark.unsafe.types.UTF8String.fromString("key-0")))
    bs.foreach(_.destroy())
  }
}
