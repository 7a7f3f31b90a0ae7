package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH-bucketed retrieval: bucket-mate candidate semantics, self-match,
  * agreement with the dedup family's SRP signatures, and state reload.
  */
class LSHSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(sf("embeddings"))
    .select(col("vec_id").as("idx"), col("embedding").as("vector"))

  private val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
    queryIdCol = Some("qid"))

  private def queries(n: Int) = spark.read.parquet(sf("embeddings"))
    .filter(col("vec_id") < n)
    .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))

  test("every query self-matches at rank 1 (identical signature shares all bands)") {
    val out = LSHDenseEngine(corpus, config = cfg)(queries(6))
      .select(col("qid").cast("long"), element_at(col("`index.idx`"), 1))
      .as[(Long, Long)].collect()
    out.foreach { case (qid, top) => assert(top == qid) }
  }

  test("addVectors equals a full build exactly (no quantizer to pin)") {
    val base = LSHDenseEngine(corpus.filter(col("idx") % 3 =!= 0), config = cfg)
    val grown = base.addVectors(corpus.filter(col("idx") % 3 === 0))
    val whole = LSHDenseEngine(corpus, config = cfg)
    def out(e: SearchEngine) = e(queries(8))
      .select(col("qid"), col("`index.idx`"),
        transform(col("`index.score`"), v => round(v, 9)).as("s"))
      .orderBy("qid").collect().map(_.toString).toSeq
    assert(out(grown) == out(whole))
    // chained: a second add still equals the whole build
    val base2 = LSHDenseEngine(corpus.filter(col("idx") % 3 === 1), config = cfg)
    val chained = base2.addVectors(corpus.filter(col("idx") % 3 === 2))
      .addVectors(corpus.filter(col("idx") % 3 === 0))
    assert(out(chained) == out(whole))
    // stateDir add without a fresh fingerprint is refused
    val dir = java.nio.file.Files.createTempDirectory("lsh-addfp").toString
    val withState = LSHDenseEngine(corpus.filter(col("idx") % 3 =!= 0),
      config = cfg, stateDir = Some(dir), corpusFingerprint = "lsh-add-base")
    intercept[IllegalArgumentException] {
      withState.addVectors(corpus.filter(col("idx") % 3 === 0))
    }
  }

  test("removeVectors equals a full build over the survivors exactly") {
    def out(e: SearchEngine) = e(queries(8))
      .select(col("qid"), col("`index.idx`"),
        transform(col("`index.score`"), v => round(v, 9)).as("s"))
      .orderBy("qid").collect().map(_.toString).toSeq
    val removed = LSHDenseEngine(corpus, config = cfg)
      .removeVectors(col("idx") % 4 === 1)
    val survivors = LSHDenseEngine(corpus.filter(col("idx") % 4 =!= 1),
      config = cfg)
    assert(out(removed) == out(survivors))
    // add-then-remove composes, still ≡ the survivors build
    val composed = LSHDenseEngine(corpus.filter(col("idx") % 3 =!= 0),
      config = cfg)
      .addVectors(corpus.filter(col("idx") % 3 === 0))
      .removeVectors(col("idx") % 4 === 1)
    assert(out(composed) == out(survivors))
    // stateDir removal demands a fresh fingerprint
    val dir = java.nio.file.Files.createTempDirectory("lsh-rmfp").toString
    val withState = LSHDenseEngine(corpus, config = cfg,
      stateDir = Some(dir), corpusFingerprint = "lsh-rm-base")
    intercept[IllegalArgumentException] {
      withState.removeVectors(col("idx") === 0)
    }
  }

  test("a near-duplicate of a corpus vector is retrieved as a bucket-mate") {
    // perturb vector 3 far below the quantization that flips sign bits:
    // its signature equals vector 3's, so every band collides and the
    // exact-dot ranking puts vec 3 at the top
    val qv = spark.read.parquet(sf("embeddings")).filter(col("vec_id") === 3)
      .select(lit(99999L).as("qid"),
        transform(col("embedding"), v => v + lit(1e-6f)).as("query.vector"))
    val out = LSHDenseEngine(corpus, config = cfg)(qv)
      .select(element_at(col("`index.idx`"), 1)).head.getLong(0)
    assert(out == 3L)
  }

  test("candidates are exactly the band bucket-mates of the dedup-family signature") {
    val eng = LSHDenseEngine(corpus, config = cfg)
    // independent signature recomputation with the documented formula
    // (shared with SRPCosineDedupPipe) diffed against the engine state
    val dim = 64
    val planes = Seq.tabulate(48)(b =>
      Seq.tabulate(dim)(t => (((b * 37 + t * 11) % 21) - 10) / 10.0))
    val sigExpr = (0 until 48).map { b =>
      val dot = aggregate(
        zip_with(transform(col("vector"), _.cast("double")),
          typedLit(planes(b)), (x, p) => x * p),
        lit(0d), (acc, x) => acc + x)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val expected = corpus.select(col("idx").cast("long").as("idx"),
      sigExpr.as("sg"))
    val diff = eng.signatures.as("a").join(expected.as("b"), "idx")
      .filter(col("a.sg") =!= col("b.sg")).count()
    assert(diff == 0)
  }

  test("a query vector of the wrong length fails loudly, never silently truncates") {
    val badQ = spark.read.parquet(sf("embeddings")).filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"),
        slice(col("embedding"), 1, 10).as("query.vector"))
    val e = intercept[Exception] {
      LSHDenseEngine(corpus, config = cfg)(badQ).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("query vector length")), e.toString)
  }

  test("an empty corpus fails with a readable message, not NoSuchElementException") {
    val e = intercept[RuntimeException] {
      LSHDenseEngine(corpus.filter(col("idx") < 0), config = cfg)(queries(2))
        .collect()
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("changing only k (or bands) reuses the SAME persisted signature state") {
    // k and bands are query-time knobs: the signature cache must not fork
    // per value (r9 advice) — one state entry serves them all
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-key").toString
    val fp = "lshspec-kinv"
    LSHDenseEngine(corpus, config = cfg.copy(k = 5), stateDir = Some(dir),
      corpusFingerprint = fp).signatures.count()
    LSHDenseEngine(corpus, config = cfg.copy(k = 10), stateDir = Some(dir),
      corpusFingerprint = fp).signatures.count()
    LSHDenseEngine(corpus, bands = 3, config = cfg, stateDir = Some(dir),
      corpusFingerprint = fp).signatures.count()
    val entries = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(entries.length == 1, entries.map(_.getName).mkString(","))
    // while nBits IS build-affecting and must fork
    LSHDenseEngine(corpus, nBits = 24, bands = 3, config = cfg,
      stateDir = Some(dir), corpusFingerprint = fp).signatures.count()
    assert(new java.io.File(dir).listFiles().count(_.isDirectory) == 2)
  }

  test("persisted signatures reload into a fresh engine with equal results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-state").toString
    val fp = "lshspec-corpus"
    val a = LSHDenseEngine(corpus, config = cfg, stateDir = Some(dir),
      corpusFingerprint = fp)
    val ra = a(queries(5)).select(col("qid").cast("long"), col("`index.idx`"))
      .as[(Long, Seq[Long])].collect().toMap
    val b = LSHDenseEngine(corpus, config = cfg, stateDir = Some(dir),
      corpusFingerprint = fp)
    val rb = b(queries(5)).select(col("qid").cast("long"), col("`index.idx`"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(ra == rb)
  }

  test("multi-probe widens the candidate set without touching the index") {
    def retrieved(p: Int): Map[Long, Set[Long]] =
      // k above the corpus size: top-k truncation must not hide the
      // candidate-superset property being asserted
      LSHDenseEngine(corpus, probes = p, config = cfg.copy(k = 2000))(queries(8))
        .select(col("qid").cast("long"), col("`index.idx`"))
        .as[(Long, Seq[Long])].collect().toMap
        .map { case (q, is) => q -> is.filter(_ >= 0).toSet }
    val base = retrieved(0)
    val probed = retrieved(2)
    // probes=0 must reproduce the plain engine; probed is a superset per query
    base.foreach { case (q, s0) =>
      assert(s0.subsetOf(probed(q)), s"query $q lost candidates under probing")
    }
    assert(probed.values.map(_.size).sum > base.values.map(_.size).sum,
      "probing added no candidates anywhere — not exercising the probe path")
  }

  test("probes beyond the band width are rejected") {
    intercept[IllegalArgumentException] {
      LSHDenseEngine(corpus, nBits = 48, bands = 6, probes = 9, config = cfg)
    }
  }

  test("wide 120-bit signatures: self-match, near-dup bucket-mate, multiprobe superset") {
    val weng = LSHDenseEngine(corpus, nBits = 120, bands = 6, config = cfg)
    // identical signature at ANY width shares all bands -> self at rank 1
    val out = weng(queries(6))
      .select(col("qid").cast("long"), element_at(col("`index.idx`"), 1))
      .as[(Long, Long)].collect()
    out.foreach { case (qid, top) => assert(top == qid, s"query $qid") }
    // a sub-quantization perturbation keeps every sign bit -> still found
    val qv = spark.read.parquet(sf("embeddings")).filter(col("vec_id") === 3)
      .select(lit(99999L).as("qid"),
        transform(col("embedding"), v => v + lit(1e-6f)).as("query.vector"))
    assert(weng(qv).select(element_at(col("`index.idx`"), 1)).head.getLong(0) == 3L)
    // multiprobe stays a candidate superset in the wide layout
    def retrieved(p: Int): Map[Long, Set[Long]] =
      LSHDenseEngine(corpus, nBits = 120, bands = 6, probes = p,
        config = cfg.copy(k = 2000))(queries(6))
        .select(col("qid").cast("long"), col("`index.idx`"))
        .as[(Long, Seq[Long])].collect().toMap
        .map { case (q, is) => q -> is.filter(_ >= 0).toSet }
    val base = retrieved(0); val probed = retrieved(2)
    base.foreach { case (q, s0) =>
      assert(s0.subsetOf(probed(q)), s"query $q lost candidates under probing") }
  }

  test("wide signature words carry the exact narrow bits (prefix parity)") {
    // the first 60 bits of the 120-bit layout equal the 60-bit narrow
    // signature built from the same hyperplanes: word 0 of wide == narrow
    val narrow = LSHDenseEngine(corpus, nBits = 60, bands = 6, config = cfg)
      .signatures.select(col("idx"), col("sg").as("n"))
    val wide = LSHDenseEngine(corpus, nBits = 120, bands = 6, config = cfg)
      .signatures.select(col("idx"), element_at(col("sg"), 1).as("w0"))
    val diff = narrow.join(wide, "idx").filter(col("n") =!= col("w0")).count()
    assert(diff == 0)
  }

  test("wide word packing matches an independent formula recomputation (dedup-layout parity)") {
    // The engine's wide packing is documented as byte-identical to
    // SRPCosineDedupPipe's 60-bit-word layout; nothing shares the code,
    // so this pins BOTH to the formula: word w bit (b - 60w) = sign of
    // plane-b dot, planes (((b*37 + t*11) mod 21) - 10)/10.
    val dim = 64
    val planes = Seq.tabulate(120)(b =>
      Seq.tabulate(dim)(t => (((b * 37 + t * 11) % 21) - 10) / 10.0))
    def dotBit(b: Int) = aggregate(
      zip_with(transform(col("vector"), _.cast("double")),
        typedLit(planes(b)), (x, p) => x * p),
      lit(0d), (acc, x) => acc + x)
    val expected = corpus.select(col("idx").cast("long").as("idx"),
      array((0 until 2).map { w =>
        (w * 60 until (w + 1) * 60).map { b =>
          when(dotBit(b) > 0, lit(1L << (b - w * 60))).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*).as("sg"))
    val eng = LSHDenseEngine(corpus, nBits = 120, bands = 6, config = cfg)
    val diff = eng.signatures.as("a").join(expected.as("b"), "idx")
      .filter(col("a.sg") =!= col("b.sg")).count()
    assert(diff == 0)
  }

  test("registry threads the LSH layout: explicit bits, bands, and auto sizing") {
    val wide = AutoSearchEngine("dense_lsh", corpus, cfg,
      Map("lshBits" -> "120", "lshBands" -> "6"))
      .asInstanceOf[LSHDenseEngine]
    assert(wide.nBits == 120 && wide.bands == 6)
    // auto on the small spec corpus picks the narrow floor (occupancy <= 1)
    val auto = AutoSearchEngine("dense_lsh", corpus, cfg,
      Map("lshBits" -> "auto")).asInstanceOf[LSHDenseEngine]
    assert(auto.nBits == 60 && auto.bands == 6)
    // default unchanged (existing oracles/caches)
    val dflt = AutoSearchEngine("dense_lsh", corpus, cfg)
      .asInstanceOf[LSHDenseEngine]
    assert(dflt.nBits == 48 && dflt.bands == 6)
    // the wide registry engine actually answers
    val out = wide(queries(3))
      .select(col("qid").cast("long"), element_at(col("`index.idx`"), 1))
      .as[(Long, Long)].collect()
    out.foreach { case (qid, top) => assert(top == qid) }
  }

  test("sized() picks the wide layout at 200k and an invalid layout is impossible") {
    val e = LSHDenseEngine.sized(corpus, corpusCount = 200000L)
    assert(e.nBits == 120 && e.bands == 6)
    val small = LSHDenseEngine.sized(corpus, corpusCount = 500L)
    assert(small.nBits == 60 && small.bands == 6)
    intercept[IllegalArgumentException] {
      LSHDenseEngine(corpus, nBits = 128, bands = 8, config = cfg) // r=16, 60%16!=0
    }
  }
}
