package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity of the codegen'd minhash/shingle kernels against the exact
  * relational (higher-order-function) forms they replaced — the forms
  * the DuckDB oracles replay. Any divergence here is a correctness
  * break, not a performance matter.
  */
class MinhashExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofShingleHashes(text: Column, k: Int): Column = {
    // the pre-r19 relational form, verbatim
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => xxhash64(concat_ws("", slice(toks, i + 1, lit(k))))))
        .otherwise(array(xxhash64(text))))
  }

  private def hofSignature(sh: Column, numHashes: Int): Column = {
    val p = DedupOps.MinhashPrime
    array(DedupOps.minhashCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(sh, x => pmod(pmod(x, lit(p)) * a + b, lit(p))))
    }: _*)
  }

  test("shingleHashes matches the relational form on random texts") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "déjà", "x1", "", "Zz")
    val texts = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    } :+ (900L, "   ") :+ (901L, "one") :+ (902L, "one two") :+
      (903L, "a a a a a") :+ (904L, "\ttab\nsep x y z")
    val df = texts.toDF("id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = df.select($"id", DedupOps.shingleHashes($"text", k).as("s"))
      val want = df.select($"id", hofShingleHashes($"text", k).as("s"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"shingle mismatch at k=$k")
    }
  }

  test("shingleHashes matches on null text") {
    val df = Seq((1L, null: String), (2L, "a b c d")).toDF("id", "text")
    val got = df.select($"id", DedupOps.shingleHashes($"text", 3).as("s")).orderBy("id").collect()
    val want = df.select($"id", hofShingleHashes($"text", 3).as("s")).orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("minhashSignatureLinear matches the relational form") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(20)).map(_ => rnd.nextLong()).toSeq)
    }
    val df = rows.toDF("id", "sh")
    for (nh <- Seq(16, 64)) {
      val got = df.select($"id", DedupOps.minhashSignatureLinear($"sh", nh).as("sig"))
      val want = df.select($"id", hofSignature($"sh", nh).as("sig"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"signature mismatch at numHashes=$nh")
    }
  }

  test("minhashSignatureLinear edge cases: empty, null array, null elements") {
    val df = Seq(
      (1L, Seq.empty[java.lang.Long]),
      (2L, null: Seq[java.lang.Long]),
      (3L, Seq[java.lang.Long](null, 5L, null)),
      (4L, Seq[java.lang.Long](null, null))
    ).toDF("id", "sh")
    val got = df.select($"id", DedupOps.minhashSignatureLinear($"sh", 8).as("sig"))
      .orderBy("id").collect()
    val want = df.select($"id", hofSignature($"sh", 8).as("sig"))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("poly61SigArray matches transform(toks, polySig61) incl. unicode edges") {
    val texts = Seq(
      (1L, Seq("hello", "world", "hello")),
      (2L, Seq("")),                      // empty token: zero-char fold
      (3L, Seq("héllo", "日本語", "a😀b")), // multi-byte + supplementary
      (4L, Seq(null, "x", null)),          // null elements
      (5L, null: Seq[String]),             // null array
      (6L, Seq("a" * 500)),                // long token, many mod steps
      (7L, Seq.empty[String]))
    val df = texts.toDF("id", "toks")
    val got = df.select($"id", DedupOps.poly61SigArray($"toks").as("s"))
      .orderBy("id").collect()
    val want = df.select($"id",
      transform($"toks", t => DedupOps.polySig61(t)).as("s"))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("BM25 punct-strip tokens kernel matches the HOF chain") {
    // the pre-r20 relational form, verbatim
    def hofTokens(text: Column): Column =
      filter(
        transform(split(trim(text), "\\s+"),
          t => regexp_replace(t, lit("[\\p{Punct}]"), lit(""))),
      t => length(t) > 0)
    val texts = Seq(
      (1L, "hello, world! (punct)"),
      (2L, "  leading and trailing  "),
      (3L, "\ttabs\nnewlines\randbody"),
      (4L, "!!! ... ??? --"),              // all-punct tokens drop
      (5L, ""),
      (6L, "   "),
      (7L, null: String),
      (8L, "déjà-vu — em–dash ¿unicode? 日本語。"), // non-ASCII punct KEPT
      (9L, "a_b c'd [e] {f} |g| ~h~ `i` @j #k $l %m ^n &o *p"),
      (10L, "xvertical\ftab"))
    val df = texts.toDF("id", "text")
    val eng = graft.search.BM25Engine(df.limit(0),
      graft.search.SearchConfig(k = 1), corpusIdxCol = "id",
      corpusTextCol = "text")
    val got = df.select($"id", eng.tokens($"text").as("t")).orderBy("id").collect()
    val want = df.select($"id", hofTokens($"text").as("t")).orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("wordNgrams kernel matches the transform/slice/concat_ws chain") {
    // the pre-r20 relational form, verbatim
    def hofNgrams(tokens: Column, n: Int): Column =
      when(size(tokens) >= n,
        transform(sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("one")),                    // shorter than n -> empty
      (3L, Seq("x", null, "y", "z")),      // null tokens: concat_ws skips
      (4L, Seq.empty[String]),
      (5L, null: Seq[String]),             // null array -> empty (otherwise)
      (6L, Seq("", "", "a")),              // empty tokens join to sparse grams
      (7L, (1 to 40).map(i => s"t$i")))
    val df = rows.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = df.select($"id", CurationOps.wordNgrams($"toks", n).as("g"))
        .orderBy("id").collect()
      val want = df.select($"id", hofNgrams($"toks", n).as("g"))
        .orderBy("id").collect()
      assert(got.toSeq == want.toSeq, s"ngram mismatch at n=$n")
    }
  }

  test("map-only poly61 simhash equals the relational per-distinct-token form") {
    // the pre-r20 relational pipeline, verbatim: explode -> distinct
    // dict -> join -> 64 vote aggregates -> power sum
    val rnd = new scala.util.Random(21)
    val words = Vector("alpha", "beta", "gamma", "", "déjà", "x")
    val docs = ((1 to 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    } :+ (900L, null: String) :+ (901L, "") :+ (902L, "   ")).toDF("doc_id", "text")
    val tokArr = split(trim(coalesce($"text", lit(""))), "\\s+")
    val mapOnly = docs.select($"doc_id".as("id"),
      DedupOps.simhash64Fold(DedupOps.poly61SigArray(tokArr)).as("sim"))
    val toks = docs.select($"doc_id".as("id"), explode(tokArr).as("__tok__"))
    val dict = toks.select("__tok__").distinct()
      .withColumn("__sig__", DedupOps.polySig61($"__tok__"))
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftrightunsigned($"__sig__", b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$b"))
    val votes = toks.join(dict, Seq("__tok__")).groupBy($"id")
      .agg(voteCols.head, voteCols.tail: _*)
    val simExpr = (0 until 64).map(b =>
      when(col(s"__v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val relational = votes.select($"id", simExpr.as("sim"))
    assert(mapOnly.exceptAll(relational).isEmpty &&
      relational.exceptAll(mapOnly).isEmpty)
  }
}
