package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats: hand-computed fractions on known texts") {
    val df = Seq((1L, "a a b"), (2L, "x y x y x"), (3L, "solo")).toDF("doc_id", "text")
    val out = RepetitionStatsPipe("text")(df).orderBy("doc_id")
      .select("doc_id", "dup_token_frac", "top_bigram_frac", "dup_bigram_frac")
      .collect()
    // "a a b": 3 toks 2 distinct -> 0.3333; bigrams [a a, a b] runs 1,1
    assert(out(0) == Row(1L, 0.3333, 0.5, 0.0))
    // "x y x y x": 5 toks 2 distinct; bigrams {x y:2, y x:2} -> top 0.5, dup 1.0
    assert(out(1) == Row(2L, 0.6, 0.5, 1.0))
    // single token: no bigrams, all zero
    assert(out(2) == Row(3L, 0.0, 0.0, 0.0))
  }

  test("decontaminate flags shared n-grams and drop mode removes them") {
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "entirely different content here now")).toDF("doc_id", "text")
    val flagged = DecontaminatePipe(eval, "text", "doc_id", ngramSize = 3)(train)
      .orderBy("doc_id").select("doc_id", "contaminated").collect()
    assert(flagged.toSeq == Seq(Row(1L, true), Row(2L, false)))
    val dropped = DecontaminatePipe(eval, "text", "doc_id", ngramSize = 3,
      flagOnly = false)(train)
    assert(dropped.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("pii redaction counts and masks all three default families") {
    val df = Seq((1L, "mail a@b.co or x.y@mail.org call 555-1234 ip 10.1.2.3"),
      (2L, "clean text")).toDF("doc_id", "text")
    val out = PiiRedactPipe("text")(df).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted").collect()
    assert(out(0) == Row(1L, 2, 1, 1,
      "mail <EMAIL> or <EMAIL> call <PHONE> ip <IP>"))
    assert(out(1) == Row(2L, 0, 0, 0, "clean text"))
  }

  test("stratified sample: rate bounds, determinism, and group isolation") {
    val docs = spark.read.parquet(sf("documents"))
    val p = StratifiedSamplePipe("doc_id", "lang", Seq("en" -> 0.0), defaultRate = 1.0)
    val out = p(docs)
    assert(out.filter(col("lang") === "en").count() == 0)
    // groups not named keep the default rate (here: everything survives)
    assert(out.count() == docs.filter(col("lang") =!= "en").count())
    // engine-reproducible: two runs select the identical row set
    val a = StratifiedSamplePipe("doc_id", "lang", Seq("en" -> 0.4), 0.5)(docs)
    val b = StratifiedSamplePipe("doc_id", "lang", Seq("en" -> 0.4), 0.5)(docs)
    assert(a.select("doc_id").except(b.select("doc_id")).count() == 0)
    assert(a.count() == b.count())
    assertThrows[IllegalArgumentException] {
      StratifiedSamplePipe("doc_id", "lang", Seq("en" -> 1.5))
    }
  }
}
