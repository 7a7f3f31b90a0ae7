package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    GopherQualityPipe("text")(texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap

  test("gopher rules: hand-computed counts and per-rule outcomes") {
    val pass = "the and " + Seq.fill(48)("word").mkString(" ") // 50 words
    val short = "the and word" // 3 words
    val bullets = Seq.fill(10)("- the and word ...").mkString("\n")
    val numeric = "the and " + Seq.fill(50)("12345").mkString(" ")
    val rows = run(1L -> pass, 2L -> short, 3L -> bullets, 4L -> numeric,
      5L -> "", 6L -> null)

    val p = rows(1L)
    assert(p.getAs[Long]("n_words") == 50L)
    assert(p.getAs[Long]("sum_word_len") == 3 + 3 + 48 * 4)
    assert(p.getAs[Long]("n_lines") == 1L)
    assert(p.getAs[Long]("distinct_stopwords") == 2L)
    assert(p.getAs[Boolean]("gopher_keep"))

    val s = rows(2L)
    assert(!s.getAs[Boolean]("rule_word_count"))
    assert(s.getAs[Boolean]("rule_mean_word_len")) // 9 <= 10 <= 30
    assert(s.getAs[Boolean]("rule_stopwords"))
    assert(!s.getAs[Boolean]("gopher_keep"))

    // 10 bullet lines of 5 tokens: "-", "the", "and", "word", "..."
    val b = rows(3L)
    assert(b.getAs[Long]("n_words") == 50L)
    assert(b.getAs[Long]("n_lines") == 10L)
    assert(b.getAs[Long]("bullet_lines") == 10L)
    assert(b.getAs[Long]("ellipsis_lines") == 10L)
    assert(b.getAs[Long]("symbol_count") == 10L) // the ten "..."
    assert(b.getAs[Long]("alpha_words") == 30L)  // "-" and "..." aren't
    assert(!b.getAs[Boolean]("rule_bullet_lines"))   // 100 > 90
    assert(!b.getAs[Boolean]("rule_ellipsis_lines")) // 100 > 30
    assert(!b.getAs[Boolean]("rule_symbol_ratio"))   // 100 > 50
    assert(!b.getAs[Boolean]("rule_alpha_words"))    // 150 < 200

    val n = rows(4L)
    assert(n.getAs[Long]("n_words") == 52L)
    assert(n.getAs[Long]("alpha_words") == 2L)
    assert(!n.getAs[Boolean]("rule_alpha_words"))
    assert(n.getAs[Boolean]("rule_mean_word_len")) // 156 <= 256 <= 520

    // empty and null text: split('') = [''] convention — one zero-length
    // word, mean-length rule fails, nothing NULLs out
    for (id <- Seq(5L, 6L)) {
      val e = rows(id)
      assert(e.getAs[Long]("n_words") == 1L)
      assert(e.getAs[Long]("sum_word_len") == 0L)
      assert(!e.getAs[Boolean]("rule_mean_word_len"))
      assert(!e.getAs[Boolean]("gopher_keep"))
    }
  }

  test("graft_gopher_keep SQL front end equals the pipe flag row for row") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val docs = spark.read.parquet(sf("documents"))
    docs.createOrReplaceTempView("gq_sql_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_gopher_keep(text) AS k FROM gq_sql_docs")
    val viaPipe = GopherQualityPipe("text")(docs)
      .select(col("doc_id"), col("gopher_keep").as("k"))
    assert(viaSql.except(viaPipe).count() == 0)
    assert(viaPipe.except(viaSql).count() == 0)
  }

  test("gopher rules over real docs: flags only, rows preserved, map-only plan") {
    val docs = spark.read.parquet(sf("documents"))
    val out = GopherQualityPipe("text")(docs)
    assert(out.count() == docs.count())
    // word-soup docs: single line, no symbols, every word alphabetic
    assert(out.filter(col("n_lines") =!= 1 || col("symbol_count") =!= 0)
      .count() == 0)
    assert(out.filter(!col("rule_alpha_words")).count() == 0)
    // the battery discriminates: some kept, some dropped (word count < 50)
    val kept = out.filter(col("gopher_keep")).count()
    assert(kept > 0 && kept < docs.count())
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
