package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(urls: (Long, String)*) =
    UrlCanonicalizePipe("url")(urls.toDF("id", "url"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r).toMap

  test("canonicalization: case, ports, fragments, tracker params, order") {
    val rows = run(
      1L -> "HTTP://Ex.COM:80/Path/a?utm_source=n&b=2&a=1&fbclid=x#frag",
      2L -> "http://ex.com/Path/a?a=1&b=2",
      3L -> "https://Ex.com:443/",
      4L -> "https://ex.com:8443/x?gclid=1",
      5L -> "ftp://Host.Net:80/file",
      6L -> "http://ex.com",
      7L -> "not a url at all",
      8L -> null,
      9L -> "http://ex.com/p?utm_a=1&utm_b=2&mc_eid=3&msclkid=4")

    // 1 and 2 collapse to the same canonical form
    assert(rows(1L).getAs[String]("url_canonical") ==
      "http://ex.com/Path/a?a=1&b=2")
    assert(rows(2L).getAs[String]("url_canonical") ==
      "http://ex.com/Path/a?a=1&b=2")
    assert(rows(1L).getAs[String]("url_host") == "ex.com")

    assert(rows(3L).getAs[String]("url_canonical") == "https://ex.com/")
    // non-default port survives; host strips it
    assert(rows(4L).getAs[String]("url_canonical") == "https://ex.com:8443/x")
    assert(rows(4L).getAs[String]("url_host") == "ex.com")
    // :80 is only default for http — ftp keeps it
    assert(rows(5L).getAs[String]("url_canonical") == "ftp://host.net:80/file")
    // empty path defaults to /
    assert(rows(6L).getAs[String]("url_canonical") == "http://ex.com/")
    // all params tracked away -> no ?
    assert(rows(9L).getAs[String]("url_canonical") == "http://ex.com/p")

    for (id <- Seq(7L, 8L)) {
      assert(rows(id).getAs[String]("url_canonical") == null)
      assert(rows(id).getAs[String]("url_host") == null)
      assert(!rows(id).getAs[Boolean]("url_valid"))
    }
  }

  test("graft_url_canonical SQL front end equals the pipe column") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val docs = spark.read.parquet(sf("documents"))
      .withColumn("url", when(col("doc_id") % 9 === 0, lit("nope"))
        .otherwise(concat(lit("HTTPS://H"), col("doc_id") % 5,
          lit(".com:443/p?b=2&utm_x=1&a=1#z"))))
    docs.createOrReplaceTempView("url_sql_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_url_canonical(url) AS c FROM url_sql_docs")
    val viaPipe = UrlCanonicalizePipe("url")(docs)
      .select(col("doc_id"), col("url_canonical").as("c"))
    assert(viaSql.except(viaPipe).count() == 0)
    assert(viaPipe.except(viaSql).count() == 0)
  }

  test("map-only plan and row preservation over real data") {
    val docs = spark.read.parquet(sf("documents"))
      .withColumn("url", concat(lit("http://h"), col("doc_id") % 5,
        lit(".com/p?b=2&utm_x=1&a=1")))
    val out = UrlCanonicalizePipe("url")(docs)
    assert(out.count() == docs.count())
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val c = out.select("url_canonical").distinct().collect().map(_.getString(0))
    assert(c.toSet == (0 until 5).map(i => s"http://h$i.com/p?a=1&b=2").toSet)
  }
}
