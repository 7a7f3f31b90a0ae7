package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interchange formats: round-trips must be bit-exact with pinned
  * schemas (the JSONL gate io_jsonl_roundtrip covers the cross-engine
  * side; these specs cover quoting/escaping edge content).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("fmt").toString

  test("jsonl round-trips newline/quote-laden text exactly") {
    val df = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two"),
      (3L, "quotes \" and commas, and \\ backslashes"),
      (4L, "")).toDF("id", "text")
    Formats.writeJsonl(df, s"$tmp/j")
    val back = Formats.readJsonl(spark, s"$tmp/j", df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("csv round-trips quoted content exactly with the pinned dialect") {
    val df = Seq(
      (1L, "plain"),
      (2L, "comma, semicolon; pipe|"),
      (3L, "embedded \"quotes\" here"),
      (4L, "line\nbreak")).toDF("id", "text")
    Formats.writeCsv(df, s"$tmp/c")
    // empty string reads back as null in Spark CSV — normalize that one
    // documented dialect wart, everything else must round-trip exactly
    val back = Formats.readCsv(spark, s"$tmp/c", df.schema)
      .withColumn("text", coalesce(col("text"), lit("")))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
