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

  test("compaction steers file count by the plan's size estimate") {
    // ~100 rows x ~1 KB, shattered over 16 partitions; a small byte
    // target must REDUCE the file count to ceil(bytes/target) and the
    // rewrite must preserve content exactly
    val df = spark.range(100).repartition(16)
      .select(col("id"), concat_ws("", array_repeat(lit("x"), 1000)).as("pad"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (bytes / BigInt(4)).toLong + 1
    val n = Formats.writeCompacted(df, s"$tmp/k", target)
    assert(n >= 2 && n <= 5, s"expected ~4 files, got $n (est $bytes)")
    val files = new java.io.File(s"$tmp/k").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == n, s"wrote $files files, planned $n")
    val back = spark.read.parquet(s"$tmp/k")
    assert(back.count() == 100 && back.agg(sum("id")).head().getLong(0) == 4950)
  }

  test("compaction floors at one file for tiny frames") {
    val df = Seq((1L, "a")).toDF("id", "s")
    assert(Formats.writeCompacted(df, s"$tmp/one") == 1)
  }
}
