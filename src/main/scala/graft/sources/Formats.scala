package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-format and layout utilities around Spark's native sources. The
  * reference consumes Arrow-backed HF datasets; an engine replacing it
  * must also land/export the interchange formats a data platform feeds
  * it — JSONL in particular is the lingua franca of LLM corpora.
  */
object Formats {

  /** Write a frame as JSON-lines (one object per row, newline-delimited).
    * Column values with newlines are JSON-escaped, so the file stays one
    * record per line regardless of content.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with a PINNED schema. Never let production readers infer:
    * schema inference scans the data once extra and silently widens types
    * (int -> bigint, missing field -> null column) per-run — a pinned
    * StructType makes reads deterministic and one-pass.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with a header and full quoting — for exporting summaries/reports
    * to spreadsheet-world, not for corpus interchange (prefer JSONL or
    * parquet there: CSV has no types and dialects disagree on quoting).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").option("escape", "\"").csv(path)

  /** Read CSV with a PINNED schema (same inference argument as
    * [[readJsonl]]) and the [[writeCsv]] quoting dialect. `multiLine`
    * makes quoted embedded newlines round-trip — the trade is that such
    * files are not line-splittable, one more reason CSV is an export
    * format here, not a corpus format.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("escape", "\"").option("multiLine", "true").csv(path)

  /** ORC with zlib (the format default) — the columnar interchange for
    * Hive-lineage warehouses. Same stance as parquet: typed, splittable,
    * predicate-pushdown-capable; use it when the consuming platform is
    * ORC-native, parquet otherwise.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC with a PINNED schema (same inference argument as
    * [[readJsonl]]; ORC carries types, but pinning still guards against
    * upstream drift widening a column between runs).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write hive-layout partitioned parquet (`path/col=value/...`).
    * Partition columns become directory keys: a downstream read filtered
    * on them prunes entire directories at PLAN time (PartitionFilters in
    * the scan, zero I/O for pruned values) — the first lever for 100 TB
    * corpora (partition by source/date/lang; files within a partition
    * then prune further by min/max stats).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Small-file compaction: write parquet with the file COUNT steered by
    * the optimizer's size estimate — `ceil(plan bytes / targetFileBytes)`
    * round-robin partitions, so a million-file ingest directory rewrites
    * into evenly-sized files and a filter-heavy stage's tiny output
    * doesn't shatter into one file per shuffle partition (the two chronic
    * 100 TB layout failures: too many small files kills the driver's
    * listing and per-task overhead; too few giant files kills read
    * parallelism).
    *
    * `repartition(n)` (a round-robin exchange), deliberately not
    * `coalesce(n)`: coalesce merges whole input partitions and inherits
    * their skew — compaction exists to REMOVE layout skew, which is worth
    * one shuffle of the written bytes. The plan estimate is uncompressed,
    * so actual files land under target — the safe direction (never an
    * unsplittable-row-group monster). Returns the file count chosen.
    */
  def writeCompacted(
      df: DataFrame, path: String, targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((bytes + targetFileBytes - 1) / targetFileBytes).max(1).toInt
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
