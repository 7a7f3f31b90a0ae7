package graft.streaming

import graft.SparkSpec
import graft.tools.ScaleData
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression coverage for the r8 fixture-drift breakage: the events
  * reader must adapt to whatever physical `ts` encoding the file carries.
  * Three writers of the SAME logical table — bare INT64 epoch-nanos (the
  * legacy ScaleData replica shape), TIMESTAMP_NTZ micros (the arrow/pandas
  * default the regenerated driver fixtures use), and the session's native
  * TIMESTAMP — must produce identical microsecond values through both
  * `readBatch` and `readStream`.
  */
class EventEncodingSpec extends SparkSpec {
  import spark.implicits._

  // five rows straddling an hour boundary; micros chosen non-round so the
  // exact ns->us truncation (not rounding) is observable
  private val baseMicros = Seq(
    (1L, 1700000000123456L, 10L, "click", 1.5),
    (2L, 1700000001999999L, 10L, "view", 2.5),
    (3L, 1700003600000001L, 11L, "click", 3.5),
    (4L, 1700003661234567L, 11L, "error", 4.5),
    (5L, 1700007199876543L, 12L, "buy", 5.5))

  private def raw: DataFrame =
    baseMicros.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("props", concat(lit("p"), col("event_id")))

  private def writeVariant(name: String, ts: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-enc-$name").toString
    ScaleData.writeSingleFile(spark,
      ts(raw).select("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"$dir/events.parquet")
    dir
  }

  private def microsOf(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sorted.toSeq

  test("readBatch yields identical micros for nanos-long, ntz, and native encodings") {
    val nanosDir = writeVariant("nanos",
      _.withColumn("ts", col("us") * 1000L + 789L).drop("us")) // sub-us dropped by div
    val ntzDir = writeVariant("ntz",
      _.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
        .drop("us"))
    val nativeDir = writeVariant("native",
      _.withColumn("ts", timestamp_micros(col("us"))).drop("us"))

    val expected = baseMicros.map(r => (r._1, r._2))
    assert(microsOf(EventStream.readBatch(spark, nanosDir)) == expected)
    assert(microsOf(EventStream.readBatch(spark, ntzDir)) == expected)
    assert(microsOf(EventStream.readBatch(spark, nativeDir)) == expected)
    // full-row parity across encodings, not just the ts column
    val a = EventStream.readBatch(spark, nanosDir)
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = EventStream.readBatch(spark, ntzDir)
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("the nanos variant really is BARE INT64 (no logical annotation) in the footer") {
    // pin the encoding the 'nanos' variants exercise: a LongType ts column
    // writes as plain INT64 with NO logical-type annotation — i.e. the
    // spec's nanos coverage IS the bare-epoch-long branch of tsEncoding,
    // not the TIMESTAMP(NANOS)-annotated one (r9 verdict item 7)
    val dir = writeVariant("bare",
      _.withColumn("ts", col("us") * 1000L).drop("us"))
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/events.parquet"),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val schema = reader.getFileMetaData.getSchema
      val ts = schema.getType(schema.getFieldIndex("ts"))
      assert(ts.asPrimitiveType().getPrimitiveTypeName ==
        org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
      assert(ts.getLogicalTypeAnnotation == null)
    } finally reader.close()
    assert(microsOf(EventStream.readBatch(spark, dir)) ==
      baseMicros.map(r => (r._1, r._2)))
  }

  test("bare INT64 ts in a non-nanos unit fails LOUDLY instead of silently drifting") {
    // epoch-MICROS written as plain INT64 (~1.7e15, three orders below the
    // nanos floor): the footer-stats magnitude probe must refuse the read
    // and name the unit it looks like — the silent-1000x drift class the
    // r9 advice flagged
    val microsDir = writeVariant("micros", _.withColumn("ts", col("us")).drop("us"))
    val e = intercept[RuntimeException](EventStream.readBatch(spark, microsDir))
    assert(e.getMessage.contains("epoch-MICROS"), e.getMessage)
    val millisDir = writeVariant("millis",
      _.withColumn("ts", (col("us") / 1000L).cast("long")).drop("us"))
    val e2 = intercept[RuntimeException](EventStream.readBatch(spark, millisDir))
    assert(e2.getMessage.contains("epoch-MILLIS"), e2.getMessage)
  }

  test("readStream agrees with readBatch on both drifted encodings") {
    for (dir <- Seq(
        writeVariant("snanos",
          _.withColumn("ts", col("us") * 1000L).drop("us")),
        writeVariant("sntz",
          _.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
            .drop("us")))) {
      val streamed = EventStream.runToMemorySink(
        EventStream.readStream(spark, dir), "append")
      assert(microsOf(streamed) ==
        microsOf(EventStream.readBatch(spark, dir)))
    }
  }
}
