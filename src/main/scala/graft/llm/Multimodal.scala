package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata structs. The decode kernels are STUBBED
  * with deterministic fakes (the real image/audio libraries are not in
  * this container) — but the Spark-side shape is real: schemas, the
  * per-partition batch iteration (`mapPartitions` — the Scala analogue of
  * the reference ecosystem's `mapInPandas` batch loop), partitioning, and
  * output encoders are all production plumbing a real decoder drops into.
  */
object MultimodalOps {
  /** Metadata struct carried next to every media binary. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))
}

/** Wrap a source column as a media binary + metadata. For the driver
  * fixtures the "media" is the UTF-8 text payload; a real pipeline reads
  * parquet binary columns directly.
  */
case class ToMediaColumnPipe(
    srcCol: String,
    format: String = "utf8-text",
    mediaCol: String = "media",
    metaCol: String = "media_meta") extends Pipe {
  override def update: Boolean = true
  override def params = Map("src" -> srcCol, "format" -> format)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val bin = qcol(srcCol).cast("binary")
    val meta = struct(
      lit(format).as("format"),
      octet_length(bin).cast("long").as("n_bytes"),
      lit(-1).as("width"), lit(-1).as("height"), lit(-1).as("channels"))
    finish(df, Seq(mediaCol -> bin, metaCol -> meta))
  }
}

/** "Decode" a media binary into a fixed-size feature vector via
  * mapPartitions — batch shape identical to a real decoder (iterate the
  * partition, decode each blob, emit features). The decode itself is a
  * DETERMINISTIC FAKE: feature[j] = mean of bytes congruent to j mod dim,
  * scaled — stable across runs/engines, so tests can assert values.
  * Swap `decode` for an actual image/audio kernel to productionize.
  */
case class DecodeMediaStubPipe(
    mediaCol: String,
    idCol: String,
    dim: Int = 8,
    outputCol: String = "media_features") extends Pipe {
  override def params = Map("media" -> mediaCol, "id" -> idCol,
    "dim" -> dim.toString, "out" -> outputCol)

  private[llm] def decode(bytes: Array[Byte]): Array[Double] = {
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val j = i % dim
      sums(j) += (bytes(i) & 0xFF)
      counts(j) += 1
      i += 1
    }
    Array.tabulate(dim)(j => if (counts(j) == 0) 0d else sums(j) / counts(j) / 255d)
  }

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, ArrayType(DoubleType), nullable = false))
    val d = dim
    val decodeFn = decode _
    val out = df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = if (bytes == null) new Array[Double](d) else decodeFn(bytes)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
    out
  }
}

/** Resize a media binary to a fixed byte length by nearest-neighbor
  * resampling — the 1-D stand-in for image resize (out[i] =
  * in[floor(i*n/target)], exact integer arithmetic, deterministic in any
  * engine). Pure binary expressions, map-only; a REAL resampling kernel
  * (PIL/ffmpeg) drops into [[DecodeMediaStubPipe]]'s mapPartitions shape
  * instead — this pipe keeps the schema/meta plumbing honest meanwhile.
  * Emits the resized binary and a refreshed metadata struct.
  */
case class ResizeMediaStubPipe(
    mediaCol: String,
    targetBytes: Int,
    outputCol: String = "media_resized",
    metaCol: String = "resized_meta") extends Pipe {
  require(targetBytes > 0, "targetBytes must be positive")
  override def update: Boolean = true
  override def params = Map("media" -> mediaCol,
    "target" -> targetBytes.toString, "out" -> outputCol, "meta" -> metaCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val bin = qcol(mediaCol)
    val n = octet_length(bin).cast("long")
    val t = lit(targetBytes)
    val tL = lit(targetBytes.toLong)
    // exact floor(i*n/t) in LONG then DECIMAL arithmetic: i and n are both
    // < 2^31 so the widened product fits a long (the previous int×int
    // product wrapped silently past 2^31 — media larger than
    // ~2GB/targetBytes bytes resampled from garbage positions); the
    // exactly-divisible numerator is divided as decimal(38,0) because
    // long/long Column division is DOUBLE arithmetic, inexact past 2^53
    def fdiv(x: org.apache.spark.sql.Column) =
      ((x - pmod(x, tL)).cast("decimal(38,0)") / tL.cast("decimal(38,0)"))
        .cast("int")
    val pieces = org.apache.spark.sql.functions.transform(
      sequence(lit(0), t - 1), i => bin.substr(fdiv(i.cast("long") * n) + 1, lit(1)))
    val resized = when(n > 0,
      aggregate(pieces, lit(Array.empty[Byte]),
        (acc, x) => concat(acc, x)))
      .otherwise(lit(Array.empty[Byte]))
    // the per-byte resample HOF is interpreted — widen past narrow scans
    val wide = graft.core.Pipe.widen(df)
    val meta = struct(
      lit("resized").as("format"),
      octet_length(resized).cast("long").as("n_bytes"),
      lit(targetBytes).as("width"), lit(1).as("height"), lit(1).as("channels"))
    finish(wide, Seq(outputCol -> resized, metaCol -> meta))
  }
}

/** Sample fixed-offset "frames" from a media binary (the video analogue:
  * take every strideBytes-th chunk of chunkBytes) as an array of binary
  * chunks + their offsets. Pure expressions — substring on binary.
  */
case class FrameSamplePipe(
    mediaCol: String,
    chunkBytes: Int = 16,
    strideBytes: Int = 64,
    maxFrames: Int = 8,
    outputCol: String = "frames") extends Pipe {
  override def update: Boolean = true
  override def params = Map("media" -> mediaCol, "chunk" -> chunkBytes.toString,
    "stride" -> strideBytes.toString, "max" -> maxFrames.toString)
  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val bin = qcol(mediaCol)
    val n = octet_length(bin)
    val offsets = slice(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(strideBytes)), 1, maxFrames)
    val frames = org.apache.spark.sql.functions.transform(offsets, off =>
      struct(off.as("offset"), bin.substr(off + 1, lit(chunkBytes)).as("data")))
    finish(df, Seq(outputCol -> frames))
  }
}
