package graft.llm

import graft.core.Pipe
import graft.core.Pipe.qcol
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata structs. IMAGE decode and resize are REAL
  * (`javax.imageio` — [[DecodeImagePipe]] / [[ResizeImagePipe]], BMP/PNG/
  * GIF/JPEG per the JDK's ImageIO registry). AUDIO decode and resample
  * are REAL for WAV/PCM and the other `javax.sound.sampled` registry
  * formats ([[DecodeAudioPipe]] / [[ResampleAudioPipe]] — PCM needs no
  * external codec, the parser ships in the JDK). VIDEO has no
  * in-container codec, so the generic byte-level kernels
  * ([[ByteFeaturesPipe]] / [[ResampleBytesPipe]]) stand in for that
  * modality (and arbitrary blobs) with exact, engine-replayable
  * arithmetic. All share the production plumbing: schemas, the
  * per-partition batch iteration (`mapPartitions` — the Scala analogue of
  * the reference ecosystem's `mapInPandas` batch loop), partitioning, and
  * output encoders.
  */
object MultimodalOps {
  /** Metadata struct carried next to every media binary. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** Decoded-image struct: dims + row-major interleaved RGB (0-255 ints,
    * alpha dropped; `channels` reports the SOURCE's bands). Null when the
    * blob is null or no ImageIO reader accepts it.
    */
  val imageType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false))))

  /** Decode an image blob to (width, height, srcChannels, RGB pixels);
    * null for null/undecodable input. getRGB goes through the color
    * model, so the RGB values are the image's own — format-independent
    * and exact for the lossless formats (BMP/PNG/GIF).
    */
  private[llm] def decodeImage(bytes: Array[Byte]): Row = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val ch = if (img.getColorModel.hasAlpha) 4 else 3
    val px = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        px(o) = (rgb >> 16) & 0xFF
        px(o + 1) = (rgb >> 8) & 0xFF
        px(o + 2) = rgb & 0xFF
        x += 1
      }
      y += 1
    }
    Row(w, h, ch, px.toIndexedSeq)
  }

  /** Decoded-audio struct: PCM sample stream + format. `samples` is
    * frame-major channel-interleaved (frame 0 ch 0, frame 0 ch 1, frame 1
    * ch 0, ...), each value the raw integer PCM amplitude (16-bit signed
    * → [-32768, 32767]; 8-bit unsigned recentered to [-128, 127]). Null
    * when the blob is null or no AudioSystem reader accepts it.
    */
  val audioType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false))))

  /** Decode an audio blob (WAV/AIFF/AU — whatever the JDK's
    * `javax.sound.sampled` registry parses; PCM WAV needs no external
    * codec) to (sampleRate, channels, nFrames, interleaved samples).
    * 16-bit PCM is read exactly (signed, either endianness); 8-bit is
    * recentered to signed. Compressed/float encodings are routed through
    * AudioSystem's own converter to 16-bit signed PCM first, so the
    * emitted samples are always integer-exact for lossless inputs. Null
    * for null/unparseable input.
    */
  private[llm] def decodeAudio(bytes: Array[Byte]): Row = {
    if (bytes == null) return null
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais0 =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val f0 = ais0.getFormat
      // Directly readable without conversion: 16-bit signed PCM (the
      // standard WAV case) or 8-bit PCM (signed or unsigned; recentered
      // below). Everything else — 24/32-bit PCM, 16-bit unsigned PCM,
      // float, compressed — routes through AudioSystem's converter to
      // 16-bit signed first, so wider depths keep their TOP 16 bits
      // rather than being read low-16 as noise.
      val directlyReadable =
        (f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          f0.getSampleSizeInBits == 16) ||
        ((f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
          f0.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) &&
          f0.getSampleSizeInBits == 8)
      val ais = if (directlyReadable) ais0 else {
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
          f0.getSampleRate, false)
        AudioSystem.getAudioInputStream(target, ais0)
      }
      val f = ais.getFormat
      val data = ais.readAllBytes()
      val bytesPerSample = (f.getSampleSizeInBits + 7) / 8
      val nSamples = data.length / bytesPerSample
      val out = new Array[Int](nSamples)
      var i = 0
      if (bytesPerSample == 1) {
        val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        while (i < nSamples) {
          out(i) = if (unsigned) (data(i) & 0xFF) - 128 else data(i).toInt
          i += 1
        }
      } else {
        // 16-bit signed; wider/unsigned depths were already converted to
        // 16-bit signed above, so this 2-byte read is always the full
        // sample
        val be = f.isBigEndian
        while (i < nSamples) {
          val o = i * bytesPerSample
          val lo = if (be) data(o + 1) else data(o)
          val hi = if (be) data(o) else data(o + 1)
          out(i) = ((hi.toInt << 8) | (lo & 0xFF)).toShort.toInt
          i += 1
        }
      }
      Row(f.getSampleRate.toInt, f.getChannels,
        nSamples / math.max(f.getChannels, 1), out.toIndexedSeq)
    } catch { case _: Exception => null }
    finally ais0.close()
  }
}

/** REAL image decode over a binary column: `javax.imageio.ImageIO.read`
  * per blob inside `mapPartitions`, emitting the
  * [[MultimodalOps.imageType]] struct (dims + row-major interleaved RGB).
  * Map-only and linear — each task decodes its own partition's blobs, no
  * shuffle; at 100 TB this runs as wide as the binaryFile scan feeding
  * it. Undecodable/null blobs yield a null struct (filter downstream).
  * Reference has no decode at all (media is out of its scope); this is
  * the §8.1 north-star extension made concrete.
  */
case class DecodeImagePipe(
    mediaCol: String,
    outputCol: String = "image") extends Pipe {
  override def params = Map("media" -> mediaCol, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val inSchema = df.schema
    val idx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, MultimodalOps.imageType, nullable = true))
    df.mapPartitions { rows =>
      rows.map { r =>
        val img = MultimodalOps.decodeImage(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ img)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}

/** REAL image resize: decode (same kernel as [[DecodeImagePipe]]) then
  * nearest-neighbor resample to `targetW`×`targetH` with the exact
  * integer mapping `src = floor(dst * srcDim / dstDim)` — deterministic
  * in any engine (no filtering/antialiasing), which is what makes the
  * result externally replayable: out(x,y) = in(x*w/W, y*h/H). Emits the
  * same image struct shape with the resized dims and pixels. Map-only.
  */
case class ResizeImagePipe(
    mediaCol: String,
    targetW: Int,
    targetH: Int,
    outputCol: String = "image_resized") extends Pipe {
  require(targetW > 0 && targetH > 0, "target dims must be positive")
  override def params = Map("media" -> mediaCol, "w" -> targetW.toString,
    "h" -> targetH.toString, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val inSchema = df.schema
    val idx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, MultimodalOps.imageType, nullable = true))
    val (tw, th) = (targetW, targetH)
    df.mapPartitions { rows =>
      rows.map { r =>
        val dec = MultimodalOps.decodeImage(r.getAs[Array[Byte]](idx))
        val out = if (dec == null) null else {
          val w = dec.getInt(0); val h = dec.getInt(1)
          val px = dec.getAs[IndexedSeq[Int]](3)
          val rp = new Array[Int](tw * th * 3)
          var y = 0
          while (y < th) {
            val sy = (y.toLong * h / th).toInt
            var x = 0
            while (x < tw) {
              val sx = (x.toLong * w / tw).toInt
              val si = (sy * w + sx) * 3
              val di = (y * tw + x) * 3
              rp(di) = px(si); rp(di + 1) = px(si + 1); rp(di + 2) = px(si + 2)
              x += 1
            }
            y += 1
          }
          Row(tw, th, 3, rp.toIndexedSeq)
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}

/** REAL audio decode over a binary column: `javax.sound.sampled` per blob
  * inside `mapPartitions`, emitting the [[MultimodalOps.audioType]] struct
  * (format + interleaved integer PCM samples). WAV/PCM parses with the
  * JDK alone — no external codec. Map-only and linear: each task decodes
  * its own partition's blobs, no shuffle; at 100 TB this runs as wide as
  * the binaryFile scan feeding it. Unparseable/null blobs yield a null
  * struct (filter downstream). Reference has no audio decode (media is
  * out of its scope); §8.1 extension, same plumbing as [[DecodeImagePipe]].
  */
case class DecodeAudioPipe(
    mediaCol: String,
    outputCol: String = "audio") extends Pipe {
  override def params = Map("media" -> mediaCol, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val inSchema = df.schema
    val idx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, MultimodalOps.audioType, nullable = true))
    df.mapPartitions { rows =>
      rows.map { r =>
        val audio = MultimodalOps.decodeAudio(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ audio)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}

/** REAL audio resample: decode (same kernel as [[DecodeAudioPipe]]) then
  * nearest-neighbor FRAME resample to `targetFrames` with the exact
  * integer mapping `srcFrame = floor(dstFrame * nFrames / targetFrames)`
  * — all channels of the chosen source frame are copied, so channel
  * interleaving survives. No filtering/interpolation: deterministic in
  * any engine, externally replayable sample-for-sample. Emits the same
  * audio struct shape with `n_frames = targetFrames` and the source rate
  * (rate metadata rescaling is the caller's policy decision). Map-only.
  */
case class ResampleAudioPipe(
    mediaCol: String,
    targetFrames: Int,
    outputCol: String = "audio_resampled") extends Pipe {
  require(targetFrames > 0, "targetFrames must be positive")
  override def params = Map("media" -> mediaCol,
    "frames" -> targetFrames.toString, "out" -> outputCol)

  protected def transform(df: DataFrame, ks: Seq[String]): DataFrame = {
    val inSchema = df.schema
    val idx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, MultimodalOps.audioType, nullable = true))
    val tf = targetFrames
    df.mapPartitions { rows =>
      rows.map { r =>
        val dec = MultimodalOps.decodeAudio(r.getAs[Array[Byte]](idx))
        val out = if (dec == null || dec.getInt(2) == 0) null else {
          val ch = dec.getInt(1); val nf = dec.getInt(2)
          val in = dec.getAs[IndexedSeq[Int]](3)
          val rs = new Array[Int](tf * ch)
          var j = 0
          while (j < tf) {
            val sj = (j.toLong * nf / tf).toInt
            var c = 0
            while (c < ch) { rs(j * ch + c) = in(sj * ch + c); c += 1 }
            j += 1
          }
          Row(dec.getInt(0), ch, tf, rs.toIndexedSeq)
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
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

/** Fixed-size feature vector over RAW BYTES via mapPartitions:
  * feature[j] = mean of bytes congruent to j mod dim, scaled — exact,
  * engine-replayable arithmetic. The generic binary featurizer for
  * modalities WITHOUT an in-container codec (audio/video payloads,
  * arbitrary blobs); for images use the real [[DecodeImagePipe]], whose
  * mapPartitions batch shape this shares.
  */
case class ByteFeaturesPipe(
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

/** Resample a media binary to a fixed byte length by 1-D
  * nearest-neighbor (out[i] = in[floor(i*n/target)], exact integer
  * arithmetic, deterministic in any engine) — the audio-style length
  * normalizer over raw payloads. Pure binary expressions, map-only. For
  * 2-D image resize use the real [[ResizeImagePipe]]. Emits the
  * resampled binary and a refreshed metadata struct.
  */
case class ResampleBytesPipe(
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
    // no widen: the resample slices a bounded number of bytes per row
    // (targetBytes substrings) — cheap relative to shuffling the full
    // media payload row (r19: 0.72 -> 1.15 s regression with widen)
    val wide = df
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
