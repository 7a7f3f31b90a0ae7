package graft.predict

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, File, FileInputStream, FileOutputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Weight-file import/export for the Predict family: minimal readers and
  * writers for the two public interchange formats a checkpointed model
  * actually arrives in — **safetensors** (the HuggingFace format: 8-byte
  * LE header length, JSON tensor directory, raw little-endian C-order
  * buffer) and **npy/npz** (the NumPy formats: magic + python-literal
  * header per array; npz = zip of npy entries).
  *
  * Values are surfaced as doubles — the widening from every supported
  * storage type (F32, and the half-precision F16/BF16 real checkpoints
  * usually ship) is exact, so a checkpoint loads bit-for-bit into
  * [[MlpModel]] / [[LinearModel]] and the GEMM replays identically to
  * in-code weights.
  * A loaded model's fingerprint is the SOURCE FILE's SHA-256 digest (not
  * the structural weight hash) so cache keys stay O(1) for real-sized
  * checkpoints. Reads and writes STREAM in bounded chunks (r17): a
  * checkpoint past the JVM's 2 GiB array cap loads and round-trips —
  * the only whole-buffer allocations are the JSON header (bounded by
  * [[MaxHeaderBytes]]) and each tensor's decoded double[].
  *
  * Reference counterpart: checkpointed-model inference,
  * warp_pipes/pipes/predict.py:151-191 (torch checkpoints through
  * Lightning); here the checkpoint is read directly, no torch.
  */
object WeightIO {

  /** Element count as a Long — `shape.product` on Ints overflows for
    * adversarial headers (e.g. 65536×65536 wraps to 0), which would let
    * a truncated file pass the size checks as an "empty" tensor.
    */
  private def countOf(shape: Seq[Int]): Long =
    shape.foldLeft(1L)((a, d) => a * d)

  /** A loaded tensor: row-major (C-order) values widened to double. */
  final case class Tensor(shape: Seq[Int], data: Array[Double]) {
    require(shape.forall(_ >= 0) && countOf(shape) == data.length.toLong,
      s"shape ${shape.mkString("x")} != ${data.length} values")

    /** View a rank-2 tensor as rows. */
    def matrix: Seq[Seq[Double]] = {
      require(shape.size == 2, s"rank-${shape.size} tensor is not a matrix")
      val Seq(r, c) = shape
      (0 until r).map(i => data.slice(i * c, (i + 1) * c).toSeq)
    }

    /** Rank-2 transpose (torch `Linear.weight` is stored [out, in]). */
    def transposed: Tensor = {
      require(shape.size == 2, s"rank-${shape.size} tensor is not a matrix")
      val Seq(r, c) = shape
      val out = new Array[Double](data.length)
      var i = 0
      while (i < r) {
        var j = 0
        while (j < c) { out(j * r + i) = data(i * c + j); j += 1 }
        i += 1
      }
      Tensor(Seq(c, r), out)
    }

    def vector: Seq[Double] = {
      require(shape.size == 1, s"rank-${shape.size} tensor is not a vector")
      data.toSeq
    }
  }

  /** Full SHA-256 hex digest of a file — the loaded-model fingerprint. */
  def fileDigest(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(new FileInputStream(path))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  // ---------------------------------------------------------------- safetensors

  private val mapper = new ObjectMapper()

  /** IEEE-754 half (binary16) → float, exact: both subnormal
    * (mant · 2⁻²⁴) and normal ((1 + mant/1024) · 2^(exp−15)) forms are
    * sums of powers of two well inside float32's range and precision.
    * (JDK 20's `Float.float16ToFloat` equivalent — this repo runs 17.)
    */
  private[graft] def halfToFloat(h: Int): Float = {
    val sign = if ((h & 0x8000) != 0) -1f else 1f
    val exp = (h >>> 10) & 0x1F
    val mant = h & 0x3FF
    if (exp == 0) sign * mant * 5.9604645e-8f // 2^-24
    else if (exp == 0x1F) {
      if (mant == 0) sign * Float.PositiveInfinity else Float.NaN
    } else sign * (1f + mant / 1024f) *
      java.lang.Math.scalb(1f, exp - 15)
  }

  /** bfloat16 → float, exact: bf16 IS the top 16 bits of a float32. */
  private[graft] def bf16ToFloat(h: Int): Float =
    java.lang.Float.intBitsToFloat((h & 0xFFFF) << 16)

  /** Read a safetensors file: `u64le header_len | header JSON | buffer`.
    * Header maps tensor name → {dtype, shape, data_offsets:[begin,end)}
    * with offsets relative to the buffer start; data is little-endian
    * C-order. Supported dtypes: F64, F32, F16, BF16, I64, I32, I16, I8,
    * U8, BOOL (widened to double — exact for every value the narrower
    * types can hold; I64 exact below 2^53; BOOL/U8 read unsigned).
    */
  def readSafeTensors(path: String): Map[String, Tensor] =
    readSafeTensorsWithDigest(path)._1

  /** Max safetensors header bytes (the format's own published bound is
    * 100 MB) — the ONLY full-buffer allocation the reader makes, so a
    * multi-GB checkpoint streams with bounded memory.
    */
  val MaxHeaderBytes: Long = 100L * 1000 * 1000

  /** Read + SHA-256 in ONE pass over the file bytes — the model loaders
    * use this so fingerprinting a multi-GB checkpoint never re-reads it.
    * Streams through a DigestInputStream in 64 KiB chunks: files past
    * the JVM's 2 GiB array cap load fine; per-tensor memory is the
    * double[] values only.
    */
  def readSafeTensorsWithDigest(path: String): (Map[String, Tensor], String) = {
    val totalLen = new File(path).length()
    val md = MessageDigest.getInstance("SHA-256")
    val in = new java.security.DigestInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 16), md)
    try {
      val tensors = readSafeTensorsStream(in, totalLen)
      // drain any trailing bytes the header didn't claim so the digest
      // covers the WHOLE file, matching fileDigest (DigestInputStream
      // .skip would bypass the digest — always read)
      val buf = new Array[Byte](1 << 16)
      while (in.read(buf) >= 0) ()
      (tensors, md.digest().map(b => f"$b%02x").mkString)
    } finally in.close()
  }

  private[predict] def readSafeTensorsBytes(bytes: Array[Byte]): Map[String, Tensor] =
    readSafeTensorsStream(new java.io.ByteArrayInputStream(bytes), bytes.length.toLong)

  private def widthOf(dtype: String, name: String): Int = dtype match {
    case "F64" | "I64" => 8
    case "F32" | "I32" => 4
    case "F16" | "BF16" | "I16" => 2
    case "I8" | "U8" | "BOOL" => 1
    case other => throw new IllegalArgumentException(
      s"tensor $name: unsupported dtype $other " +
        "(supported: F64 F32 F16 BF16 I64 I32 I16 I8 U8 BOOL)")
  }

  private def readExact(in: InputStream, b: Array[Byte], n: Int, what: String): Unit = {
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) throw new EOFException(s"truncated safetensors: $what at $got/$n")
      got += r
    }
  }

  /** Decode `n` little-endian elements of `dtype` from the stream into
    * doubles, one bounded chunk at a time — a 16 GiB F64 tensor never
    * materializes as bytes (only its double[] values, which the 2^31
    * element bound already caps).
    */
  private def readElements(
      in: InputStream, dtype: String, width: Int, n: Int, name: String): Array[Double] = {
    val data = new Array[Double](n)
    val chunkElems = math.max(1, (1 << 16) / width)
    val chunk = new Array[Byte](chunkElems * width)
    var i = 0
    while (i < n) {
      val m = math.min(chunkElems, n - i)
      readExact(in, chunk, m * width, s"tensor $name data")
      val tb = ByteBuffer.wrap(chunk, 0, m * width).order(ByteOrder.LITTLE_ENDIAN)
      var j = 0
      dtype match {
        case "F64" => while (j < m) { data(i + j) = tb.getDouble; j += 1 }
        case "F32" => while (j < m) { data(i + j) = tb.getFloat.toDouble; j += 1 }
        case "F16" =>
          while (j < m) { data(i + j) = halfToFloat(tb.getShort & 0xFFFF).toDouble; j += 1 }
        case "BF16" =>
          while (j < m) { data(i + j) = bf16ToFloat(tb.getShort & 0xFFFF).toDouble; j += 1 }
        case "I64" => while (j < m) { data(i + j) = tb.getLong.toDouble; j += 1 }
        case "I32" => while (j < m) { data(i + j) = tb.getInt.toDouble; j += 1 }
        case "I16" => while (j < m) { data(i + j) = tb.getShort.toDouble; j += 1 }
        case "I8" => while (j < m) { data(i + j) = tb.get.toDouble; j += 1 }
        case "U8" | "BOOL" =>
          while (j < m) { data(i + j) = (tb.get & 0xFF).toDouble; j += 1 }
      }
      i += m
    }
    data
  }

  private def drainExact(in: InputStream, count: Long, what: String): Unit = {
    val buf = new Array[Byte](1 << 16)
    var left = count
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) throw new EOFException(s"truncated safetensors: $what")
      left -= r
    }
  }

  private def readSafeTensorsStream(in: InputStream, totalLen: Long): Map[String, Tensor] = {
    require(totalLen >= 8, "truncated safetensors: no header length")
    val lenBuf = new Array[Byte](8)
    readExact(in, lenBuf, 8, "header length")
    val headerLen = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN).getLong
    require(headerLen > 0 && headerLen <= totalLen - 8,
      s"bad safetensors header length $headerLen for $totalLen-byte file")
    require(headerLen <= MaxHeaderBytes,
      s"safetensors header $headerLen bytes exceeds the format's " +
        s"$MaxHeaderBytes-byte bound")
    val headerBytes = new Array[Byte](headerLen.toInt)
    readExact(in, headerBytes, headerLen.toInt, "header JSON")
    val header = mapper.readTree(headerBytes)
    val bufLen = totalLen - 8 - headerLen
    final case class Entry(name: String, dtype: String, shape: Seq[Int],
      begin: Long, end: Long, n: Int, width: Int)
    val entries = Seq.newBuilder[Entry]
    val names = header.fieldNames()
    while (names.hasNext) {
      val name = names.next()
      if (name != "__metadata__") {
        val e = header.get(name)
        val dtype = e.get("dtype").asText()
        val shape = {
          val it = e.get("shape").elements()
          val b = Seq.newBuilder[Int]
          while (it.hasNext) b += it.next().asInt()
          b.result()
        }
        val begin = e.get("data_offsets").get(0).asLong()
        val end = e.get("data_offsets").get(1).asLong()
        require(begin >= 0 && end >= begin && end <= bufLen,
          s"tensor $name offsets [$begin,$end) overrun the buffer")
        val nL = countOf(shape)
        require(nL <= Int.MaxValue,
          s"tensor $name: ${shape.mkString("x")} has $nL elements (> Int.MaxValue)")
        val width = widthOf(dtype, name)
        require(end - begin == nL * width,
          s"tensor $name: ${end - begin} bytes != $nL x $width")
        entries += Entry(name, dtype, shape, begin, end, nL.toInt, width)
      }
    }
    // decode in buffer order so one forward pass serves every tensor;
    // overlapping ranges would force a seek, which a digest stream
    // cannot do — and no real writer emits them
    val sorted = entries.result().sortBy(_.begin)
    var pos = 0L
    val out = Map.newBuilder[String, Tensor]
    for (e <- sorted) {
      require(e.begin >= pos,
        s"tensor ${e.name} data [${e.begin},${e.end}) overlaps the previous tensor")
      drainExact(in, e.begin - pos, s"gap before tensor ${e.name}")
      out += e.name -> Tensor(e.shape, readElements(in, e.dtype, e.width, e.n, e.name))
      pos = e.end
    }
    out.result()
  }

  /** Write tensors as a safetensors file (atomic: temp + rename).
    * `dtype` "F32" (default; values are cast — exact when they are
    * f32-representable, e.g. any checkpoint that was f32 to begin with)
    * or "F64".
    */
  def writeSafeTensors(
      path: String,
      tensors: Seq[(String, Tensor)],
      dtype: String = "F32"): Unit = {
    val width = dtype match {
      case "F32" => 4
      case "F64" => 8
      case other =>
        throw new IllegalArgumentException(s"unsupported write dtype $other")
    }
    val header = JsonNodeFactory.instance.objectNode()
    var off = 0L
    for ((name, t) <- tensors) {
      val e = header.putObject(name)
      e.put("dtype", dtype)
      val sh = e.putArray("shape")
      t.shape.foreach(sh.add)
      val nBytes = t.data.length.toLong * width
      val offs = e.putArray("data_offsets")
      offs.add(off); offs.add(off + nBytes)
      off += nBytes
    }
    val headerBytes0 = mapper.writeValueAsBytes(header)
    // spec: header padded with spaces to an 8-byte boundary
    val pad = (8 - (headerBytes0.length % 8)) % 8
    val headerBytes = headerBytes0 ++ Array.fill(pad)(' '.toByte)
    // stream tensor data in bounded chunks — `off` stays a Long, so a
    // buffer past 2 GiB writes fine (no single allocation of the file)
    atomicWriteStream(path) { out =>
      val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(headerBytes.length.toLong).array()
      out.write(lenBuf)
      out.write(headerBytes)
      writeElements(out, tensors, width)
    }
  }

  /** Stream tensor values little-endian through a bounded chunk. */
  private def writeElements(out: java.io.OutputStream,
      tensors: Seq[(String, Tensor)], width: Int): Unit = {
    val chunkElems = math.max(1, (1 << 16) / width)
    val chunk = ByteBuffer.allocate(chunkElems * width)
      .order(ByteOrder.LITTLE_ENDIAN)
    for ((_, t) <- tensors) {
      var i = 0
      val n = t.data.length
      while (i < n) {
        val m = math.min(chunkElems, n - i)
        chunk.clear()
        var j = 0
        if (width == 4) while (j < m) { chunk.putFloat(t.data(i + j).toFloat); j += 1 }
        else while (j < m) { chunk.putDouble(t.data(i + j)); j += 1 }
        out.write(chunk.array(), 0, m * width)
        i += m
      }
    }
  }

  // ---------------------------------------------------------------- npy / npz

  /** Parse one npy stream (v1/v2 headers; `<f8`/`<f4`/`<i8`/`<i4` descr,
    * C-order only).
    */
  private[predict] def readNpy(in: InputStream): Tensor = {
    def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = in.read(b, got, n - got)
        if (r < 0) throw new EOFException(s"npy truncated at $got/$n")
        got += r
      }
      b
    }
    val magic = readN(8)
    require(magic.take(6).sameElements(Array(0x93.toByte) ++ "NUMPY".getBytes("ASCII")),
      "not an npy stream (bad magic)")
    val major = magic(6)
    val headerLen =
      if (major == 1) ByteBuffer.wrap(readN(2)).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
      else ByteBuffer.wrap(readN(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
    val header = new String(readN(headerLen), "ASCII")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing 'descr': $header")).group(1)
    val fortran = "'fortran_order':\\s*(True|False)".r
      .findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing 'fortran_order': $header")).group(1)
    require(fortran == "False",
      "fortran-order npy not supported (transpose on export)")
    val shapeStr = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(
        s"npy header missing 'shape': $header")).group(1)
    val shape = "\\d+".r.findAllIn(shapeStr).map(_.toInt).toSeq match {
      case Nil => Seq(1) // scalar () — one value
      case s => s
    }
    val nL = countOf(shape)
    require(nL <= Int.MaxValue,
      s"npy shape ${shape.mkString("x")} has $nL elements — too large")
    val n = nL.toInt
    // map the numpy descr onto the safetensors dtype decoder and stream
    // the values chunked — a multi-GiB entry never materializes as bytes
    val dtype = descr match {
      case "<f8" => "F64"
      case "<f4" => "F32"
      case "<f2" => "F16"
      case "<i8" => "I64"
      case "<i4" => "I32"
      case other => throw new IllegalArgumentException(
        s"unsupported npy descr $other (supported: <f8 <f4 <f2 <i8 <i4)")
    }
    Tensor(shape, readElements(in, dtype, widthOf(dtype, "npy"), n, "npy"))
  }

  /** Read an npz archive: each `name.npy` zip entry becomes tensor `name`. */
  def readNpz(path: String): Map[String, Tensor] = {
    val zin = new ZipInputStream(new BufferedInputStream(new FileInputStream(path)))
    try readNpzEntries(zin) finally zin.close()
  }

  /** npz read + SHA-256 in ONE streaming pass (see
    * [[readSafeTensorsWithDigest]]); the trailing central directory is
    * drained so the digest covers the WHOLE file, matching
    * [[fileDigest]].
    */
  def readNpzWithDigest(path: String): (Map[String, Tensor], String) = {
    val md = MessageDigest.getInstance("SHA-256")
    val din = new java.security.DigestInputStream(
      new BufferedInputStream(new FileInputStream(path)), md)
    val zin = new ZipInputStream(din)
    try {
      val entries = readNpzEntries(zin)
      val buf = new Array[Byte](1 << 16)
      while (din.read(buf) >= 0) ()
      (entries, md.digest().map(b => f"$b%02x").mkString)
    } finally zin.close()
  }

  private def readNpzEntries(zin: ZipInputStream): Map[String, Tensor] = {
    val out = Map.newBuilder[String, Tensor]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory && e.getName.endsWith(".npy"))
        out += e.getName.stripSuffix(".npy") -> readNpy(zin)
      e = zin.getNextEntry
    }
    out.result()
  }

  private def writeNpyEntry(out: java.io.OutputStream, t: Tensor, descr: String): Unit = {
    val width = descr match {
      case "<f8" => 8
      case "<f4" => 4
      case other =>
        throw new IllegalArgumentException(s"unsupported write descr $other")
    }
    val shapeStr = t.shape match {
      case Seq(one) => s"($one,)"
      case s => s.mkString("(", ", ", ")")
    }
    val head0 = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    // total header (magic 8 + len 2 + dict) padded to 64 bytes, ending \n
    val padTo = ((8 + 2 + head0.length + 1 + 63) / 64) * 64
    val head = head0 + " " * (padTo - 8 - 2 - head0.length - 1) + "\n"
    out.write(0x93); out.write("NUMPY".getBytes("ASCII"))
    out.write(1); out.write(0)
    out.write(head.length & 0xFF); out.write((head.length >> 8) & 0xFF)
    out.write(head.getBytes("ASCII"))
    writeElements(out, Seq("" -> t), width)
  }

  /** Write tensors as an npz archive (atomic: temp + rename; streamed —
    * the archive never materializes in memory).
    */
  def writeNpz(
      path: String,
      tensors: Seq[(String, Tensor)],
      descr: String = "<f4"): Unit =
    atomicWriteStream(path) { out =>
      val zout = new ZipOutputStream(out)
      for ((name, t) <- tensors) {
        zout.putNextEntry(new ZipEntry(s"$name.npy"))
        writeNpyEntry(zout, t, descr)
        zout.closeEntry()
      }
      zout.finish()
    }

  /** Write-to-temp + atomic rename, streaming through `body` so files
    * past the 2 GiB array cap need no single allocation.
    */
  private def atomicWriteStream(path: String)(body: java.io.OutputStream => Unit): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = File.createTempFile(f.getName, ".tmp", f.getParentFile)
    val out = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16)
    try { body(out); out.flush() } finally out.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
