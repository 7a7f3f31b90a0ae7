package graft.predict

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream, InputStream}
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
  * checkpoints.
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

  /** Read + SHA-256 in ONE pass over the file bytes — the model loaders
    * use this so fingerprinting a multi-GB checkpoint never re-reads it.
    */
  def readSafeTensorsWithDigest(path: String): (Map[String, Tensor], String) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val digest = MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString
    (readSafeTensorsBytes(bytes), digest)
  }

  private[predict] def readSafeTensorsBytes(bytes: Array[Byte]): Map[String, Tensor] = {
    require(bytes.length >= 8, "truncated safetensors: no header length")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getLong(0)
    require(headerLen > 0 && headerLen <= bytes.length - 8,
      s"bad safetensors header length $headerLen for ${bytes.length}-byte file")
    val header = mapper.readTree(bytes, 8, headerLen.toInt)
    val dataStart = 8 + headerLen.toInt
    val out = Map.newBuilder[String, Tensor]
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
        require(begin >= 0 && end >= begin && dataStart + end <= bytes.length,
          s"tensor $name offsets [$begin,$end) overrun the buffer")
        val nL = countOf(shape)
        require(nL <= Int.MaxValue,
          s"tensor $name: ${shape.mkString("x")} has $nL elements (> Int.MaxValue)")
        val n = nL.toInt
        val width = dtype match {
          case "F64" | "I64" => 8
          case "F32" | "I32" => 4
          case "F16" | "BF16" | "I16" => 2
          case "I8" | "U8" | "BOOL" => 1
          case other => throw new IllegalArgumentException(
            s"tensor $name: unsupported dtype $other " +
              "(supported: F64 F32 F16 BF16 I64 I32 I16 I8 U8 BOOL)")
        }
        require(end - begin == nL * width,
          s"tensor $name: ${end - begin} bytes != $n x $width")
        val tb = ByteBuffer.wrap(bytes, dataStart + begin.toInt, (end - begin).toInt)
          .order(ByteOrder.LITTLE_ENDIAN)
        val data = new Array[Double](n)
        var i = 0
        dtype match {
          case "F64" => while (i < n) { data(i) = tb.getDouble; i += 1 }
          case "F32" => while (i < n) { data(i) = tb.getFloat.toDouble; i += 1 }
          case "F16" =>
            while (i < n) { data(i) = halfToFloat(tb.getShort & 0xFFFF).toDouble; i += 1 }
          case "BF16" =>
            while (i < n) { data(i) = bf16ToFloat(tb.getShort & 0xFFFF).toDouble; i += 1 }
          case "I64" => while (i < n) { data(i) = tb.getLong.toDouble; i += 1 }
          case "I32" => while (i < n) { data(i) = tb.getInt.toDouble; i += 1 }
          case "I16" => while (i < n) { data(i) = tb.getShort.toDouble; i += 1 }
          case "I8" => while (i < n) { data(i) = tb.get.toDouble; i += 1 }
          case "U8" | "BOOL" =>
            while (i < n) { data(i) = (tb.get & 0xFF).toDouble; i += 1 }
        }
        out += name -> Tensor(shape, data)
      }
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
    val buf = ByteBuffer.allocate(8 + headerBytes.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(headerBytes.length.toLong)
    buf.put(headerBytes)
    for ((_, t) <- tensors; v <- t.data)
      if (width == 4) buf.putFloat(v.toFloat) else buf.putDouble(v)
    atomicWrite(path, buf.array())
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
    require(nL <= Int.MaxValue / 8,
      s"npy shape ${shape.mkString("x")} has $nL elements — too large")
    val n = nL.toInt
    val width = descr match {
      case "<f8" | "<i8" => 8
      case "<f4" | "<i4" => 4
      case "<f2" => 2
      case other => throw new IllegalArgumentException(
        s"unsupported npy descr $other (supported: <f8 <f4 <f2 <i8 <i4)")
    }
    val tb = ByteBuffer.wrap(readN(n * width)).order(ByteOrder.LITTLE_ENDIAN)
    val data = new Array[Double](n)
    var i = 0
    descr match {
      case "<f8" => while (i < n) { data(i) = tb.getDouble; i += 1 }
      case "<f4" => while (i < n) { data(i) = tb.getFloat.toDouble; i += 1 }
      case "<f2" =>
        while (i < n) { data(i) = halfToFloat(tb.getShort & 0xFFFF).toDouble; i += 1 }
      case "<i8" => while (i < n) { data(i) = tb.getLong.toDouble; i += 1 }
      case "<i4" => while (i < n) { data(i) = tb.getInt.toDouble; i += 1 }
    }
    Tensor(shape, data)
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

  private def npyBytes(t: Tensor, descr: String): Array[Byte] = {
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
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(0x93); out.write("NUMPY".getBytes("ASCII"))
    out.write(1); out.write(0)
    out.write(head.length & 0xFF); out.write((head.length >> 8) & 0xFF)
    out.write(head.getBytes("ASCII"))
    val buf = ByteBuffer.allocate(t.data.length * width)
      .order(ByteOrder.LITTLE_ENDIAN)
    t.data.foreach(v => if (width == 4) buf.putFloat(v.toFloat) else buf.putDouble(v))
    out.write(buf.array())
    out.flush()
    bos.toByteArray
  }

  /** Write tensors as an npz archive (atomic: temp + rename). */
  def writeNpz(
      path: String,
      tensors: Seq[(String, Tensor)],
      descr: String = "<f4"): Unit = {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    for ((name, t) <- tensors) {
      zout.putNextEntry(new ZipEntry(s"$name.npy"))
      zout.write(npyBytes(t, descr))
      zout.closeEntry()
    }
    zout.close()
    atomicWrite(path, bos.toByteArray)
  }

  private def atomicWrite(path: String, bytes: Array[Byte]): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = File.createTempFile(f.getName, ".tmp", f.getParentFile)
    val out = new BufferedOutputStream(new FileOutputStream(tmp))
    try { out.write(bytes); out.flush() } finally out.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
