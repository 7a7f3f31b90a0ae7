package graft.tools

/** Dev check: dump float bits of halfToFloat for all 65536 F16 patterns. */
object F16Dump {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter("/tmp/f16_scala.txt")
    (0 until 65536).foreach { h =>
      out.println(java.lang.Float.floatToRawIntBits(
        graft.predict.WeightIO.halfToFloat(h)))
    }
    out.close()
    println("[f16dump] wrote 65536 patterns")
  }
}
