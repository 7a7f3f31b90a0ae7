package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.DedupOps

object ShingleProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.debug.maxToStringFields", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def hofShingleHashes(text: Column, k: Int): Column = {
      val toks = split(trim(text), "\\s+")
      val n = size(toks)
      array_distinct(
        when(n >= k,
          transform(sequence(lit(0), n - k),
            i => xxhash64(concat_ws("", slice(toks, i + 1, lit(k))))))
          .otherwise(array(xxhash64(text))))
    }

    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "déjà", "x1", "", "Zz")
    val texts = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    } :+ (900L, "   ") :+ (901L, "one") :+ (902L, "one two") :+
      (903L, "a a a a a") :+ (904L, "\ttab\nsep x y z")
    val df = texts.toDF("id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = df.select($"id", DedupOps.shingleHashes($"text", k).as("s"))
      val want = df.select($"id", hofShingleHashes($"text", k).as("s"))
      val ok = got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty
      println(s"PROBE k=$k parity=$ok")
      if (!ok) {
        val g = got.orderBy("id").collect().toSeq
        val w = want.orderBy("id").collect().toSeq
        g.zip(w).filter { case (a, b) => a != b }.take(3).foreach { case (a, b) =>
          println(s"PROBE diff got=$a want=$b")
        }
      }
    }
    spark.stop()
  }
}
