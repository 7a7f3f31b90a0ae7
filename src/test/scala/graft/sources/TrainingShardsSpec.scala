package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The halves of the io_train_shards contract SQL cannot see: exactly one
  * data file per shard, rows inside each file in pos order, and a dense
  * manifest — the layout a data-loader worker maps shard → file over.
  */
class TrainingShardsSpec extends SparkSpec {
  import spark.implicits._

  private def layout(n: Int, shardSize: Long) =
    graft.llm.ShardAssignPipe("ord", shardSize)(
      (0 until n).map(i => (i.toLong, (i * 37) % 1000))
        .toDF("doc_id", "ord"))

  test("one file per shard, rows in pos order inside each file") {
    val dir = java.nio.file.Files.createTempDirectory("tshards").toString
    val df = layout(100, 16L)
    TrainingShards.write(df, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.length == 7, s"100 rows / 16 = 7 shards, got ${shardDirs.length}")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${sd.getName} must hold exactly ONE data file, got ${files.length}")
      // in-file order: read the single file alone; parquet preserves
      // writer row order, so pos must come back ascending
      val pos = spark.read.parquet(files.head.getPath)
        .select("pos_in_shard").as[Long].collect().toSeq
      assert(pos == pos.sorted,
        s"${sd.getName}: rows not in pos order: $pos")
    }
  }

  test("manifest is dense and the read-back recovers the exact frame") {
    val dir = java.nio.file.Files.createTempDirectory("tshards2").toString
    val df = layout(100, 16L)
    val man = TrainingShards.write(df, dir)
      .select("shard_id", "n_rows", "min_pos", "max_pos")
      .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(man.size == 7)
    man.foreach { case (sid, n, minP, maxP) =>
      assert(minP == 0 && maxP == n - 1,
        s"shard $sid positions not dense: n=$n min=$minP max=$maxP")
    }
    // full shards hold exactly shardSize rows; only the last is ragged
    assert(man.init.forall(_._2 == 16L) && man.last._2 == 100 - 6 * 16)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("shard_id").cast("long"), col("pos_in_shard"))
      .as[(Long, Long, Long)].collect().toSet
    val orig = df.select("doc_id", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    assert(back == orig, "read-back must recover the exact frame")
  }

  test("empty input yields an empty manifest, not a schema-inference crash") {
    val dir = java.nio.file.Files.createTempDirectory("tshards3").toString
    val man = TrainingShards.write(layout(100, 16L).filter(col("doc_id") < 0), dir)
    assert(man.count() == 0)
    assert(man.columns.toSeq ==
      Seq("shard_id", "n_rows", "min_pos", "max_pos"))
  }

  test("refuses a frame without the layout columns") {
    intercept[IllegalArgumentException] {
      TrainingShards.write(Seq((1L, 2L)).toDF("a", "b"), "/tmp/nope-tshards")
    }
  }
}
