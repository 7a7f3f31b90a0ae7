package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{transform => arrTransform, _}

/** Step-by-step timing of the dd_semdedup gate's phases at a given SF dir:
  * scan+plant, assignment kernel, cell self-join pairs, connected
  * components, full pipe. runMain graft.tools.SemDedupProbe <sfDir>
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args(0)
    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val raw = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 200).select(
        col("vec_id").cast("long").as("vec_id"),
        arrTransform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = raw.unionByName(raw.filter(col("vec_id") < 40).select(
      (col("vec_id") + 10000).as("vec_id"),
      arrTransform(col("embedding"),
        (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
    time("scan+plant count") { println("rows=" + planted.count()) }
    val cents = graft.llm.ClusterBalancedSamplePipe.formulaCentroids(16, 64)
    val assigned = graft.llm.SemDeDupPipe.assigned(
      planted, "embedding", "vec_id", cents, "kcluster")
    time("assigned noop (1st)") {
      assigned.write.format("noop").mode("overwrite").save()
    }
    time("assigned noop (2nd)") {
      assigned.write.format("noop").mode("overwrite").save()
    }
    val l = assigned.select(col("kcluster"), col("id").as("id_a"),
      col("__v__").as("__va__"))
    val r = assigned.select(col("kcluster"), col("id").as("id_b"),
      col("__v__").as("__vb__"))
    val pairs = l.join(r, Seq("kcluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.llm.DedupOps.cosine(col("__va__"), col("__vb__")) >= 0.9)
      .select("id_a", "id_b")
    time("pairs noop (1st)") { pairs.write.format("noop").mode("overwrite").save() }
    time("pairs noop (2nd)") { pairs.write.format("noop").mode("overwrite").save() }
    time("connected components") {
      graft.llm.DedupOps.connectedComponents(pairs)
        .write.format("noop").mode("overwrite").save()
    }
    time("full pipe (fresh)") {
      graft.llm.SemDeDupPipe("embedding", "vec_id", cents, tau = 0.9)(planted)
        .write.format("noop").mode("overwrite").save()
    }
    time("full pipe (again)") {
      graft.llm.SemDeDupPipe("embedding", "vec_id", cents, tau = 0.9)(planted)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
