package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(concat(col("l_orderkey"), lit("_"), col("l_linenumber")).as("k"))
    val n = li.count()
    val ranked = graft.pipes.NestingOps.withGlobalRank(li, "k", "r")
    val stats = ranked.agg(count(lit(1)), countDistinct(col("r")),
      min("r"), max("r")).head()
    println(s"[probe] n=$n rows=${stats.getLong(0)} distinct=${stats.getLong(1)} min=${stats.getLong(2)} max=${stats.getLong(3)}")
    // docs-side prefix sum probe
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("cnt", size(split(trim(col("text")), "\\s+")).cast("long"))
    val ps = graft.pipes.NestingOps.withGlobalPrefixSum(docs, "doc_id", "cnt", "off")
    val tot = docs.agg(sum("cnt")).head().getLong(0)
    val bad = ps.select(col("doc_id"), col("cnt"), col("off"))
      .orderBy("doc_id").collect()
      .sliding(2).count { case Array(a, b) =>
        b.getLong(2) != a.getLong(2) + a.getLong(1) }
    println(s"[probe] prefix-sum total=$tot adjacency-violations=$bad")
    spark.stop()
  }
}
