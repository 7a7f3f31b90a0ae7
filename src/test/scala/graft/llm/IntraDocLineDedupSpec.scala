package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntraDocLineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence survives in order; map-only plan") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"),
      (2L, "a\nb\nc"),
      (3L, "x\nx\nx\nx"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = IntraDocLineDedupPipe("text")(df)
    // no DATA shuffle — the only allowed exchange is widen's round-robin
    // spread of a narrow scan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") &&
      !plan.contains("rangepartitioning"))
    val rows = out.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[String]("text") == "nav\nbody one\nbody two")
    assert(rows(1L).getAs[Long]("n_intra_removed") == 2L)
    assert(rows(2L).getAs[String]("text") == "a\nb\nc")
    assert(rows(2L).getAs[Long]("n_intra_removed") == 0L)
    assert(rows(3L).getAs[String]("text") == "x")
    assert(rows(3L).getAs[Long]("n_intra_removed") == 3L)
    for (id <- Seq(4L, 5L)) {
      assert(rows(id).getAs[String]("text") == "")
      assert(rows(id).getAs[Long]("n_intra_removed") == 0L)
    }
  }

  test("rows preserved over real docs; composes before corpus line dedup") {
    val docs = spark.read.parquet(sf("documents"))
      .withColumn("text", concat_ws("\n", col("text"), col("text"),
        lit("unique tail")))
    val out = IntraDocLineDedupPipe("text")(docs)
    assert(out.count() == docs.count())
    // every doc had its duplicated body line collapsed
    assert(out.filter(col("n_intra_removed") =!= 1L).count() == 0)
  }
}
