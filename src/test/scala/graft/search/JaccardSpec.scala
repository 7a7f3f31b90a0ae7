package graft.search

import graft.SparkSpec
import graft.core.Pipe.qcol
import org.apache.spark.sql.functions._

class JaccardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e"), // shingles: abc bcd cde
    (2L, "a b c x y"), // abc bcx cxy
    (3L, "p q r s t")) // pqr qrs rst
    .toDF("idx", "text")

  private val cfg = SearchConfig(k = 3, fillMaskedIndices = false,
    queryIdCol = Some("qid"))

  test("jaccard over word shingles, hand-computed") {
    val qs = Seq((9L, "a b c d z")).toDF("qid", "t") // abc bcd cdz
      .select(col("qid"), col("t").as("query.text"))
    val out = JaccardEngine(corpus, cfg)(qs)
      .select(qcol("index.idx").as("i"), qcol("index.score").as("s")).head()
    // vs doc1: shared {abc, bcd} = 2, union 4 -> 0.5
    // vs doc2: shared {abc} = 1, union 5 -> 0.2; doc3: no shared shingle
    assert(out.getSeq[Long](0) == Seq(1L, 2L, -1L))
    assert(out.getSeq[Double](1).take(2) == Seq(0.5, 0.2))
  }

  test("addDocuments equals a full build exactly (no corpus statistics)") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
    def eng(c: org.apache.spark.sql.DataFrame) = JaccardEngine(c, cfg,
      corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(6))
    def out(e: SearchEngine) = e(qs)
      .select(col("qid"), col("`index.idx`"), col("`index.score`"))
      .orderBy("qid").collect().map(_.toString).toSeq
    val whole = out(eng(docs))
    val grown = eng(docs.filter(col("doc_id") % 3 =!= 0))
      .addDocuments(docs.filter(col("doc_id") % 3 === 0))
    assert(out(grown) == whole)
    intercept[IllegalArgumentException] {
      JaccardEngine(docs, cfg, corpusIdxCol = "doc_id",
        corpusTextCol = "text", baseIndex = Some(docs.limit(1)))
    }
  }

  test("removeDocuments equals a full build over the survivors exactly") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val rcfg = SearchConfig(k = 10, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val qs = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
    def eng(c: org.apache.spark.sql.DataFrame) = JaccardEngine(c, rcfg,
      corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(6))
    def out(e: SearchEngine) = e(qs)
      .select(col("qid"), col("`index.idx`"), col("`index.score`"))
      .orderBy("qid").collect().map(_.toString).toSeq
    val removed = eng(docs).removeDocuments(col("docId") % 4 === 1)
    val survivors = eng(docs.filter(col("doc_id") % 4 =!= 1))
    assert(out(removed) == out(survivors))
    // stateDir removal demands a fresh fingerprint
    val dir = java.nio.file.Files.createTempDirectory("jac-rmfp").toString
    val withState = JaccardEngine(docs, rcfg, corpusIdxCol = "doc_id",
      corpusTextCol = "text", stateDir = Some(dir),
      corpusFingerprint = "jac-rm-base")
    intercept[IllegalArgumentException] {
      withState.removeDocuments(col("docId") === 0)
    }
  }

  test("short query falls back to whole-text shingle") {
    val qs = Seq((9L, "a b")).toDF("qid", "t")
      .select(col("qid"), col("t").as("query.text"))
    val out = JaccardEngine(corpus, cfg)(qs)
      .select(qcol("index.idx").as("i")).head()
    // "a b" is a single shingle matching no corpus 3-gram
    assert(out.getSeq[Long](0) == Seq(-1L, -1L, -1L))
  }

  test("hashed shingles rank identically to strings on real docs") {
    val docs = spark.read.parquet(sf("documents"))
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
    def ranked(hash: Boolean) = JaccardEngine(docs,
      cfg.copy(k = 5), corpusIdxCol = "doc_id", corpusTextCol = "text",
      hashShingles = hash, roundScores = Some(4))(qs)
      .select(col("qid"), qcol("index.idx").as("i"), qcol("index.score").as("s"))
      .orderBy("qid").collect().toSeq
    assert(ranked(true) == ranked(false))
  }

  test("registry resolves 'jaccard' with threaded state dir") {
    val dir = java.nio.file.Files.createTempDirectory("jac").toString
    val docs = spark.read.parquet(sf("documents"))
    val eng = AutoSearchEngine("jaccard", docs, cfg,
      Map("idxCol" -> "doc_id", "textCol" -> "text",
        "stateDir" -> dir, "fingerprint" -> "t1"))
    val qs = docs.filter(col("doc_id") === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
    assert(eng(qs).count() == 1)
    // state persisted under the dir
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }
}
