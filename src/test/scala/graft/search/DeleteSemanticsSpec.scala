package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two cross-engine deletion contracts the r17 advisories flagged:
  *
  *   1. masked-index FILL is disabled on any engine carrying a delete —
  *      fill draws pmod(hash, n) over [0, n), and after a delete those
  *      pseudo-random ids can be exactly the REMOVED (takedown) rows;
  *   2. NULL predicate rows are NOT removed, on every side (SQL
  *      DELETE-WHERE semantics) — a nullable payload/doc-id column must
  *      neither silently delete unmatched rows nor leave the removal
  *      side (df decrements, code anti-joins) disagreeing with the
  *      survivor side.
  */
class DeleteSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(64)(t => (((i * 13 + t * 7) % 19) - 9).toFloat / 9f)

  private def smallCorpus(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("idx", "vector")

  private def qs(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("qid", "query.vector")

  private val cents = IVFDenseEngine.formulaCentroids(8, 64)

  test("IVF fill is disabled after removeVectors (padding stays -1)") {
    // 12 rows, k=10, remove 4 -> 8 survivors: with fill ON and no delete
    // the 2 pads would be replaced by pseudo-random ids in [0, n); after
    // a delete they must STAY -1 (a filled id could be a removed row)
    val cfg = SearchConfig(k = 10, fillMaskedIndices = true,
      queryIdCol = Some("qid"))
    val corpus = smallCorpus(12)
    val full = IVFDenseEngine(corpus, nlist = 8, nprobe = 8, config = cfg,
      fixedCentroids = Some(cents))
    // sanity: the fill path is live pre-delete on a SHORT result
    val shortEng = IVFDenseEngine(corpus.filter(col("idx") < 8), nlist = 8,
      nprobe = 8, config = cfg, fixedCentroids = Some(cents))
    val preFill = shortEng(qs(2)).select(col("`index.idx`")).collect()
      .flatMap(_.getSeq[Long](0))
    assert(preFill.forall(_ >= 0), "pre-delete short results are filled")

    val removed = full.removeVectors(col("idx") % 3 === 2)
    val rows = removed(qs(2)).select(col("`index.idx`")).collect()
      .flatMap(_.getSeq[Long](0))
    assert(rows.count(_ == -1L) == 2 * 2,
      s"post-delete padding must stay -1 (got ${rows.mkString(",")})")
    assert(rows.filter(_ >= 0).forall(_ % 3 != 2),
      "no removed id may appear in the results")
  }

  test("BM25 fill is disabled after removeDocuments") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha delta"), (2L, "epsilon zeta"),
      (3L, "beta gamma"), (4L, "alpha beta")).toDF("doc_id", "text")
    val cfg = SearchConfig(k = 4, fillMaskedIndices = true,
      queryIdCol = Some("qid"))
    val eng = BM25Engine(docs, cfg, corpusIdxCol = "doc_id",
      corpusTextCol = "text").removeDocuments(col("docId") % 2 === 0)
    val queries = Seq((0L, "alpha")).toDF("qid", "query.text")
    val idx = eng(queries).select(col("`index.idx`")).head().getSeq[Long](0)
    // only doc 1 survives with "alpha": 3 pads, all must stay -1
    assert(idx.count(_ == -1L) == 3,
      s"post-delete BM25 padding must stay -1 (got ${idx.mkString(",")})")
    assert(idx.filter(_ >= 0) == Seq(1L))
  }

  test("carriesDelete survives add/rebalance (the id space stays holed)") {
    val cfg = SearchConfig(k = 10, fillMaskedIndices = true,
      queryIdCol = Some("qid"))
    val eng = IVFDenseEngine(smallCorpus(12), nlist = 8, nprobe = 8,
      config = cfg, fixedCentroids = Some(cents))
      .removeVectors(col("idx") % 3 === 2)
      .addVectors(Seq((100L, vec(100))).toDF("idx", "vector"))
      .rebalance()
    val rows = eng(qs(1)).select(col("`index.idx`")).collect()
      .flatMap(_.getSeq[Long](0))
    assert(rows.contains(-1L),
      "fill must remain disabled through add/rebalance after a delete")
  }

  test("NULL delete predicate rows are kept (IVF payload predicate)") {
    val corpus = (0 until 12).map { i =>
      val label: java.lang.Long = if (i % 3 == 0) null else (i % 2).toLong
      (i.toLong, vec(i), label)
    }.toDF("idx", "vector", "label")
    val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val eng = IVFDenseEngine(corpus, nlist = 8, nprobe = 8, config = cfg,
      fixedCentroids = Some(cents), carryCols = Seq("label"))
      .removeVectors(col("label") === 1)
    // removed: label == 1 (odd i not divisible by 3) = 4 rows; the 4
    // NULL-label rows (i % 3 == 0) must SURVIVE
    val surviving = eng.tagged.select("idx").collect().map(_.getLong(0)).toSet
    assert(surviving == Set(0L, 2L, 3L, 4L, 6L, 8L, 9L, 10L),
      s"NULL predicate rows must not be deleted (got $surviving)")
  }

  test("BM25 remove with a docs-column predicate resolves via the docs frame") {
    val docs = spark.read.parquet(sf("documents"))
    val cfg = SearchConfig(k = 10, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val full = BM25Engine(docs, cfg, corpusIdxCol = "doc_id",
      corpusTextCol = "text", roundScores = Some(6))
    // a predicate over `len` — NOT a postings column; the docId-only
    // shape would throw AnalysisException at plan time
    val removedEng = full.removeDocuments(col("len") >= 40)
    val removedIds = full.stats.docs.filter(col("len") >= 40).select("docId")
    val rebuilt = BM25Engine(
      docs.join(removedIds, docs("doc_id") === removedIds("docId"), "left_anti"),
      cfg, corpusIdxCol = "doc_id", corpusTextCol = "text",
      roundScores = Some(6))
    val queries = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
    assert(removedEng(queries).orderBy("qid").collect()
      .sameElements(rebuilt(queries).orderBy("qid").collect()))
    // and the statistics agree exactly (df-0 dropout included)
    assert(removedEng.stats.n == rebuilt.stats.n)
    assert(removedEng.stats.dfreq.count() == rebuilt.stats.dfreq.count())
  }

  test("BM25 NULL-evaluating docId predicate keeps the NULL rows everywhere") {
    val docs = Seq(
      (0L, "alpha beta"), (1L, "alpha gamma"), (2L, "beta gamma"),
      (3L, "alpha beta gamma"), (4L, "delta")).toDF("doc_id", "text")
    val cfg = SearchConfig(k = 5, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val full = BM25Engine(docs, cfg, corpusIdxCol = "doc_id",
      corpusTextCol = "text", roundScores = Some(6))
    // NULL for even docIds, true for docId 1, false for docId 3
    val pred = when(col("docId") % 2 === 0, lit(null).cast("boolean"))
      .otherwise(col("docId") === 1)
    val removedEng = full.removeDocuments(pred)
    // only doc 1 removed; NULL rows 0/2/4 survive with their postings
    assert(removedEng.stats.n == 4)
    assert(removedEng.stats.docs.select("docId").collect()
      .map(_.getLong(0)).toSet == Set(0L, 2L, 3L, 4L))
    val rebuilt = BM25Engine(docs.filter(col("doc_id") =!= 1), cfg,
      corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(6))
    val queries = Seq((0L, "alpha beta")).toDF("qid", "query.text")
    assert(removedEng(queries).collect()
      .sameElements(rebuilt(queries).collect()))
  }

  test("LSH / Jaccard / SQ NULL delete predicates keep NULL rows") {
    val pred = when(col("idx") % 3 === 0, lit(null).cast("boolean"))
      .otherwise(col("idx") % 4 === 1)
    val cfg = SearchConfig(k = 8, fillMaskedIndices = false,
      queryIdCol = Some("qid"))
    val corpus = smallCorpus(12)
    // idx deleted: %4==1 and %3!=0 -> {1, 5} (9 is %3==0 -> NULL -> kept)
    val expect = (0 until 12).map(_.toLong).toSet -- Set(1L, 5L)
    val lsh = LSHDenseEngine(corpus, config = cfg).removeVectors(pred)
    assert(lsh.signatures.select("idx").collect().map(_.getLong(0)).toSet
      == expect)
    val sq = SQDenseEngine(corpus, config = cfg).removeVectors(pred)
    assert(sq.codes.select("idx").collect().map(_.getLong(0)).toSet == expect)
    val jpred = when(col("docId") % 3 === 0, lit(null).cast("boolean"))
      .otherwise(col("docId") % 4 === 1)
    val docs = (0 until 12).map(i =>
      (i.toLong, s"token$i alpha beta gamma delta")).toDF("doc_id", "text")
    val jac = JaccardEngine(docs, cfg, corpusIdxCol = "doc_id",
      corpusTextCol = "text").removeDocuments(jpred)
    assert(jac.state._2.select("docId").collect().map(_.getLong(0)).toSet
      == expect)
  }
}
