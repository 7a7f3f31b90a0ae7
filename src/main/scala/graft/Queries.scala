package graft

import graft.core._
import graft.core.Condition._
import graft.pipes._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query registry: one entry per implemented operator from
  * SURVEY.md §2, each paired (in [[SparkEntry.oracleSql]]) with equivalent
  * DuckDB SQL over the same parquet tables.
  *
  * Conventions for oracle-hash stability:
  *   - every query ends in a deterministic ORDER BY (mirrored in the SQL);
  *   - double aggregates are round()ed; raw doubles pass through untouched;
  *   - timestamps are emitted as formatted strings (parquet timestamp
  *     annotations differ between writers);
  *   - aggregate/computed columns are aliased identically on both sides.
  */
object Queries {

  /** The training-data EPILOGUE chain shared by pp_train_order_v1 (the
    * composed-arithmetic capstone) and io_train_shards (the same frame
    * MATERIALIZED file-per-shard): mixture → unique copy id → curriculum
    * → packing → shard layout. One definition so the two gates can never
    * drift apart while both replay the same oracle.
    */
  /** The fixture mixture (docs, budget, mixed) shared by the epilogue
    * chain AND its audit gate — one construction so the audit can never
    * audit a different mixture than the chain runs. (The report's OWN
    * weights/maxRepeat config is still passed at its call site by
    * design: the audit takes the plan config as input, and a drift
    * between the two would hash-fail against the oracle's single
    * weight table anyway.)
    */
  private def fixtureMixture(s: SparkSession, d: String): (DataFrame, Long, DataFrame) = {
    val docs = t(s, d, "documents")
    val budget = docs.count() // one-row driver read: the gate's budget
    val mixed = graft.llm.DomainMixturePipe("doc_id", "source",
      graft.llm.DomainMixturePipe.fixtureGateWeights,
      budget = budget, maxRepeat = 3)(docs)
    (docs, budget, mixed)
  }

  private def trainOrderChain(s: SparkSession, d: String): DataFrame = {
    // 1. bounded-repetition domain mixture (the mx_domain_mixture
    //    construction: every quota regime fires at once)
    val (_, _, mixed) = fixtureMixture(s, d)
    // unique numeric id per emitted COPY: epoch <= maxRepeat+1 = 4 < 8,
    // so doc_id*8+epoch is collision-free and integer-replayable — the
    // downstream order keeps repeated docs apart (the mixture scaladoc's
    // documented composition contract)
    val copies = mixed.withColumn("mix_id",
      col("doc_id") * 8 + col("epoch"))
    // 2. quality-annealed curriculum over the MIXTURE (score = n_chars,
    //    4 rank-slice phases, within-phase quadratic decorrelation)
    val ordered = graft.llm.CurriculumOrderPipe("mix_id", "n_chars")(copies)
    // 3. concat-and-chunk packing in curriculum order (token accounting
    //    = n_chars; global range-partitioned prefix sum)
    val packed = graft.llm.PackSequencesPipe("n_chars", 2048,
      "curriculum_pos")(ordered)
    // 4. fixed-size shard layout over the same order
    graft.llm.ShardAssignPipe("curriculum_pos", 32)(packed)
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val q = Pipe.qcol _

  /** Cheap content-sensitive table fingerprint for engine-state caches:
    * path + total byte length + latest mtime. A regenerated testdata file
    * at the same path invalidates the cache (a bare path key would serve
    * stale persisted state); unchanged files hit it.
    */
  private def tableFp(s: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sum = fs.getContentSummary(p)
    val mtime = fs.getFileStatus(p).getModificationTime
    s"$p:${sum.getLength}:$mtime"
  }

  /** Exact inverted-index Jaccard pair oracle over the planted-near-dup
    * corpus — shared by dd_minhash_lsh (batch) and ev_stream_neardup
    * (streaming twin, identical pair semantics within one drain).
    */
  private val minhashPairOracle: String =
    """WITH planted AS (SELECT doc_id, text FROM documents UNION ALL
      | SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
      | FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
      |  ELSE [text] END) AS s
      | FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM planted)),
      |szs AS (SELECT doc_id, len(s) AS n FROM sh),
      |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (SELECT id_a, id_b,
      |  shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE AS j
      | FROM cand JOIN szs sa ON sa.doc_id = cand.id_a JOIN szs sb ON sb.doc_id = cand.id_b)
      |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Exact n-gram contamination oracle — shared by cu_decontaminate
    * (batch) and ev_stream_decontam (stateless streaming twin).
    */
  /** Exact replay of the Efraimidis-Spirakis quadratic-M31 rank key —
    * shared by ws_weighted_sample (batch) and ev_stream_weighted_sample
    * (the streaming reservoir, which must converge to the identical
    * top-120: the key is a pure function of (id, w, seed)).
    */
  private val weightedSampleOracle: String =
    """WITH s AS (SELECT doc_id, n_chars, (doc_id*131 + 17) % 2147483647 AS s1
      | FROM documents WHERE n_chars > 0),
      |m AS (SELECT doc_id, n_chars,
      | ln(((s1*s1 + s1) % 2147483647 + 1) / 2147483648.0) / CAST(n_chars AS DOUBLE) AS k FROM s),
      |r AS (SELECT doc_id, n_chars, row_number() OVER (ORDER BY k DESC, doc_id) AS rn FROM m)
      |SELECT doc_id, n_chars FROM r WHERE rn <= 120 ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Stage-by-stage replay of the FLAGSHIP ingest cascade — shared by
    * pp_ingest_v1 (batch) and ev_stream_ingest (the foreachBatch twin):
    * plantedC4 pages (corpus = doc_id%3≠1; arrivals = re-crawls with an
    * appended tail + the %3==1 pages as genuinely-new) → the pp_crawl_v1
    * cleaner chain → exact inverted-index Jaccard dedup (threshold 0.5,
    * 3-word shingles; drop = cross-pair batch side ∪ within-batch larger
    * id) → byte-features (16 classes, mean/255) → formula linear model →
    * formula coarse tagging (8 centroids) → residual PQ codes (m=4,
    * 16 codes of dsub 4). Every constant mirrors the Scala preset.
    */
  private val ingestOracle: String = {
    val planted = "(CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) || (CASE WHEN doc_id % 13 = 0 THEN '{ cfg }' || chr(10) ELSE '' END) || replace(replace(text, ' fast ', '.' || chr(10)), ' data ', '?' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Enable javascript to proceed now please.' ELSE '' END)"
    val cent = "(((%s*29 + t*13) %% 17) - 8) * 0.05"
    val inner =
      s"""WITH pl AS (SELECT doc_id, $planted AS text FROM documents),
        |raw AS (
        | SELECT doc_id, 0 AS grp, text FROM pl WHERE doc_id % 3 <> 1
        | UNION ALL SELECT doc_id + 500000, 1, text || chr(10) || 'Extra tail sentence appended here okay.' FROM pl WHERE doc_id % 3 = 0
        | UNION ALL SELECT doc_id + 600000, 1, text FROM pl WHERE doc_id % 3 = 1),
        |i0 AS (SELECT doc_id, grp, text, string_split(text, chr(10)) AS lines0 FROM raw),
        |i1 AS (SELECT doc_id, grp, list_filter(lines0, (l, i) -> list_position(lines0, l) = i) AS lines1 FROM i0),
        |i2 AS (SELECT doc_id, grp, coalesce(array_to_string(lines1, chr(10)), '') AS text FROM i1),
        |k AS (SELECT doc_id, grp, text,
        | list_filter(string_split(text, chr(10)), l -> regexp_matches(rtrim(l, ' ' || chr(9)), '[.!?"”]$$') AND length(trim(rtrim(l, ' ' || chr(9)))) > 0 AND len(regexp_split_to_array(trim(rtrim(l, ' ' || chr(9))), '\\s+')) >= 5 AND NOT contains(lower(rtrim(l, ' ' || chr(9))), 'javascript')) AS kept
        | FROM i2),
        |f AS (SELECT doc_id, grp, coalesce(array_to_string(kept, chr(10)), '') AS clean,
        | CAST(len(regexp_extract_all(coalesce(array_to_string(kept, chr(10)), ''), '[.!?]+')) AS BIGINT) AS n_sentences,
        | contains(lower(text), 'lorem ipsum') AS fl, contains(text, '{') AS fb
        | FROM k),
        |g AS (SELECT doc_id, grp, clean FROM f WHERE n_sentences >= 3 AND NOT fl AND NOT fb),
        |t AS (SELECT doc_id, grp, clean, regexp_split_to_array(trim(clean), '\\s+') AS toks FROM g),
        |q AS (SELECT doc_id, grp, clean,
        | CAST(len(toks) AS BIGINT) AS n_words,
        | CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        | CAST(len(list_distinct(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','that','it','for')))) AS BIGINT) AS distinct_stopwords,
        | CAST(len(toks) AS INTEGER) AS ws_tokens
        | FROM t),
        |clean AS (SELECT doc_id, grp, clean AS text, ws_tokens FROM q WHERE alpha_words*5 >= n_words*4 AND distinct_stopwords >= 2),
        |sh AS (SELECT doc_id, grp, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, grp, text, string_split_regex(trim(text), '\\s+') AS toks FROM clean)),
        |sz AS (SELECT doc_id, len(s) AS n FROM sh),
        |invb AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE grp = 1),
        |invc AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE grp = 0),
        |crossp AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b, count(*) AS inter
        | FROM invb a JOIN invc c USING (g) GROUP BY 1, 2),
        |batp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        | FROM invb a JOIN invb b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |drop0 AS (
        | SELECT crossp.id_a AS doc_id FROM crossp
        |  JOIN sz sa ON sa.doc_id = crossp.id_a JOIN sz sb ON sb.doc_id = crossp.id_b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        | UNION SELECT batp.id_b FROM batp
        |  JOIN sz sa ON sa.doc_id = batp.id_a JOIN sz sb ON sb.doc_id = batp.id_b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
        |keep AS (SELECT doc_id, text, ws_tokens FROM clean
        | WHERE grp = 0 OR doc_id NOT IN (SELECT doc_id FROM drop0)),
        |feats AS (SELECT doc_id, text, ws_tokens,
        | list_transform(range(0,16), j -> list_avg(list_transform(range(j+1, length(text)+1, 16), i -> unicode(text[i]))) / 255) AS f
        | FROM keep),
        |emb AS (SELECT doc_id, text, ws_tokens,
        | list_transform(range(0,16), o -> list_sum(list_transform(range(0,16), i -> ((((o*7 + i*3) % 5) - 2) * 0.25) * f[i+1])) + o * 0.125) AS v
        | FROM feats),
        |cd AS (SELECT doc_id, text, ws_tokens, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,16), t -> (v[t+1] - ${cent.format("c")}) * (v[t+1] - ${cent.format("c")})))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,16), t -> (v[t+1] - ${cent.format("c")}) * (v[t+1] - ${cent.format("c")})))))) - 1 AS cid
        | FROM emb),
        |res AS (SELECT doc_id, text, ws_tokens, v, cid,
        | list_transform(range(0,16), t -> v[t+1] - ${cent.format("cid")}) AS rv FROM cd),
        |cds AS (SELECT doc_id, text, ws_tokens, v, cid, list_transform(range(0,4), j ->
        |  list_position(
        |   list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,4), t ->
        |     rv[j*4+t+1] - ((((c*31 + t*7 + j*13) % 10) * 0.1) - 0.4)), dd -> dd*dd))),
        |   list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,4), t ->
        |     rv[j*4+t+1] - ((((c*31 + t*7 + j*13) % 10) * 0.1) - 0.4)), dd -> dd*dd))))) - 1) AS codes
        | FROM res)
        |SELECT doc_id, text, ws_tokens, list_transform(v, x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS vector,
        | CAST(cid AS INT) AS cid, codes
        |FROM cds ORDER BY doc_id""".stripMargin.replace("\n", " ")
    scl(inner, "doc_id" -> "", "text" -> "", "ws_tokens" -> "",
      "vector" -> "i", "cid" -> "", "codes" -> "i")
  }

  private val decontaminateOracle: String =
    """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |ng AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 4 THEN list_transform(range(1, len(t)-2), i -> array_to_string(t[i:i+3], ' ')) ELSE [] END) AS g FROM tok),
      |ev AS (SELECT DISTINCT g FROM ng WHERE doc_id < 30),
      |hit AS (SELECT DISTINCT ng.doc_id FROM ng JOIN ev USING (g))
      |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
      |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** Exact replay of the overlap-FRACTION protocol — shared by
    * cu_overlap_frac (batch) and ev_stream_overlap_frac (the stateless
    * streaming twin): the planted partial contamination (eval tokens
    * appended to doc_id % 7 == 3), distinct 8-grams, the per-doc matched
    * count against the eval gram set, and the integer bp/threshold
    * arithmetic — all replayed value-for-value.
    */
  private val overlapFracOracle: String =
    """WITH ev0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 30),
      |pl AS (SELECT d.doc_id, CASE WHEN d.doc_id % 7 = 3
      |  THEN d.text || ' ' || array_to_string((string_split_regex(trim(e.text), '\s+'))[1:40], ' ')
      |  ELSE d.text END AS text
      | FROM documents d JOIN ev0 e ON e.doc_id = d.doc_id % 30),
      |tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM pl),
      |gr AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 8 THEN list_transform(range(1, len(t)-6), i -> array_to_string(t[i:i+7], ' ')) ELSE [] END) AS gs FROM tok),
      |evt AS (SELECT string_split_regex(trim(text), '\s+') AS t FROM ev0),
      |evg AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 8 THEN list_transform(range(1, len(t)-6), i -> array_to_string(t[i:i+7], ' ')) ELSE [] END) AS g FROM evt),
      |m AS (SELECT x.doc_id, count(*) AS mc FROM (SELECT doc_id, unnest(gs) AS g FROM gr) x JOIN evg USING (g) GROUP BY 1),
      |f AS (SELECT gr.doc_id, coalesce(mc, 0) AS matched, len(gs) AS total FROM gr LEFT JOIN m ON gr.doc_id = m.doc_id)
      |SELECT doc_id, CAST(matched AS INT) AS matched_ngrams, CAST(total AS INT) AS total_ngrams,
      | CAST(CASE WHEN total > 0 THEN (matched*10000) // total ELSE 0 END AS INT) AS overlap_bp,
      | (total > 0 AND matched*10000 >= 2000*total) AS contaminated
      |FROM f ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Bit-exact replay of [[graft.llm.BloomDecontaminatePipe]] (n=4,
    * m=2^20, k=4): the dual-fold [[graft.llm.BloomOps.gramHash]] per
    * distinct n-gram, the k affine bit positions (coefficients
    * interpolated from the SAME [[graft.llm.BloomOps.bloomCoeffs]] the
    * pipe uses), the bit set = positions of eval grams, and a gram
    * probes true iff ALL k of its positions are set — false positives
    * from position collisions replay identically.
    */
  private val bloomDecontamOracle: String = {
    val coefVals = graft.llm.BloomOps.bloomCoeffs(4).zipWithIndex
      .map { case ((a, b), j) => s"($j, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""WITH tok AS (SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS t FROM documents),
      |th AS (SELECT doc_id, len(t) AS n,
      |  list_transform(t, w -> list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(range(1, length(w)+1), i -> CAST(unicode(w[i]) AS BIGINT))), (h,c) -> (h*31+c) % 1000003)) AS a,
      |  list_transform(t, w -> list_reduce(list_prepend(CAST(11 AS BIGINT), list_transform(range(1, length(w)+1), i -> CAST(unicode(w[i]) AS BIGINT))), (h,c) -> (h*131+c) % 1000000007)) AS b
      | FROM tok),
      |ng AS (SELECT doc_id, unnest(CASE WHEN n >= 4 THEN list_transform(range(0, n-3), i ->
      |  list_reduce(list_prepend(CAST(7 AS BIGINT), a[i+1:i+4]), (h,x) -> (h*31+x) % 1000003) * 1000000007
      |  + list_reduce(list_prepend(CAST(11 AS BIGINT), b[i+1:i+4]), (h,x) -> (h*131+x) % 1000000007)) ELSE [] END) AS g FROM th),
      |hs AS (SELECT DISTINCT g, g % 2147483647 AS hp FROM ng),
      |coef AS (SELECT * FROM (VALUES $coefVals) AS c(j, a, b)),
      |pos AS (SELECT g, j, ((hp*a + b) % 2147483647) % 1048576 AS p FROM hs CROSS JOIN coef),
      |bits AS (SELECT DISTINCT p FROM pos WHERE g IN (SELECT DISTINCT g FROM ng WHERE doc_id < 30)),
      |pg AS (SELECT g FROM pos JOIN bits USING (p) GROUP BY g HAVING count(DISTINCT j) = 4),
      |hit AS (SELECT DISTINCT ng.doc_id FROM ng JOIN pg USING (g))
      |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
      |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id ORDER BY d.doc_id""".stripMargin.replace("\n", " ")
  }

  /** Pinned public-style merge table for the bp_bpe_encode gate: covers a
    * chained merge (ta + b reads the output of t + a) and an a==b merge
    * (g,g — the greedy-pass run-parity case, "agg" -> [gg, a... ]).
    */
  private val bpePinnedMerges: Seq[(String, String)] =
    Seq(("t", "a"), ("ta", "b"), ("t", "h"), ("g", "g"))

  /** DuckDB replay of [[graft.text.BpeEncodePipe]] with a FIXED merge
    * table — an INDEPENDENT algorithm: where Spark encodes each word as a
    * nested aggregate fold, the oracle runs each merge as one
    * window-function pass (gaps-and-islands over match positions, parity
    * selection within an island = the left-to-right greedy, consumed-row
    * deletion). Positions keep their original char offsets, so ordering
    * survives every pass.
    */
  /** Cell-scoped cross-corpus cosine oracle, shared by the batch
    * (cu_semdedup_contam) and streaming (ev_stream_semdedup) twins: the
    * same planted mutants, formula-centroid assignment of both sides,
    * cell equi-join, and τ=0.9 cosine — exhaustive and exact.
    */
  private val semDeDupContamOracle: String =
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings WHERE vec_id < 200),
      |arr AS (SELECT vec_id+10000 AS vec_id, list_transform(range(0,64), i -> vec[i+1] + ((i%5)-2)*0.01) AS vec FROM emb WHERE vec_id < 40),
      |aa AS (SELECT vec_id, vec, list_transform(range(0,16), c ->
      |  list_sum(list_transform(range(0,64), t -> (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4)) * (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4))))) AS ds FROM arr),
      |al AS (SELECT vec_id, vec, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell FROM aa),
      |ca AS (SELECT vec_id, vec, list_transform(range(0,16), c ->
      |  list_sum(list_transform(range(0,64), t -> (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4)) * (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4))))) AS ds FROM emb),
      |cl AS (SELECT vec_id, vec, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cell FROM ca)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      | round(list_dot_product(a.vec, b.vec) / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 4) AS cosine
      |FROM al a JOIN cl b ON a.cell = b.cell
      |WHERE list_dot_product(a.vec, b.vec) / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  private def bpeOracleSql(merges: Seq[(String, String)]): String = {
    val passes = merges.zipWithIndex.map { case ((a, b), k0) =>
      val k = k0 + 1
      val prev = s"t${k - 1}"
      s"""p$k AS (SELECT doc_id, wi, pos, s, lead(s) OVER (PARTITION BY doc_id, wi ORDER BY pos) AS nxt FROM $prev),
         |m$k AS (SELECT doc_id, wi, pos, s, (s = '$a' AND nxt IS NOT DISTINCT FROM '$b') AS mt FROM p$k),
         |i$k AS (SELECT doc_id, wi, pos, s, mt, CASE WHEN mt THEN pos - row_number() OVER (PARTITION BY doc_id, wi, mt ORDER BY pos) END AS isl FROM m$k),
         |s$k AS (SELECT doc_id, wi, pos, s, (mt AND ((row_number() OVER (PARTITION BY doc_id, wi, isl ORDER BY pos) - 1) % 2 = 0)) AS sel FROM i$k),
         |c$k AS (SELECT doc_id, wi, pos, s, sel, coalesce(lag(sel) OVER (PARTITION BY doc_id, wi ORDER BY pos), false) AS consumed FROM s$k),
         |t$k AS (SELECT doc_id, wi, pos, CASE WHEN sel THEN '$a$b' ELSE s END AS s FROM c$k WHERE NOT consumed)"""
        .stripMargin
    }.mkString(",\n")
    val n = merges.size
    s"""WITH w0 AS (SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS ws FROM documents),
       |wx AS (SELECT doc_id, wj.i AS wi, ws[wj.i+1] AS word FROM w0, LATERAL (SELECT unnest(range(0, len(ws))) AS i) wj WHERE length(ws[wj.i+1]) > 0),
       |t0 AS (SELECT doc_id, wi, cj.i AS pos, substr(word, CAST(cj.i AS INT), 1) AS s FROM wx, LATERAL (SELECT unnest(range(1, length(word)+1)) AS i) cj),
       |$passes,
       |agg AS (SELECT doc_id, list(s ORDER BY wi, pos) AS bpe_tokens, CAST(count(*) AS INT) AS n_bpe_tokens FROM t$n GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.bpe_tokens, CAST([] AS VARCHAR[])) AS bpe_tokens, coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens
       |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""
      .stripMargin.replace("\n", " ")
  }

  /** lineitem rows with a unique total-order key (l_linenumber <= 7). */
  private def liOrd(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("ordv"),
      col("l_quantity").as("qty"))

  /** (l_orderkey, nums = sorted list of line numbers). */
  private def liNums(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_linenumber"))).as("nums"))

  /** documents plus near-duplicate plants: docs 0-49 re-appear as
    * doc_id+10000 with their last two words dropped.
    */
  private def plantedNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = split(col("text"), " ")
    val mutated = docs.filter(col("doc_id") < 50).select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ").as("text"),
      col("lang"), col("source"), col("n_chars"))
    docs.unionByName(mutated)
  }

  /** documents wrapped in markup with style/script PAYLOADS (must vanish
    * with their contents), a comment, attributes, and the six entities —
    * incl. the decode-order trap &amp;lt; (must come out as literal
    * "&lt;", not "<") — shared by the tx_html_extract gates.
    */
  /** Deterministic line/symbol structure planted over the single-line
    * word-soup corpus for the Gopher-rule gates: every " line " starts a
    * bullet line, every " slow " closes its line with an ellipsis,
    * doc_id%5 docs get a '# ' header symbol, doc_id%7 docs end "...".
    */
  private def plantedStructured(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").withColumn("text",
      concat(
        when(col("doc_id") % 5 === 0, lit("# ")).otherwise(lit("")),
        replace(replace(col("text"), lit(" line "), lit("\n- line ")),
          lit(" slow "), lit("…\n")),
        when(col("doc_id") % 7 === 0, lit(" ...")).otherwise(lit(""))))

  /** Deterministic multi-line page structure for the C4 gates: " fast "
    * closes a line with ".", " data " closes one with "?", so pages mix
    * kept lines (terminal punct + ≥5 words), short/unterminated drops,
    * and the last line never terminates; doc_id%11 plants "Lorem ipsum",
    * doc_id%13 plants "{", doc_id%7 appends a javascript line that the
    * javascript rule (and only it) must drop.
    */
  private def plantedC4Text(df: DataFrame): DataFrame =
    df.withColumn("text",
      concat(
        when(col("doc_id") % 11 === 0, lit("Lorem ipsum dolor sit amet today.\n")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit("{ cfg }\n")).otherwise(lit("")),
        replace(replace(col("text"), lit(" fast "), lit(".\n")),
          lit(" data "), lit("?\n")),
        when(col("doc_id") % 7 === 0,
          lit("\nEnable javascript to proceed now please.")).otherwise(lit(""))))

  private def plantedC4(s: SparkSession, dir: String): DataFrame =
    plantedC4Text(t(s, dir, "documents"))

  /** Deterministic sentence structure + a shared three-sentence
    * boilerplate passage appended to doc_id%10<3 docs for the span-dedup
    * gate: " merge " ends a sentence with ". ", " join " with "! ", so
    * docs carry many sentences and ~a third of the planted docs produce
    * the identical trimmed final span, which must dedup to its global
    * first (doc_id, pos) occurrence.
    */
  /** Arrivals for the ingest flagship: re-crawls of corpus pages
    * (doc_id%3==0, one appended tail sentence — near-dups the standing
    * corpus must drop) and genuinely new pages (doc_id%3==1, EXCLUDED
    * from the corpus seed — they must survive). Offsets +500000/+600000
    * are collision-free against the fixture id structure (originals
    * < 10^5 per replica, replicas at k·10^7).
    */
  private def ingestArrivals(s: SparkSession, dir: String): DataFrame = {
    val planted = plantedC4(s, dir)
    planted.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"),
          lit("\nExtra tail sentence appended here okay.")).as("text"))
      .unionByName(planted.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 600000).as("doc_id"), col("text")))
  }

  private def plantedSpans(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").withColumn("text",
      concat(
        replace(replace(col("text"), lit(" merge "), lit(". ")),
          lit(" join "), lit("! ")),
        when(col("doc_id") % 10 < 3,
          lit(" One shared passage sits here. It repeats across documents verbatim. Every planted page carries this boilerplate."))
          .otherwise(lit(""))))

  /** Deterministic messy URLs for the canonicalizer gate: uppercase
    * scheme/host, default ports on even ids, tracker params on ids%3,
    * fragments everywhere, and a non-URL row every 17 ids.
    */
  private def plantedUrls(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 17 === 0, lit("not a url"))
        .otherwise(concat(
          lit("HTTP://Ex"), col("doc_id") % 7, lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit("")),
          lit("/Path/"), col("doc_id") % 13,
          when(col("doc_id") % 3 === 0,
            lit("?utm_source=news&b=2&a=1&fbclid=x"))
            .otherwise(lit("?z=9&y=8")),
          lit("#f"), col("doc_id") % 5)).as("url"))

  private def plantedHtml(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), concat(
      lit("<html><head><title>T</title><style>p { color: red; }" +
        "</style></head><body><!-- drop me --><h1>H &amp;lt; X</h1>" +
        "<p class=\"a\">"),
      col("text"),
      lit(" &quot;q&#39;s&quot; &lt;tag&gt;&nbsp;end</p>" +
        "<script type=\"text/javascript\">var x = \"<p>not text</p>\";" +
        "</script></body></html>")).as("html"))

  /** Real image fixtures for the decode/resize gates: one BMP (even ids)
    * or PNG (odd ids) per doc_id < 200, pixel (x,y) = an exact integer
    * formula of (doc_id, x, y) so a SQL oracle can regenerate every RGB
    * value without reading the files. Both formats are lossless, so
    * ImageIO decode must reproduce the formula bit-exactly — that round
    * trip (formula → BufferedImage → encode → binaryFile scan → decode →
    * digest) is what the gates verify. Returns the fixture directory.
    */
  private def plantedImages(s: SparkSession, dir: String): String = {
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0))
    val out = new java.io.File(
      s"/tmp/graft-media-img/${new java.io.File(dir).getName}")
    out.mkdirs()
    ids.foreach { id =>
      val w = (8 + id % 9).toInt; val h = (6 + id % 7).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
          val g = ((id * 11 + x * 5 + y * 17) % 256).toInt
          val b = ((id * 3 + x * 23 + y * 29) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val fmt = if (id % 2 == 0) "bmp" else "png"
      javax.imageio.ImageIO.write(img, fmt,
        new java.io.File(out, f"$id%06d.$fmt"))
    }
    out.getAbsolutePath
  }

  /** Decoded images with the canonical pixel digest (md5 over the
    * comma-joined decimal RGB ints, row-major) — shared by the decode
    * and resize gates.
    */
  private def decodedImages(s: SparkSession, d: String): DataFrame = {
    val fixtures = plantedImages(s, d)
    s.read.format("binaryFile").load(fixtures + "/*.*")
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.(?:bmp|png)$", 1)
          .cast("long").as("doc_id"),
        col("content"))
  }

  /** Real WAV fixtures for the audio decode/resample gates: one 16-bit
    * little-endian signed PCM WAV per doc_id < 200, written through
    * `javax.sound.sampled.AudioSystem` itself, with sample (frame i,
    * channel c) = an exact integer formula of (doc_id, i, c) so a SQL
    * oracle regenerates every amplitude without reading the files. PCM is
    * lossless, so the decode must reproduce the formula bit-exactly —
    * that round trip (formula → AudioInputStream → WAV encode →
    * binaryFile scan → decode → digest) is what the gates verify.
    */
  private def plantedAudio(s: SparkSession, dir: String): String = {
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0))
    val out = new java.io.File(
      s"/tmp/graft-media-wav/${new java.io.File(dir).getName}")
    out.mkdirs()
    ids.foreach { id =>
      val sr = (8000 + (id % 3) * 4000).toInt
      val ch = (1 + id % 2).toInt
      val nf = (40 + id % 25).toInt
      val data = new Array[Byte](nf * ch * 2)
      var i = 0
      while (i < nf) {
        var c = 0
        while (c < ch) {
          val v = ((id * 31 + i * 17 + c * 101) % 65536).toInt - 32768
          val o = (i * ch + c) * 2
          data(o) = (v & 0xFF).toByte          // little-endian
          data(o + 1) = ((v >> 8) & 0xFF).toByte
          c += 1
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sr.toFloat, 16, ch, ch * 2, sr.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nf.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        new java.io.File(out, f"$id%06d.wav"))
    }
    out.getAbsolutePath
  }

  private def decodedAudio(s: SparkSession, d: String): DataFrame = {
    val fixtures = plantedAudio(s, d)
    s.read.format("binaryFile").load(fixtures + "/*.wav")
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.wav$", 1)
          .cast("long").as("doc_id"),
        col("content"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- core (C1-C8) -----
    "c1_identity" -> ((s, d) =>
      IdentityPipe()(t(s, d, "region")).orderBy("r_regionkey")),
    "c2_input_filter" -> ((s, d) =>
      SequentialPipe(Seq(ApplyToAllCols(upper(_), "upper")),
        inputFilter = Some(In(Seq("n_name"))))(t(s, d, "nation")).orderBy("n_name")),
    "c3_update_overlay" -> ((s, d) =>
      ApplyToCols(_ * 2, "x2", Seq("l_quantity"))(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),
    "c4_cached_stage" -> ((s, d) => {
      val pipe = LambdaPipe(
        _.groupBy("n_regionkey").agg(count(lit(1)).as("cnt")), "nation_cnt_by_region")
      CachedStage.through(pipe, "/tmp/graft-cache", s"nation@$d")(t(s, d, "nation"))
        .orderBy("n_regionkey")
    }),
    "c9_dataset_dict" -> ((s, d) => {
      val o = t(s, d, "orders")
      graft.core.DatasetDict.of(
        "open" -> o.filter(col("o_orderstatus") === "O"),
        "done" -> o.filter(col("o_orderstatus") === "F"))
        .transform(ApplyToCols(_ * 2, "x2", Seq("o_totalprice")))
        .toDF("split")
        .select("split", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey", "split")
    }),
    "c7_condition_filter" -> ((s, d) =>
      FilterKeys(Contains("name") || HasPrefix("n_nation"))(t(s, d, "nation"))
        .orderBy("n_nationkey")),
    "c8_gate_true" -> ((s, d) =>
      Gate(SchemaCondition.HasKeys(Seq("c_acctbal")),
        FilterKeys(In(Seq("c_custkey", "c_acctbal"))),
        Some(GetKey("c_custkey")))(t(s, d, "customer")).orderBy("c_custkey")),

    // ----- basics (B1-B12) -----
    "b3_getkey" -> ((s, d) => GetKey("p_name")(t(s, d, "part")).orderBy("p_name")),
    "b5_dropkeys" -> ((s, d) =>
      DropKeys(Seq("o_orderdate"))(t(s, d, "orders")).orderBy("o_orderkey")),
    "b6_addprefix" -> ((s, d) =>
      AddPrefix("doc.")(t(s, d, "documents")).orderBy(q("doc.doc_id"))),
    "b7_replaceinkeys" -> ((s, d) =>
      ReplaceInKeys("r_", "region_")(t(s, d, "region")).orderBy("region_regionkey")),
    "b8_renamekeys" -> ((s, d) =>
      RenameKeys(Map("s_suppkey" -> "id", "s_name" -> "name"))(t(s, d, "supplier"))
        .orderBy("id")),
    "b9_apply_elementwise" -> ((s, d) =>
      ApplyToCols(_ * 2, "x2", Seq("nums"), elementWise = true)(liNums(s, d))
        .orderBy("l_orderkey")),
    "b10_apply_all_upper" -> ((s, d) =>
      ApplyToAllCols(upper(_), "upper",
        inputFilter = Some(In(Seq("c_name", "c_mktsegment"))))(t(s, d, "customer"))
        .orderBy("c_custkey")),

    // ----- pipelines (P1-P5) -----
    "p1_sequential" -> ((s, d) =>
      SequentialPipe.of(
        DropKeys(Seq("l_shipdate")),
        ApplyToCols(_ * 2, "x2", Seq("l_quantity")))(t(s, d, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")),
    "p2_parallel" -> ((s, d) =>
      ParallelPipe.of(
        ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
        ApplyToCols(_ * 10, "x10", Seq("l_partkey")))(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity", "l_partkey"))
        .orderBy("l_orderkey", "l_linenumber")),
    "p3_gate_alt" -> ((s, d) =>
      Gate(SchemaCondition.HasKeys(Seq("missing_col")),
        GetKey("r_regionkey"), Some(GetKey("r_name")))(t(s, d, "region"))
        .orderBy("r_name")),
    "p4_block_sequential" -> ((s, d) =>
      BlockSequential(Seq(
        "project" -> FilterKeys(In(Seq("n_name", "n_regionkey"))),
        "upper" -> ApplyToAllCols(upper(_), "upper",
          inputFilter = Some(In(Seq("n_name"))))))(t(s, d, "nation"))
        .orderBy("n_name")),
    "p5_parallel_by_field" -> ((s, d) =>
      ParallelByField(Map(
        "doc" -> ApplyToCols(upper(_), "upper", Seq("doc.lang"))))(
        AddPrefix("doc.")(t(s, d, "documents"))).orderBy(q("doc.doc_id"))),

    // ----- nesting (N1-N6) -----
    "n1_flatten" -> ((s, d) =>
      FlattenPipe()(liNums(s, d)).orderBy("l_orderkey", "nums")),
    "n2_nest" -> ((s, d) =>
      NestPipe(8, Seq("ordv", "qty"), "ordv")(liOrd(s, d))
        .orderBy(element_at(col("ordv"), 1))),
    "n3_apply_as_flatten" -> ((s, d) =>
      ApplyAsFlatten(ApplyToCols(_ * 2, "x2", Seq("nums")))(liNums(s, d))
        .orderBy("l_orderkey")),
    "n4_nested_inner_filter" -> ((s, d) =>
      NestedPipe(LambdaPipe(_.filter(col("nums") % 2 === 0), "keep_even"))(liNums(s, d))
        .orderBy("l_orderkey")),
    "n5_nested_level2" -> ((s, d) => {
      // arrays of arrays: per order, line numbers grouped in pairs ->
      // Nested(level=2) doubles the innermost scalars
      val lvl2 = liNums(s, d).select(col("l_orderkey"),
        filter(
          transform(sequence(lit(0), floor((size(col("nums")) - 1) / 2).cast("int")),
            i => slice(col("nums"), i * 2 + 1, lit(2))),
          a => size(a) > 0).as("nn"))
      NestedPipe(ApplyToCols(_ * 2, "x2", Seq("nn")), level = 2)(lvl2)
        .orderBy("l_orderkey")
    }),
    "n6_expand" -> ((s, d) =>
      ExpandPipe(0, 3, Seq("r_name"))(t(s, d, "region")).orderBy("r_regionkey")),
    "n7_nest_idx" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          NestingOps.nestIdx(col("l_orderkey"), col("l_linenumber"), 10)
            .as("nest_idx"))
        .orderBy("nest_idx")),

    // ----- collate (L1-L7) -----
    "l4_apply_each" -> ((s, d) =>
      ApplyToEachExample(ApplyToCols(_ * 2, "x2", Seq("l_quantity")),
        checked = true)(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),
    "l1_collate" -> ((s, d) =>
      CollatePipe(16, Seq("ordv", "qty"), "ordv")(liOrd(s, d))
        .orderBy(element_at(col("ordv"), 1))),
    "l2_decollate" -> ((s, d) => {
      val nested = t(s, d, "lineitem").groupBy("l_orderkey").agg(
        sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("z"))
        .select(col("l_orderkey"),
          transform(col("z"), x => x.getField("l_linenumber")).as("nums"),
          transform(col("z"), x => x.getField("l_quantity")).as("qtys"))
      DeCollatePipe(Seq("nums", "qtys"))(nested).orderBy("l_orderkey", "nums", "qtys")
    }),
    "l3_first_eg" -> ((s, d) =>
      FirstEg()(t(s, d, "region").orderBy("r_regionkey"))),
    "l6_padding" -> ((s, d) =>
      PaddingPipe(Seq("input_ids"))(
        liNums(s, d).withColumnRenamed("nums", "input_ids")).orderBy("l_orderkey")),
    "l6b_padding_batch" -> ((s, d) =>
      // reference per-BATCH semantics (collate.py:137-178 pads to the
      // collate batch's max, never the corpus's): 50-row batches in
      // l_orderkey order, each padded to its own max — the 100 TB-safe
      // scope where one pathological row inflates only its own batch
      PaddingPipe(Seq("input_ids"),
        scope = PadScope.PerGroup(batchSize = 50, orderCol = "l_orderkey"))(
        liNums(s, d).withColumnRenamed("nums", "input_ids")).orderBy("l_orderkey")),
    "l7_collate_field" -> ((s, d) => {
      val dfIn = liNums(s, d).select(
        col("l_orderkey").as("tok.idx"),
        col("nums").as("tok.input_ids"),
        transform(col("nums"), _ => lit(1)).as("tok.attention_mask"))
      CollateFieldPipe("tok")(dfIn).orderBy(q("tok.idx"))
    }),

    // ----- dataset utils (U1-U3) -----
    "u1_take_subset" -> ((s, d) =>
      // hashKey mode: multiplicative-hash pseudo-shuffle — deterministic
      // and engine-independent, so DuckDB replays the exact subset.
      TakeSubset(n = Some(500), hashKey = Some("p_partkey"))(t(s, d, "part"))),
    "u2_keep_columns" -> ((s, d) =>
      KeepColumns(Seq("p_partkey", "p_name"))(t(s, d, "part")).orderBy("p_partkey")),
    "u3_concat_rows" -> ((s, d) => {
      val r = t(s, d, "region")
      Concatenate.rows(Seq(r, r)).orderBy("r_regionkey")
    }),
    "u3_concat_columns" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val extra = docs.select(col("doc_id"), (col("n_chars") * 2).as("n_chars_x2"))
      Concatenate.columns(Seq(docs, extra), on = "doc_id").orderBy("doc_id")
    }),

    // ----- text (T1-T2) -----
    "t1_tokenizer" -> ((s, d) =>
      graft.text.TokenizerPipe(returnTokenTypeIds = true)(
        t(s, d, "documents").select("doc_id", "text"))
        .select("doc_id", "input_ids", "attention_mask", "token_type_ids",
          "offset_mapping")
        .orderBy("doc_id")),
    "bp_bpe_encode" -> ((s, d) =>
      // FIXED merge table (learn-loops stay spec-only; encode is pure
      // expression logic, so it gets a real gate)
      graft.text.BpeEncodePipe("text", bpePinnedMerges)(
        t(s, d, "documents").select("doc_id", "text"))
        .select("doc_id", "bpe_tokens", "n_bpe_tokens")
        .orderBy("doc_id")),
    "bp_bpe_encode_sql" -> ((s, d) => {
      // the SQL surface of the same native kernel: bpe_encode(text,
      // '<merges>') with the merge table as a literal — hash-identical
      // to the pipe gate (same oracle)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "documents").createOrReplaceTempView("graft_bpe_docs")
      val spec = bpePinnedMerges.map { case (a, b) => s"$a $b" }.mkString("|")
      s.sql("SELECT doc_id, bpe_tokens, CAST(size(bpe_tokens) AS INT) " +
        "AS n_bpe_tokens FROM (SELECT doc_id, " +
        s"bpe_encode(text, '$spec') AS bpe_tokens FROM graft_bpe_docs) " +
        "ORDER BY doc_id")
    }),
    "t2_passages" -> ((s, d) => {
      val toks = graft.text.TokenizerPipe()(t(s, d, "documents").select("doc_id", "text"))
      graft.text.GeneratePassagesPipe(24, 16,
        startTokens = Seq(1), endTokens = Seq(2), globalKeys = Seq("doc_id"))(toks)
        .select("doc_id", "passage_idx", "input_ids", "attention_mask",
          "offset_mapping", "passage_mask", "text")
        .orderBy("doc_id", "passage_idx")
    }),

    // ----- search (S1-S8) -----
    "s2_dense_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.BruteForceDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false, queryIdCol = Some("qid")))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s1_ivf_dense" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      // nprobe = nlist: probing every inverted list makes IVF EXACT (the
      // full machinery — kmeans tagging, probe pruning joins, top-k — runs,
      // but the candidate set is total), so the brute-force SQL is an exact
      // oracle despite KMeans nondeterminism. nprobe < nlist recall is
      // covered by the recall@10 spec.
      //
      // stateDir: centroids + tagged corpus are fingerprint-cached (the
      // engine's own persistence feature, mirroring the reference's engine
      // state dirs) — the first execution pays the one-time KMeans build,
      // every later one measures the actual QUERY path. The bench's
      // min-of-2 therefore reports search cost, not build cost (the r6
      // verdict's s1 regression was 100% uncached build).
      val eng = graft.search.IVFDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        nlist = 10, nprobe = 10,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false, queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/ivf"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s1b_ivf_state_roundtrip" -> ((s, d) => {
      // engine-state LIFECYCLE (reference save/load, search/search.py:
      // 139-157): build an IVF engine with persisted state, then construct
      // a FRESH engine instance over the same stateDir + fingerprint — its
      // build() finds the _SUCCESS-marked parquet and reloads centroids +
      // tagged corpus WITHOUT refitting — and answer queries from the
      // reloaded state. nprobe = nlist keeps the oracle exact (as s1).
      val emb = t(s, d, "embeddings")
      val corpus = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val cfg = graft.search.SearchConfig(k = 8, fillMaskedIndices = false, queryIdCol = Some("qid"))
      val stateDir = Some("/tmp/graft-cache/ivf-rt")
      val fp = tableFp(s, d, "embeddings")
      val builder = graft.search.IVFDenseEngine(corpus, nlist = 8, nprobe = 8,
        config = cfg, stateDir = stateDir, corpusFingerprint = fp)
      builder.centroids // force build(): writes both state frames
      val reloaded = graft.search.IVFDenseEngine(corpus, nlist = 8, nprobe = 8,
        config = cfg, stateDir = stateDir, corpusFingerprint = fp)
      reloaded(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s3_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
      // stateDir: postings/dfreq/docs persist under the fingerprint cache
      // (same contract as s3c/s9/s14/s18/s21/s22) so the bench times the
      // QUERY join path, not a corpus re-tokenize every run
      val eng = graft.search.BM25Engine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false, queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s3"),
        corpusFingerprint = tableFp(s, d, "documents"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "ev_stream_bm25_search" -> ((s, d) => {
      // the lexical twin of ev_stream_dense_search: arriving query TEXTS
      // answered by a standing BM25 index (postings/dfreq/docs state
      // cached once) through the same foreachBatch harness — the s3
      // scoring oracle applies to the streamed results verbatim.
      val docs = t(s, d, "documents")
      val eng = graft.search.BM25Engine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s3"),
        corpusFingerprint = tableFp(s, d, "documents"))
      val queries = graft.streaming.EventStream
        .readStreamTable(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
      graft.streaming.SearchStream.runSearchStream(b => eng(b), queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s3c_bm25_filter" -> ((s, d) => {
      // filterKey path: candidates restricted to corpus docs whose `lang`
      // equals the query's `query.lang` (the ES term-filter semantics:
      // the filter prunes CANDIDATES; idf/avgdl statistics stay global)
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("lang").as("query.lang"))
      // stateDir: postings/dfreq/docs persist under the fingerprint cache
      // (search/BM25.scala `persisted`) so repeat runs measure the QUERY
      // join path, not a corpus re-tokenize — same contract as s1/s15-s17.
      val eng = graft.search.BM25Engine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false, queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        filterKey = Some("lang"), roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-filter"),
        corpusFingerprint = tableFp(s, d, "documents"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s4_group_lookup" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("idx"),
        col("l_orderkey"))
      val queries = t(s, d, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey").as("qid"),
          col("o_orderkey").as("query.l_orderkey"))
      val eng = graft.search.GroupLookupEngine(li, "l_orderkey",
        graft.search.SearchConfig(k = 8, fillMaskedIndices = false, queryIdCol = Some("qid")))
      eng(queries)
        .select(col("qid"), q("index.idx"), q("index.score"))
        .orderBy("qid")
    }),
    "s5_topk" -> ((s, d) => {
      val prev = t(s, d, "lineitem").groupBy("l_orderkey").agg(
        sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("z"))
        .select(col("l_orderkey").as("qid"),
          transform(col("z"), x => x.getField("l_linenumber").cast("long")).as("index.idx"),
          transform(col("z"), x => x.getField("l_quantity").cast("double")).as("index.score"))
      graft.search.TopkEngine(graft.search.SearchConfig(k = 3, fillMaskedIndices = false, queryIdCol = Some("qid")))(prev)
        .select(col("qid"), q("index.idx"), q("index.score"))
        .orderBy("qid")
    }),
    "s6_merge_engines" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val corpus = emb.select(col("vec_id").as("idx"),
        col("embedding").as("vector"), col("label"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"),
          col("label").as("query.label"))
      val dense = graft.search.BruteForceDenseEngine(corpus,
        graft.search.SearchConfig(k = 5, mergePreviousResults = false,
          fillMaskedIndices = false, queryIdCol = Some("qid")))
      val lookup = graft.search.GroupLookupEngine(corpus, "label",
        graft.search.SearchConfig(k = 5, fillMaskedIndices = false, queryIdCol = Some("qid")))
      graft.search.IndexPipe(Seq(dense, lookup))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s8b_index_builder" -> ((s, d) => {
      val model = graft.predict.LinearModel(
        Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble * 0.1)), Seq(0.0, 0.0))
      val emb = t(s, d, "embeddings")
      val idx = graft.search.IndexBuilder(
        emb.select(col("vec_id").as("idx"), col("embedding")),
        model, "/tmp/graft-cache", s"emb-ib@$d",
        config = graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding"))
      idx.query(queries, "qid", "embedding",
        extraEngines = Seq(graft.search.TopkEngine(
          graft.search.SearchConfig(k = 3, fillMaskedIndices = false,
            queryIdCol = Some("qid")))))
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "t3_field_collate" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text").as("doc.text"))
      val toks = graft.text.TokenizerPipe(field = Some("doc"),
        returnOffsetsMapping = false)(docs)
      CollateFieldPipe("doc")(toks)
        .select(col("doc_id"), q("doc.input_ids"), q("doc.attention_mask"))
        .orderBy("doc_id")
    }),
    "s8_index_cascade" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val dense = graft.search.BruteForceDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 50, fillMaskedIndices = false, queryIdCol = Some("qid")))
      val topk = graft.search.TopkEngine(
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false, queryIdCol = Some("qid")))
      graft.search.IndexPipe(Seq(dense, topk))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    // ----- predict (M1-M3) -----
    "m1_predict" -> ((s, d) => {
      val model = graft.predict.LinearModel(
        Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble)), Seq(0.0, 0.5))
      graft.predict.PredictWithoutCache(model, "embedding", "vector")(
        t(s, d, "embeddings").select("vec_id", "embedding"))
        .select(col("vec_id"),
          transform(col("vector"), v => round(v, 4)).as("vector"))
        .orderBy("vec_id")
    }),
    "m2_predict_cached" -> ((s, d) => {
      val model = graft.predict.LinearModel(
        Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble)), Seq(0.0, 0.5))
      graft.predict.PredictWithCache(model, "embedding", "vector",
        idCol = "vec_id", cacheDir = "/tmp/graft-cache",
        datasetFingerprint = s"embeddings@$d")(
        t(s, d, "embeddings").select("vec_id", "embedding"))
        .select(col("vec_id"),
          transform(col("vector"), v => round(v, 4)).as("vector"))
        .orderBy("vec_id")
    }),

    "m4_mlp_batched" -> ((s, d) => {
      // REAL batched inference shape: a two-layer formula MLP
      // (GEMM -> bias -> ReLU -> GEMM -> bias) over the embeddings
      // table, executed as BLOCKED dense GEMMs inside mapPartitions
      // (blockSize 128 exercises block boundaries at every sf) with the
      // PredictWithCache persistence contract; output fixed-point e4.
      // The oracle recomputes both layers from the weight formula —
      // k-ascending accumulation makes the doubles bit-identical.
      val m = graft.predict.MlpModel.formula(64, 32, 16)
      graft.predict.BatchedPredictPipe(m, "embedding", "vector", "vec_id",
        blockSize = 128, cacheDir = Some("/tmp/graft-cache"),
        datasetFingerprint = s"mlp:${tableFp(s, d, "embeddings")}")(
        t(s, d, "embeddings").select("vec_id", "embedding"))
        .select(col("vec_id"),
          transform(col("vector"),
            v => floor(v * 10000 + 0.5).cast("long")).as("vector"))
        .orderBy("vec_id")
    }),

    "m5_mlp_from_file" -> ((s, d) => {
      // Weight-FILE import closing the checkpointed-model story
      // (reference: torch checkpoints, pipes/predict.py:151-191): the
      // formula weights are round-tripped through a real safetensors
      // file (written F32 — every formula value is a small multiple of
      // 2^-4, so the widening back to double is exact), loaded via the
      // WeightIO reader, and run through the SAME batched GEMM as m4 —
      // uncached, exercising the in-place map-only path. The oracle
      // replays the formula, so any byte-layout slip in the writer or
      // reader shifts amplitudes and fails the hash. Model fingerprint
      // here is the file's SHA-256, not the structural weight hash.
      val m0 = graft.predict.MlpModel.formula(64, 32, 16)
      val path = "/tmp/graft-fixtures/mlp_formula_64_32_16.safetensors"
      graft.predict.WeightIO.writeSafeTensors(path, Seq(
        "w1" -> graft.predict.WeightIO.Tensor(Seq(64, 32), m0.w1.flatten.toArray),
        "b1" -> graft.predict.WeightIO.Tensor(Seq(32), m0.b1.toArray),
        "w2" -> graft.predict.WeightIO.Tensor(Seq(32, 16), m0.w2.flatten.toArray),
        "b2" -> graft.predict.WeightIO.Tensor(Seq(16), m0.b2.toArray)))
      val m = graft.predict.MlpModel.fromSafeTensors(path)
      graft.predict.BatchedPredictPipe(m, "embedding", "vector", "vec_id",
        blockSize = 128)(
        t(s, d, "embeddings").select("vec_id", "embedding"))
        .select(col("vec_id"),
          transform(col("vector"),
            v => floor(v * 10000 + 0.5).cast("long")).as("vector"))
        .orderBy("vec_id")
    }),

    // ----- LLM data-pipeline: dedup -----
    "dd_exact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
      graft.llm.ExactDedupPipe(Seq("text"), "doc_id")(planted).orderBy("doc_id")
    }),
    "dd_minhash_lsh" -> ((s, d) =>
      graft.llm.MinHashLSHDedupPipe("text", "doc_id", jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/lsh-planted"))(
        plantedNearDups(s, d))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),
    "dd_simhash" -> ((s, d) => {
      // poly61 token hash (DuckDB-replayable) + maxHamming 3 (band recall
      // is pigeonhole-EXACT there) => an exhaustive oracle matches the
      // banded pipe bit-for-bit. Exact copies at +20000 guarantee rows.
      val base = plantedNearDups(s, d)
      val exact = base.filter(col("doc_id") < 30).select(
        (col("doc_id") + 20000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      graft.llm.SimHashDedupPipe("text", "doc_id", maxHamming = 3,
        tokenHash = "poly61")(base.unionByName(exact))
        .orderBy("id_a", "id_b")
    }),
    "dd_ngram_jaccard" -> ((s, d) =>
      // scale-honest blocking: (lang, 8-char text prefix) — block
      // CARDINALITY grows with the corpus (sorted-neighborhood style), so
      // block sizes stay roughly constant at 100x, unlike lang x source
      // whose fixed ~20 blocks grow linearly and go quadratic. Planted
      // dups are tail edits, so they share the prefix block; head-edited
      // dups are the documented recall tradeoff (MinHashLSH is the
      // edit-position-robust path).
      graft.llm.NgramJaccardPipe("text", "doc_id", "blk", threshold = 0.3,
        cacheDir = Some("/tmp/graft-cache/ngram-planted"))(
        plantedNearDups(s, d)
          .withColumn("blk",
            concat_ws("/", col("lang"), substring(trim(col("text")), 1, 8))))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),
    "dd_edit_verify" -> ((s, d) =>
      // edit-distance exact-verify over the same planted tail-edit dups
      // and the same scale-honest (lang, 8-char prefix) blocking as
      // dd_ngram_jaccard: the length-gap prune rides the join condition,
      // the DP is the threshold-bounded banded kernel.
      graft.llm.EditDistanceDedupPipe("text", "doc_id", "blk",
        maxDistance = 16)(
        plantedNearDups(s, d)
          .withColumn("blk",
            concat_ws("/", col("lang"), substring(trim(col("text")), 1, 8))))
        .select(col("id_a"), col("id_b"), col("edit_distance"))
        .orderBy("id_a", "id_b")),
    "dd_edit_sql" -> ((s, d) => {
      // the BoundLevenshteinRule path end-to-end: the natural SQL
      // predicate (unbounded levenshtein <= k) is auto-rewritten to the
      // banded early-abandon kernel (the plan assert lives in
      // BoundLevenshteinRuleSpec); values must equal DuckDB's unbounded
      // replay of the same predicate.
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      val toks = split(col("text"), " ")
      // widen past the fixture's single file split: the banded DP is
      // CPU-heavy per row and would otherwise run on ONE task (3.4 s
      // serial at sf0.1, r16 StageProf); the stateless repartition
      // carries only the raw text
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"),
          array_join(slice(toks, lit(1), greatest(size(toks) - 2, lit(1))), " ")
            .as("mtext"))
        .createOrReplaceTempView("graft_sql_lev")
      // materialize the survivors once before the presentation sort:
      // a global orderBy re-executes its child inside the range
      // partitioner's SAMPLING pass, which would run the whole
      // edit-distance chain twice
      s.sql("SELECT doc_id, levenshtein(text, mtext) AS edit_distance " +
        "FROM graft_sql_lev WHERE levenshtein(text, mtext) <= 12")
        .localCheckpoint(true).orderBy("doc_id")
    }),
    "dd_cosine_neardup" -> ((s, d) =>
      graft.llm.EmbeddingCosineDedupPipe("embedding", "vec_id", "label",
        threshold = 0.15)(t(s, d, "embeddings").filter(col("vec_id") < 150))
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")),

    "dd_semdedup" -> ((s, d) => {
      // SemDeDup: semantic dedup scoped to nearest-centroid cells —
      // pairwise cosine only WITHIN a cell (Σ|cell|², not n²), survivor
      // = furthest from its centroid. Planted near-copies (the
      // dd_srp_cosine plant, cosine ~0.994) pair with their originals at
      // τ=0.9; organic max cosine here is 0.42, so every edge is a
      // planted one — 37/40 survive co-clustering (3 straddle a cell
      // boundary, the paper's accepted recall trade). vec_id cap keeps
      // the exhaustive oracle tractable (dd_cosine_neardup precedent).
      val raw = t(s, d, "embeddings").filter(col("vec_id") < 200).select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = raw.unionByName(raw.filter(col("vec_id") < 40).select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
      graft.llm.SemDeDupPipe("embedding", "vec_id",
        graft.llm.ClusterBalancedSamplePipe.formulaCentroids(16, 64),
        tau = 0.9)(planted)
        .select(col("id").as("vec_id"), col("kcluster"), col("dup_group"),
          col("kept"))
        .orderBy("vec_id")
    }),
    "cu_semdedup_contam" -> ((s, d) => {
      // cross-corpus SEMANTIC contamination: planted mutants (the
      // dd_semdedup plant) checked against the corpus within their
      // centroid cell only — never |train|×|corpus|. Organic cosine max
      // is 0.42, so every τ=0.9 hit is a mutant finding its original
      // (when they co-cluster — the documented cell-boundary trade).
      val corpus = t(s, d, "embeddings").filter(col("vec_id") < 200).select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val arriving = corpus.filter(col("vec_id") < 40).select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding"))
      graft.llm.CrossCorpusSemDeDupPipe(corpus, "embedding", "vec_id",
        "embedding", "vec_id",
        graft.llm.ClusterBalancedSamplePipe.formulaCentroids(16, 64),
        tau = 0.9)(arriving)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "ev_stream_semdedup" -> ((s, d) =>
      // the streaming twin: same plant, same cell-scoped stream-static
      // join inside a REAL StreamingQuery (zero state) — same oracle
      graft.streaming.EventStream.runSemDeDupStream(s, d)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")),
    "dd_srp_cosine" -> ((s, d) => {
      // SRP-LSH near-dup: block-free scale path for embedding dedup.
      // Planted near-copies (+= ((t%5)-2)/100 per component) keep cosine
      // ~0.994; formula hyperplanes make the exhaustive oracle exact
      val raw = t(s, d, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = raw.unionByName(raw.filter(col("vec_id") < 30).select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
      graft.llm.SRPCosineDedupPipe("embedding", "vec_id",
        cacheDir = Some("/tmp/graft-cache/srp-planted"))(planted)
        .select(col("id_a"), col("id_b"), col("hamming"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "dd_srp_wide" -> ((s, d) => {
      // the r14 WIDE signature layout (120 bits in two 60-bit words,
      // 2^20 buckets per band — the sizing knob that keeps SRP linear at
      // 200k+ vectors where the 60-bit layout ran quadratic): same
      // planted near-copies, the oracle replays both words' bit packing,
      // the word-spanning band extraction, and the two-word hamming.
      val raw = t(s, d, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = raw.unionByName(raw.filter(col("vec_id") < 30).select(
        (col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((i % 5) - 2) * 0.01).as("embedding")))
      graft.llm.SRPCosineDedupPipe("embedding", "vec_id", nBits = 120,
        cacheDir = Some("/tmp/graft-cache/srp-wide-planted"))(planted)
        .select(col("id_a"), col("id_b"), col("hamming"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "dd_clusters" -> ((s, d) => {
      val pairs = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
        jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/lsh-planted"))(plantedNearDups(s, d))
      graft.llm.DedupOps.connectedComponents(pairs).orderBy("id")
    }),
    "ev_stream_neardup" -> ((s, d) =>
      // REAL StreamingQuery: near-dup pairs discovered on the document
      // stream (flatMapGroupsWithState over band buckets); pair set
      // equals the batch LSH semantics the shared oracle replays
      graft.streaming.EventStream.runNearDedupStream(s, d)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),
    "ev_stream_neardup_unique" -> ((s, d) =>
      // the pair dedup runs INSIDE the StreamingQuery (two chained
      // stateful operators: band-bucket fMGWS → watermark-scoped pair
      // dedup) — the sink table is already unique, same oracle
      graft.streaming.EventStream.runNearDedupUniqueStream(s, d)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),
    "ev_stream_corpus_dedup" -> ((s, d) =>
      // STATELESS stream-vs-corpus near-dup: arriving mutated docs vs
      // the static corpus, stream-static band + verify joins only (no
      // streaming state at all); per-band duplicate findings dropped
      // after the drain per the documented contract
      graft.streaming.EventStream.runCorpusDedupStream(s, d)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),
    "l5_to_tensor" -> ((s, d) =>
      ToTensorPipe(Seq("nums"))(liNums(s, d)).orderBy("l_orderkey")),
    "s3b_bm25_aux" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = split(col("text"), " ")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(toks, lit(1), lit(5)), " ").as("query.text"),
          array_join(slice(toks, lit(6), (col("doc_id") % 4 + 1).cast("int")), " ")
            .as("query.aux_text"))
      // stateDir: aux/temperature are query-time knobs excluded from the
      // persisted-index key (BM25.scala `queryTimeParams`), so this gate
      // shares the s3 contract — warm runs time only the query path
      val eng = graft.search.BM25Engine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        auxWeight = 0.5, temperature = Some(2.0), roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s3b"),
        corpusFingerprint = tableFp(s, d, "documents"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "m2s2_cached_dense" -> ((s, d) => {
      val model = graft.predict.LinearModel(
        Seq(Seq.fill(64)(1.0), Seq.tabulate(64)(_.toDouble * 0.1)), Seq(0.0, 0.0))
      val withVec = graft.predict.PredictWithCache(model, "embedding", "vector",
        idCol = "vec_id", cacheDir = "/tmp/graft-cache",
        datasetFingerprint = s"emb2d@$d")(
        t(s, d, "embeddings").select("vec_id", "embedding"))
      val corpus = withVec.select(col("vec_id").as("idx"), col("vector"))
      val queries = withVec.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("vector").as("query.vector"))
      graft.search.BruteForceDenseEngine(corpus,
        graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    // ----- LLM data-pipeline: text analysis -----
    "ta_langid" -> ((s, d) =>
      graft.llm.LanguageIdPipe("text")(t(s, d, "documents"))
        .select("doc_id", "lang_pred").orderBy("doc_id")),
    "ta_quality" -> ((s, d) =>
      graft.llm.QualityScorePipe("text")(t(s, d, "documents"))
        .select("doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
          "digit_ratio", "upper_ratio", "quality")
        .orderBy("doc_id")),
    "ta_token_count" -> ((s, d) =>
      graft.llm.TokenCountPipe("text")(t(s, d, "documents"))
        .select("doc_id", "ws_tokens", "word_tokens", "est_bpe_tokens")
        .orderBy("doc_id")),
    "ta_fingerprint" -> ((s, d) =>
      graft.llm.FingerprintPipe("text")(t(s, d, "documents"))
        .select("doc_id", "fingerprint").orderBy("doc_id")),
    "ta_normalize" -> ((s, d) =>
      // CCNet normalization: lower + digits→0 + strip ASCII punct +
      // collapse whitespace; four codegen'd string expressions, map-only
      graft.llm.TextNormalizePipe("text")(t(s, d, "documents"))
        .select(col("doc_id"), col("text_norm")).orderBy("doc_id")),
    "ta_normalize_sql" -> ((s, d) => {
      // the SQL front end of the same chain: GraftExtensions registers
      // ccnet_normalize and the parser resolves it to the SAME expression
      // tree the pipe plans — one engine, two surfaces, identical bytes
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql("SELECT doc_id, ccnet_normalize(text) AS text_norm " +
        "FROM graft_sql_docs ORDER BY doc_id")
    }),
    "ta_quality_sql" -> ((s, d) => {
      // graft_quality(text) — the QualityScorePipe composite as a SQL
      // scalar (shared kernel, so the values are bit-identical)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql("SELECT doc_id, graft_quality(text) AS quality " +
        "FROM graft_sql_docs ORDER BY doc_id")
    }),
    "qg_gopher_rules" -> ((s, d) => {
      // Gopher §A1.1 heuristic rule battery (word-count/mean-length
      // bounds, symbol + bullet/ellipsis-line ratios, alpha-word share,
      // distinct stopwords). The corpus is single-line word soup, so the
      // gate plants deterministic structure first: every " line " starts
      // a bullet line, every " slow " closes its line with an ellipsis,
      // doc_id%5 docs get a '# ' header symbol, doc_id%7 docs end "...".
      // Every rule is an integer comparison — no double arithmetic for
      // the oracle to diverge on at any scale.
      graft.llm.GopherQualityPipe("text")(plantedStructured(s, d))
        .select("doc_id", "n_words", "sum_word_len", "n_lines",
          "bullet_lines", "ellipsis_lines", "alpha_words", "symbol_count",
          "distinct_stopwords", "rule_word_count", "rule_mean_word_len",
          "rule_symbol_ratio", "rule_bullet_lines", "rule_ellipsis_lines",
          "rule_alpha_words", "rule_stopwords", "gopher_keep")
        .orderBy("doc_id")
    }),
    "qg_gopher_sql" -> ((s, d) => {
      // graft_gopher_keep(text) — the battery folded to its keep flag as
      // a SQL scalar (shared kernel with the pipe, same planted input)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      plantedStructured(s, d).createOrReplaceTempView("graft_sql_gopher")
      s.sql("SELECT doc_id, graft_gopher_keep(text) AS gopher_keep " +
        "FROM graft_sql_gopher ORDER BY doc_id")
    }),
    "cu_c4_clean" -> ((s, d) => {
      // C4 §2.2 line battery over planted multi-line pages: terminal-
      // punct + ≥5-word + no-javascript line filter, page flags (lorem
      // ipsum / curly brace) on the ORIGINAL page, sentence-run count on
      // the cleaned page. Map-only; every rule integer/substring-exact.
      graft.llm.C4CleanPipe("text")(plantedC4(s, d))
        .select("doc_id", "text", "n_lines", "kept_lines", "n_sentences",
          "flag_lorem_ipsum", "flag_curly_brace", "rule_min_sentences",
          "c4_keep")
        .orderBy("doc_id")
    }),
    "cu_c4_clean_sql" -> ((s, d) => {
      // graft_c4_clean(text) — the line battery folded to the cleaned
      // page as a SQL scalar (shared kernel with the pipe)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      plantedC4(s, d).createOrReplaceTempView("graft_sql_c4")
      s.sql("SELECT doc_id, graft_c4_clean(text) AS text " +
        "FROM graft_sql_c4 ORDER BY doc_id")
    }),
    "dd_span_dedup" -> ((s, d) => {
      // C4's cross-corpus three-sentence-span dedup over planted
      // sentence structure with a shared boilerplate passage: global
      // first (doc_id, pos) occurrence survives, every other exact span
      // is removed and each doc is rebuilt from its survivors in order.
      graft.llm.SpanDedupPipe("text", "doc_id")(plantedSpans(s, d))
        .select("doc_id", "text", "n_spans_removed")
        .orderBy("doc_id")
    }),
    "ld_intra_doc" -> ((s, d) => {
      // within-page repetition removal: every " line " in the soup plants
      // the SAME boilerplate line multiple times per doc; first
      // occurrence survives in order. Map-only (the shuffle-free half of
      // line dedup — corpus-frequency removal is ld_line_dedup).
      val planted = t(s, d, "documents").withColumn("text",
        replace(col("text"), lit(" line "),
          lit("\nRepeated boilerplate block.\n")))
      graft.llm.IntraDocLineDedupPipe("text")(planted)
        .select("doc_id", "text", "n_intra_removed").orderBy("doc_id")
    }),
    "mm_binary_ingest" -> ((s, d) => {
      // multimodal INGEST through Spark's binaryFile source: a
      // deterministic fixture of media-like files (ASCII magic
      // stand-ins — real magic bytes aren't replayable through a SQL
      // oracle's string algebra) is laid down from the documents table,
      // read back as (path, length, content), and reduced to the typed
      // metadata + content-digest shape every downstream multimodal
      // pipe consumes. At scale this is the scan path for raw
      // image/audio blobs: one file per task slot, no decode on read.
      val rows = t(s, d, "documents").filter(col("doc_id") < 200)
        .select("doc_id", "text").collect()
      val dir = new java.io.File(
        s"/tmp/graft-media/${new java.io.File(d).getName}")
      dir.mkdirs()
      rows.foreach { r =>
        val id = r.getLong(0)
        val magic = (id % 3) match {
          case 0 => "PNG"; case 1 => "JPG"; case _ => "BIN" }
        val payload = magic + r.getString(1).take(64)
        java.nio.file.Files.write(
          new java.io.File(dir, f"$id%06d.bin").toPath,
          payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      s.read.format("binaryFile").load(dir.getAbsolutePath + "/*.bin")
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length"),
          substring(col("content"), 1, 3).cast("string").as("format"),
          md5(col("content")).as("digest"))
        .orderBy("doc_id")
    }),
    "cu_url_canonicalize" -> ((s, d) => {
      // crawl-key normalizer over planted messy URLs: case, default
      // ports, fragments, tracker params, param order — all map-only;
      // the oracle replays the identical anchored regex + list algebra.
      graft.llm.UrlCanonicalizePipe("url")(plantedUrls(s, d))
        .select("doc_id", "url_canonical", "url_host", "url_valid")
        .orderBy("doc_id")
    }),
    "cu_url_canonical_sql" -> ((s, d) => {
      // graft_url_canonical(url) — the normalizer folded to its canonical
      // form as a SQL scalar (shared kernel with the pipe)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      plantedUrls(s, d).createOrReplaceTempView("graft_sql_urls")
      s.sql("SELECT doc_id, graft_url_canonical(url) AS url_canonical " +
        "FROM graft_sql_urls ORDER BY doc_id")
    }),
    "tx_html_extract" -> ((s, d) => {
      // C4-lineage HTML -> text extraction: every doc wrapped in markup
      // with style/script PAYLOADS (must vanish with their contents), a
      // comment, attributes, and the six entities — incl. the
      // decode-order trap &amp;lt; (must come out as literal "&lt;", not
      // "<"). The oracle replays the identical RE2 pattern chain.
      graft.llm.HtmlExtractPipe("html")(plantedHtml(s, d))
        .select(col("doc_id"), col("text_extracted")).orderBy("doc_id")
    }),
    "tx_html_extract_sql" -> ((s, d) => {
      // the SQL front end of the same chain: GraftExtensions registers
      // html_extract and the parser resolves it to the SAME expression
      // tree HtmlExtractPipe plans — identical bytes, same oracle
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      plantedHtml(s, d).createOrReplaceTempView("graft_sql_html")
      s.sql("SELECT doc_id, html_extract(html) AS text_extracted " +
        "FROM graft_sql_html ORDER BY doc_id")
    }),
    "ta_langid_sql" -> ((s, d) => {
      // graft_langid(text) — the LanguageIdPipe vote as a SQL scalar
      // (shared kernel, identical values, same oracle as ta_langid)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql("SELECT doc_id, graft_langid(text) AS lang_pred " +
        "FROM graft_sql_docs ORDER BY doc_id")
    }),
    "ta_fingerprint_sql" -> ((s, d) => {
      // graft_fingerprint(text) — the rolling document fingerprint as a
      // SQL scalar (shared kernel, same oracle as ta_fingerprint)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "documents").createOrReplaceTempView("graft_sql_docs")
      s.sql("SELECT doc_id, graft_fingerprint(text) AS fingerprint " +
        "FROM graft_sql_docs ORDER BY doc_id")
    }),
    "ws_weighted_sample" -> ((s, d) =>
      // Efraimidis-Spirakis weighted sampling without replacement:
      // global top-120 by ln(u)/w with the engine-reproducible hash u —
      // plans as TakeOrderedAndProject (O(k) per partition, no sort)
      graft.llm.WeightedSamplePipe("doc_id", "n_chars", 120)(
        t(s, d, "documents"))
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")),
    "ws_weighted_stratified" -> ((s, d) =>
      // per-language stratum: same key, GroupTopK per lang
      graft.llm.WeightedSamplePipe("doc_id", "n_chars", 20, Seq("lang"))(
        t(s, d, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),
    "ta_fold_accents" -> ((s, d) => {
      // the native FoldAccents Catalyst expression inside the normalize
      // chain: accented text planted onto every doc (same literal on
      // both sides), folded NFD-style — DuckDB strip_accents replays it
      val planted = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" café Zürich niño àéîõü ÀÉÎÕÜ ç!")).as("text"))
      graft.llm.TextNormalizePipe("text", foldAccents = true)(planted)
        .select(col("doc_id"), col("text_norm")).orderBy("doc_id")
    }),
    "dd_norm_dedup" -> ((s, d) => {
      // the CCNet use of normalization: dedup KEYS on the normalized
      // text, so planted case/punctuation variants collide with their
      // originals (dup_count = 2) where raw exact dedup would miss them
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = base.unionByName(base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
      SequentialPipe(Seq(
        graft.llm.TextNormalizePipe("text"),
        graft.llm.ExactDedupPipe(Seq("text_norm"), "doc_id")))(planted)
        .select(col("doc_id"), col("dup_count")).orderBy("doc_id")
    }),

    // ----- LLM data-pipeline: multimodal plumbing -----
    "mm_decode_real" -> ((s, d) => {
      // REAL image decode: formula-pixel BMP/PNG fixtures laid down from
      // the documents table, scanned via binaryFile, decoded with
      // javax.imageio inside mapPartitions; the oracle regenerates every
      // RGB value from the same integer formula — so dims AND the
      // md5 pixel digest must match byte-exactly, proving the decode
      // (not a stub) end-to-end.
      val dec = graft.llm.DecodeImagePipe("content")(decodedImages(s, d))
      dec.select(col("doc_id"),
        col("image.width").as("width"),
        col("image.height").as("height"),
        col("image.channels").as("channels"),
        md5(array_join(
          transform(col("image.pixels"), p => p.cast("string")), ",")
          .cast("binary")).as("pix_digest"))
        .orderBy("doc_id")
    }),
    "mm_resize_real" -> ((s, d) => {
      // REAL image resize: decode + exact nearest-neighbor resample to
      // 7x5 (src = floor(dst*srcDim/dstDim)); the oracle computes the
      // same mapping over the formula pixels, so the resized digest
      // replays byte-exactly.
      val dec = graft.llm.ResizeImagePipe("content", targetW = 7,
        targetH = 5)(decodedImages(s, d))
      dec.select(col("doc_id"),
        col("image_resized.width").as("width"),
        col("image_resized.height").as("height"),
        md5(array_join(
          transform(col("image_resized.pixels"), p => p.cast("string")), ",")
          .cast("binary")).as("pix_digest"))
        .orderBy("doc_id")
    }),
    "mm_audio_decode" -> ((s, d) => {
      // REAL audio decode: formula-sample PCM WAV fixtures scanned via
      // binaryFile, decoded with javax.sound.sampled inside
      // mapPartitions; the oracle regenerates every amplitude from the
      // same integer formula — format fields AND the md5 sample digest
      // must match byte-exactly, proving the decode end-to-end.
      val dec = graft.llm.DecodeAudioPipe("content")(decodedAudio(s, d))
      dec.select(col("doc_id"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.channels").as("channels"),
        col("audio.n_frames").as("n_frames"),
        md5(array_join(
          transform(col("audio.samples"), v => v.cast("string")), ",")
          .cast("binary")).as("sample_digest"))
        .orderBy("doc_id")
    }),
    "mm_audio_resample" -> ((s, d) => {
      // REAL audio resample: decode + exact nearest-neighbor frame
      // resample to 24 frames (src = floor(dst*nFrames/24), channels
      // copied); the oracle computes the same mapping over the formula
      // samples, so the resampled digest replays byte-exactly.
      val dec = graft.llm.ResampleAudioPipe("content", targetFrames = 24)(
        decodedAudio(s, d))
      dec.select(col("doc_id"),
        col("audio_resampled.sample_rate").as("sample_rate"),
        col("audio_resampled.channels").as("channels"),
        col("audio_resampled.n_frames").as("n_frames"),
        md5(array_join(
          transform(col("audio_resampled.samples"), v => v.cast("string")), ",")
          .cast("binary")).as("sample_digest"))
        .orderBy("doc_id")
    }),
    "mm_media_meta" -> ((s, d) => {
      val out = graft.llm.ToMediaColumnPipe("text")(t(s, d, "documents"))
      out.select(col("doc_id"),
        col("media_meta").getField("format").as("format"),
        col("media_meta").getField("n_bytes").as("n_bytes"))
        .orderBy("doc_id")
    }),
    "mm_decode_stub" -> ((s, d) => {
      val media = graft.llm.ToMediaColumnPipe("text")(
        t(s, d, "documents").select("doc_id", "text"))
      graft.llm.ByteFeaturesPipe("media", "doc_id", dim = 8)(media)
        .select(col("doc_id"),
          transform(col("media_features"), v => round(v, 4)).as("f"))
        .orderBy("doc_id")
    }),
    "mm_frame_sample" -> ((s, d) => {
      val media = graft.llm.ToMediaColumnPipe("text")(
        t(s, d, "documents").select("doc_id", "text"))
      graft.llm.FrameSamplePipe("media")(media)
        .select(col("doc_id"),
          transform(col("frames"), f => f.getField("offset")).as("offsets"),
          transform(col("frames"), f => f.getField("data").cast("string")).as("chunks"))
        .orderBy("doc_id")
    }),

    // ----- events / relational headliners -----
    "ev_window_agg" -> ((s, d) => {
      // the shared reader adapts to events.parquet's physical ts encoding
      // (TIMESTAMP(NANOS), bare INT64 epoch-nanos, TIMESTAMP_NTZ micros,
      // or TIMESTAMP) — see EventStream.adaptTs
      graft.streaming.EventStream.readBatch(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sv"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("cnt"), col("sv"))
        .orderBy("ws", "event_type")
    }),
    "ev_stream_window" -> ((s, d) =>
      graft.streaming.EventStream.runWindowedAggStream(s, d)
        .orderBy("ws", "event_type")),
    "ev_stream_dedup" -> ((s, d) =>
      // REAL StreamingQuery: watermarked dropDuplicatesWithinWatermark
      // over the event stream (at-least-once delivery dedup); the fixture
      // spans days, so a 30-day bound keeps every recurrence in state and
      // the batch DISTINCT oracle is exact
      graft.streaming.EventStream.runDedupStream(s, d,
        Seq("user_id", "event_type"), "30 days")
        .orderBy("user_id", "event_type")),
    "ev_stream_join" -> ((s, d) =>
      // REAL StreamingQuery: watermarked stream-stream interval join —
      // the streaming twin of rj_range, same inequality-join oracle shape
      graft.streaming.EventStream.runStreamStreamJoin(s, d)
        .orderBy("event_id", "err_id")),
    "ev_stream_curate" -> ((s, d) => {
      // the SAME llm-curation pipe (PiiRedact) running unchanged inside a
      // REAL StreamingQuery — the unified batch/stream engine story for
      // the curation family; planted PII is replayed by the oracle
      val streamed = graft.streaming.EventStream.readStream(s, d)
        .withColumn("note", concat(col("props"),
          lit(" reach user"), col("event_id").cast("string"),
          lit("@example.com or 555-"),
          lpad(pmod(col("event_id"), lit(10000)).cast("string"), 4, "0")))
      val out = graft.llm.PiiRedactPipe("note", outputCol = "note_redacted")(
        streamed)
      graft.streaming.EventStream.runToMemorySink(
        out.select("event_id", "n_emails", "n_phones", "n_ips",
          "note_redacted"), "append")
        .orderBy("event_id")
    }),
    "ev_stream_enrich" -> ((s, d) =>
      // REAL StreamingQuery: stateless stream-static broadcast join of
      // the event stream against the customer dimension
      graft.streaming.EventStream.runEnrichStream(s, d)
        .select("event_id", "user_id", "event_type", "value",
          "c_mktsegment", "c_acctbal")
        .orderBy("event_id")),
    "ev_sessionize" -> ((s, d) =>
      graft.streaming.SessionizePipe(gapSeconds = 1800)(
        graft.streaming.EventStream.readBatch(s, d))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy("user_id", "session_idx")),
    "q1_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q3_order_revenue" -> ((s, d) => {
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(100)
    }),

    // ----- scale utilities as gate rows (salting, bucketed layout) -----
    "sj_salted_join" -> ((s, d) => {
      // salting shards each key into 8 sub-keys; the VALUES must be
      // row-for-row identical to the plain join (oracle = plain SQL join)
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"), col("s_nationkey"))
      graft.operators.Salting.saltedJoin(li, sup, Seq("l_suppkey"), saltFactor = 8)
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "sj_salted_agg" -> ((s, d) => {
      // two-phase (keys+salt, then keys) decomposable aggregation; long
      // sums keep the oracle exact regardless of merge order
      val li = t(s, d, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey").as("ok"),
        col("l_linenumber").cast("long").as("ln"))
      graft.operators.Salting.saltedAgg(li, Seq("l_returnflag"),
        Map("qty" -> "sum", "ok" -> "count", "ln" -> "max"), saltFactor = 16)
        .orderBy("l_returnflag")
    }),
    "bj_bucketed_join" -> ((s, d) => {
      // pay-once co-location: both sides written bucketed+sorted on the
      // join key, the later join plans with zero Exchange (plan shape is
      // asserted in ScaleOpsSpec); the gate checks VALUES survive the
      // bucketed round-trip
      val o = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      graft.sources.BucketedTables.write(o, "g_orders_bkt", "o_orderkey", 8)
      graft.sources.BucketedTables.write(l, "g_lineitem_bkt", "o_orderkey", 8)
      graft.sources.BucketedTables
        .colocatedJoin(s, "g_orders_bkt", "g_lineitem_bkt", Seq("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
        .orderBy("o_orderkey")
    }),

    // ----- registry/dispatch surfaces as data-producing gates -----
    "s9_auto_engine" -> ((s, d) => {
      // S9: engine resolved BY NAME from the AutoSearchEngine registry
      // (reference auto.py); result must match the directly-constructed
      // BM25 oracle on a distinct query slice
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
      // stateDir threads through the registry to BM25Engine's fingerprint
      // cache — warm runs measure dispatch + query, not an index rebuild
      val eng = graft.search.AutoSearchEngine("bm25", docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("idxCol" -> "doc_id", "textCol" -> "text",
          "roundScores" -> "4",
          "stateDir" -> "/tmp/graft-cache/bm25-auto",
          "fingerprint" -> tableFp(s, d, "documents")))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "m3_dispatch" -> ((s, d) => {
      // M3: the cache-or-compute dispatcher itself (cacheDir=None routes
      // to PredictWithoutCache) with an alternating-sign readout model
      val model = graft.predict.LinearModel(
        Seq(Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)), Seq(0.25))
      graft.predict.Predict(model, "embedding", "vector")(
        t(s, d, "embeddings").select("vec_id", "embedding"))
        .select(col("vec_id"),
          transform(col("vector"), v => round(v, 4)).as("vector"))
        .orderBy("vec_id")
    }),

    // ----- composed curation pipeline (the library's raison d'être) -----
    "pp_clean_pipeline" -> ((s, d) => {
      // language-ID -> quality scoring -> curation filter -> exact dedup
      // -> token counting, composed as ONE SequentialPipe over documents
      // with planted exact duplicates; the oracle replays the whole chain
      val docs = t(s, d, "documents")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000))
      val pipe = SequentialPipe(Seq(
        graft.llm.LanguageIdPipe("text"),
        graft.llm.QualityScorePipe("text"),
        LambdaPipe(_.filter(col("quality") >= 0.5 &&
          col("lang_pred") === col("lang")), "curation_floor"),
        graft.llm.ExactDedupPipe(Seq("text"), "doc_id"),
        graft.llm.TokenCountPipe("text")))
      pipe(planted)
        .select(col("doc_id"), col("lang"), col("lang_pred"), col("quality"),
          col("dup_count"), col("ws_tokens"), col("est_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // ----- PQ / IVF-PQ with deterministic codebooks: exact ADC oracles -----
    "s10_pq_adc" -> ((s, d) => {
      // fixed formula codebooks make encoding + ADC fully deterministic;
      // the oracle replays nearest-centroid codes and ADC sums exactly
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.PQDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        stateDir = Some("/tmp/graft-cache/pq"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s11_ivfpq_exact" -> ((s, d) => {
      // nprobe = nlist probes every inverted list, so the full IVF-PQ
      // machinery (kmeans tagging, probe joins, tagged-code ADC) runs with
      // a TOTAL candidate set — with fixed codebooks the result equals the
      // PQ ADC ranking independent of KMeans nondeterminism (same oracle)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.IVFPQDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        nlist = 8, nprobe = 8, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        stateDir = Some("/tmp/graft-cache/ivfpq"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s12_ivfpq_residual" -> ((s, d) => {
      // FAISS-style residual IVF-PQ, made fully deterministic: formula
      // centroids (argmin-L2 tagging, no KMeans) + formula codebooks over
      // the residuals + nprobe = nlist. score = q·centroid (exact) +
      // ADC(q, residual codes) — the DuckDB oracle replays every term.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.IVFPQDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        nlist = 8, nprobe = 8, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        residual = true,
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivfpq-resid"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s13_faiss_factory" -> ((s, d) => {
      // a reference-style FAISS factory string builds the engine: IVF8 +
      // PQ8x4 (m=8, nbits=4 -> codebookSize 16), nprobe=nlist and fixed
      // formula codebooks so the result is the deterministic exhaustive
      // ADC ranking — hash-identical to s11's oracle, proving the string
      // path constructs the same engine as the explicit constructor
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.FaissFactory.parse("IVF8,PQ8x4").build(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("nprobe" -> "8", "residual" -> "false",
          "stateDir" -> "/tmp/graft-cache/faiss",
          "fingerprint" -> tableFp(s, d, "embeddings")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s15_sq8_dense" -> ((s, d) => {
      // FAISS "SQ8" factory (IndexScalarQuantizer QT_8bit) through the
      // registry's factory-string path: per-dim min/max train + 8-bit
      // codes + ADC are all DETERMINISTIC, so the oracle replays
      // train → encode → ADC → top-k from the raw table with no
      // fixed-state injection (the only dense gate with that property)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.AutoSearchEngine("SQ8",
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("stateDir" -> "/tmp/graft-cache/sq",
          "fingerprint" -> tableFp(s, d, "embeddings")))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s16_ivf_sq8" -> ((s, d) => {
      // "IVF8,SQ8" (IndexIVFScalarQuantizer) with nprobe = nlist: every
      // inverted list is probed, so the candidate set is total and the
      // flat-SQ oracle stays exact despite KMeans nondeterminism in the
      // list assignment (the s1 trick); scores carry no coarse term
      // (non-residual SQ codes against global stats)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.AutoSearchEngine("IVF8,SQ8",
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 8, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("nprobe" -> "8",
          "stateDir" -> "/tmp/graft-cache/ivfsq",
          "fingerprint" -> tableFp(s, d, "embeddings")))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s17_lsh_dense" -> ((s, d) => {
      // LSH-bucketed retrieval by registry name (the dedup family's SRP
      // signatures + band buckets pointed at top-k): candidates are
      // bucket-mates only, exact dot ranks them — fully deterministic
      // (formula hyperplanes), so the oracle replays sign/band/score
      // end-to-end. A query may have fewer than k bucket-mates, so the
      // -1/-inf resize padding is dropped before the dump (the oracle
      // lists only real candidates)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.AutoSearchEngine("dense_lsh",
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("stateDir" -> "/tmp/graft-cache/lsh",
          "fingerprint" -> tableFp(s, d, "embeddings")))
      val pairs = filter(
        zip_with(q("index.idx"), q("index.score"),
          (i, sc) => struct(i.as("i"), sc.as("s"))),
        p => p.getField("i") >= 0)
      eng(queries)
        .select(col("qid"),
          transform(pairs, _.getField("i")).as("index.idx"),
          transform(pairs, p => round(p.getField("s"), 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s24_lsh_multiprobe" -> ((s, d) => {
      // multi-probe LSH (Lv et al. VLDB'07): per band the query also
      // probes the buckets one bit-flip away (bits 0 and 1 of the band
      // hash — deterministic, replayable), widening recall WITHOUT
      // touching the persisted signatures; candidate set is a superset
      // of s17's, still bucketed. Same padding-drop as s17.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.AutoSearchEngine("dense_lsh",
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("stateDir" -> "/tmp/graft-cache/lsh",
          "fingerprint" -> tableFp(s, d, "embeddings"), "probes" -> "2"))
      val pairs = filter(
        zip_with(q("index.idx"), q("index.score"),
          (i, sc) => struct(i.as("i"), sc.as("s"))),
        p => p.getField("i") >= 0)
      eng(queries)
        .select(col("qid"),
          transform(pairs, _.getField("i")).as("index.idx"),
          transform(pairs, p => round(p.getField("s"), 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s25_ivf_add" -> ((s, d) => {
      // incremental index maintenance: build over two thirds of the
      // corpus, addVectors the rest — only the NEW rows are tagged, the
      // standing index is appended verbatim (O(|extra|), never
      // O(index)). nprobe=4 < nlist=8: a REAL pruned search, and the
      // oracle replays every term (formula centroids, argmin-L2 tagging,
      // probe pruning, member top-k) over the UNION — asserting
      // incremental add == build-over-union exactly.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0), nlist = 8, nprobe = 4,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-add"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":b23")
      val eng = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":add3")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s27_ivf_rebalance" -> ((s, d) => {
      // coarse-quantizer maintenance: build over two thirds, addVectors
      // the rest (tags pinned to the ORIGINAL formula centroids), then
      // REBALANCE onto a different deterministic quantizer — every row
      // re-tagged, the incremental base dissolved. nprobe=4 < nlist=8
      // keeps the search genuinely pruned, so the oracle replaying the
      // NEW centroids (probe + tagging + member top-k over the full
      // corpus) passes ONLY if the re-tag actually happened.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0), nlist = 8, nprobe = 4,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-rebalance"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":rb-base")
      val grown = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":rb-add")
      // the retrained quantizer: a different integer formula, replayable
      val cents2 = (0 until 8).map(c => (0 until 64).map(t =>
        (((c * 31 + t * 7) % 17) - 8) * 0.05))
      val eng = grown.rebalance(
        fingerprint = tableFp(s, d, "embeddings") + ":rb2",
        newFixedCentroids = Some(cents2))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s28_ivfpq_rebalance" -> ((s, d) => {
      // composed-engine maintenance end-to-end: residual IVF-PQ built
      // over two thirds, addVectors the rest (coarse centroids +
      // codebooks pinned), then REBALANCE onto a different deterministic
      // coarse quantizer — every row re-tagged AND its residual code
      // re-encoded against the NEW centroids (fine codebooks stay
      // pinned; with residual=true a quantizer change necessarily
      // re-encodes). nprobe=4 < nlist=8 keeps the search genuinely
      // pruned, so the oracle replaying probe + re-tag + residual
      // re-encode + ADC over the NEW formula passes ONLY if both the
      // re-tag and the re-encode actually happened (the s27 gate
      // construction applied to the composed engine; reference
      // counterpart: IVF retrain over a standing PQ index,
      // vector_base/utils/faiss.py:247-410).
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFPQDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0),
        nlist = 8, nprobe = 4, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        residual = true,
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivfpq-rebalance"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":rbq-base")
      val grown = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":rbq-add")
      // the retrained coarse quantizer: s27's replayable integer formula
      val cents2 = (0 until 8).map(c => (0 until 64).map(t =>
        (((c * 31 + t * 7) % 17) - 8) * 0.05))
      val eng = grown.rebalance(
        fingerprint = tableFp(s, d, "embeddings") + ":rbq2",
        newFixedCentroids = Some(cents2))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s41_recall_drift" -> ((s, d) => {
      // the closed maintenance loop, ORACLE-REPLAYABLE end to end (the
      // RecallDriftSpec scenario re-shaped onto deterministic formula
      // quantizers): a drifted ingest (every vector +10 per component,
      // offset ids) is added to a PINNED formula-A index, partial-probe
      // recall vs the brute-force truth is MEASURED, the index is
      // rebalanced onto formula B (4 centroids covering the drifted
      // region), and recall is measured AGAIN — DuckDB replays both
      // evaluations (probe + tag + top-k + the RecallEval integer
      // arithmetic), so the recovery NUMBER sits under the oracle, not
      // just a spec assertion. The drift is float(x+10f) so the shifted
      // vectors are bit-identical on both engines.
      val emb = t(s, d, "embeddings")
      val base = emb.select(col("vec_id").as("idx"),
        col("embedding").as("vector"))
      val drift = emb.select((col("vec_id") + 100000000L).as("idx"),
        transform(col("embedding"), v => v + lit(10.0f)).as("vector"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val candCfg = graft.search.SearchConfig(k = 10,
        fillMaskedIndices = false, queryIdCol = Some("qid"))
      val truthCfg = candCfg.copy(indexField = "truth",
        mergePreviousResults = false)
      val pinned = graft.search.IVFDenseEngine(base, nlist = 8, nprobe = 2,
        config = candCfg,
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)))
        .addVectors(drift)
      val truth = graft.search.BruteForceDenseEngine(
        base.unionByName(drift), truthCfg)
      val before = graft.search.RecallEval.vs(pinned, truth, queries, "qid")
        .select(col("qid"), col("recall_bp").cast("long").as("before_bp"))
      // the retrained quantizer: formula B allocates centroids 4-7 to the
      // drifted mass (+10 shift) — integer-replayable, unlike the seeded
      // KMeans the spec uses
      val centsB = (0 until 8).map(c => (0 until 64).map(t =>
        (((c * 31 + t * 7) % 17) - 8) * 0.05 +
          (if (c >= 4) 10.0 else 0.0)))
      val rb = pinned.rebalance(newFixedCentroids = Some(centsB))
      val after = graft.search.RecallEval.vs(rb, truth, queries, "qid")
        .select(col("qid"), col("recall_bp").cast("long").as("after_bp"))
      before.join(after, "qid").orderBy("qid")
    }),

    "ev_stream_dense_search" -> ((s, d) => {
      // similarity search on ARRIVING queries: a standing IVF index
      // (fixed centroids, state-cached once before the stream starts)
      // answers each micro-batch of query vectors inside a REAL
      // StreamingQuery via foreachBatch — the per-batch body IS the
      // batch engine, so nprobe=nlist keeps it exact and the s1-style
      // brute-force oracle applies to the streamed results verbatim.
      val emb = t(s, d, "embeddings")
      val eng = graft.search.IVFDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector")),
        nlist = 8, nprobe = 8,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-stream"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      val queries = graft.streaming.EventStream
        .readStreamTable(s, d, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      graft.streaming.SearchStream.runSearchStream(b => eng(b), queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s34_ivf_remove" -> ((s, d) => {
      // deletion — the third maintenance verb (add O(new) s25, rebalance
      // O(index) s27, now remove = a map-side filter over the standing
      // tagged lists, centroids pinned): build over the FULL corpus,
      // removeVectors(idx % 5 = 2). nprobe=4 < nlist=8 keeps the search
      // genuinely pruned, and the oracle replays tag + probe + member
      // top-k over ONLY the surviving rows — queries 2 and 7 are
      // themselves deleted, so their self-match must vanish from the
      // results for the hash to pass.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFDenseEngine(
        vecs, nlist = 8, nprobe = 4,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-remove"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":full")
      val eng = base.removeVectors(col("idx") % 5 === 2,
        fingerprint = tableFp(s, d, "embeddings") + ":rm5")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s35_ivfpq_remove" -> ((s, d) => {
      // deletion on the COMPOSED compressed index: residual IVF-PQ over
      // the full corpus, removeVectors(idx % 5 = 2) — tagged lists
      // map-side filtered AND the payload-free codes anti-joined against
      // the removed ids; centroids, codebooks, rotation all stay pinned,
      // nothing re-encodes. The oracle replays tag + residual encode +
      // probe + ADC over ONLY the surviving rows (the s12 replay with a
      // WHERE), so orphan codes or un-dropped tags both hash-fail.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFPQDenseEngine(
        vecs, nlist = 8, nprobe = 4, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        residual = true,
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivfpq-remove"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":full")
      val eng = base.removeVectors(col("idx") % 5 === 2,
        fingerprint = tableFp(s, d, "embeddings") + ":rm5")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s36_bm25_remove" -> ((s, d) => {
      // deletion on the lexical index: BM25 stats built over the full
      // corpus (persisted base — the standing-index shape), then
      // removeDocuments(docId % 5 = 2) — postings/docs map-side
      // filtered, per-term df DECREMENTED by the removed docs' distinct
      // counts, n/avgdl re-aggregated from survivors. Every statistic is
      // a sum, so the result is exactly a rebuild over the survivors —
      // which is what the oracle replays: df, n, AND avgdl all shift
      // with the deletion, so serving any stale statistic hash-fails.
      val docs = t(s, d, "documents")
      val cfg = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      val base = graft.search.BM25Engine(docs, cfg,
        corpusIdxCol = "doc_id", corpusTextCol = "text",
        roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-remove"),
        corpusFingerprint = tableFp(s, d, "documents") + ":full")
      val eng = base.removeDocuments(col("docId") % 5 === 2)
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s37_sq_remove" -> ((s, d) => {
      // deletion on the scalar quantizer: SQ8 trained over the FULL
      // corpus, removeVectors(idx % 5 = 2) — per-dim stats stay pinned,
      // the standing codes map-side filter, nothing re-encodes. The
      // oracle replays full train + encode but scores ONLY the
      // survivors: queries 2 and 7 are themselves deleted, so their
      // self-match must vanish, and any stale code row hash-fails.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.SQDenseEngine(vecs,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/sq-remove"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":full")
      val eng = base.removeVectors(col("idx") % 5 === 2,
        fingerprint = tableFp(s, d, "embeddings") + ":rm5")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s38_ivfsq_remove" -> ((s, d) => {
      // deletion on the composed IVF,SQ8 index: tagged lists map-side
      // filtered AND payload-free codes anti-joined against the removed
      // ids; centroids and per-dim stats stay pinned. nprobe = nlist
      // makes the candidate set total (the s16 trick), so the flat-SQ
      // survivor replay is exact despite KMeans list assignment — a
      // stale tag or orphan code adds a candidate and hash-fails.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFSQDenseEngine(vecs, nlist = 8, nprobe = 8,
        config = graft.search.SearchConfig(k = 8, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/ivfsq-remove"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":full")
      val eng = base.removeVectors(col("idx") % 5 === 2,
        fingerprint = tableFp(s, d, "embeddings") + ":rm5")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s39_lsh_remove" -> ((s, d) => {
      // deletion on the signature index: LSH built over the full corpus,
      // removeVectors(idx % 5 = 2) — signatures AND rescoring vectors
      // both map-side filter, nothing re-signs. Hyperplanes are a
      // corpus-independent formula, so the oracle replays sign/band/
      // score over ONLY the survivors; deleted bucket-mates (including
      // the deleted queries' self-matches) must vanish. Padding dropped
      // as in s17 (bucket candidates can be short).
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.LSHDenseEngine(vecs,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/lsh-remove"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":full")
      val eng = base.removeVectors(col("idx") % 5 === 2,
        fingerprint = tableFp(s, d, "embeddings") + ":rm5")
      val pairs = filter(
        zip_with(q("index.idx"), q("index.score"),
          (i, sc) => struct(i.as("i"), sc.as("s"))),
        p => p.getField("i") >= 0)
      eng(queries)
        .select(col("qid"),
          transform(pairs, _.getField("i")).as("index.idx"),
          transform(pairs, p => round(p.getField("s"), 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s40_jaccard_remove" -> ((s, d) => {
      // deletion on the lexical inverted index: Jaccard built over the
      // full corpus, removeDocuments(docId % 5 = 2) — postings and
      // per-doc sizes both map-side filter, nothing re-shingles
      // (per-document shingling has no corpus statistics, the property
      // that made the add exact). The oracle replays shingle/join/score
      // over ONLY the surviving docs; queries still come from the full
      // table, so deleted self-matches must vanish.
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
      val base = graft.search.JaccardEngine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/jaccard-remove"),
        corpusFingerprint = tableFp(s, d, "documents") + ":full")
      val eng = base.removeDocuments(col("docId") % 5 === 2,
        fingerprint = tableFp(s, d, "documents") + ":rm5")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s29_filtered_ivf" -> ((s, d) => {
      // filtered ANN (FAISS IDSelector / vector-DB payload filter): the
      // `label` payload column is carried into the tagged index state at
      // build time, and a query-time predicate (label % 3 = 1, ~30%
      // selectivity) prunes inverted-list members BEFORE the dot
      // products — composing multiplicatively with the nprobe=4 < nlist=8
      // probe pruning. The oracle replays probe + tag + FILTER + member
      // top-k, so it passes only if the predicate actually restricted
      // the scored set (an unfiltered engine returns different top-10s).
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val eng = graft.search.IVFDenseEngine(
        emb.select(col("vec_id").as("idx"), col("embedding").as("vector"),
          col("label")),
        nlist = 8, nprobe = 4,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-filtered"),
        corpusFingerprint = tableFp(s, d, "embeddings"),
        carryCols = Seq("label"),
        memberFilter = Some(col("label") % 3 === 1))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s32_lsh_add" -> ((s, d) => {
      // incremental maintenance for the SIGNATURE index: LSH built over
      // two thirds, addVectors the rest — only the new rows are signed,
      // the standing signatures and vectors append verbatim. The
      // hyperplanes are a corpus-independent formula (no training), so
      // add ≡ full build EXACTLY and the s17 oracle applies VERBATIM —
      // the only engine family whose incremental add needs no pinning.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.LSHDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0),
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/lsh-add"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":lsh-base")
      val eng = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":lsh-add")
      val pairs = filter(
        zip_with(q("index.idx"), q("index.score"),
          (i, sc) => struct(i.as("i"), sc.as("s"))),
        p => p.getField("i") >= 0)
      eng(queries)
        .select(col("qid"),
          transform(pairs, _.getField("i")).as("index.idx"),
          transform(pairs, p => round(p.getField("s"), 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s33_jaccard_add" -> ((s, d) => {
      // incremental maintenance for the lexical inverted index: Jaccard
      // built over two thirds, addDocuments the rest — only the new docs
      // are shingled, postings/sizes append verbatim. Per-doc shingling
      // has no corpus statistics (unlike BM25's df/avgdl merge), so add
      // ≡ full build exactly and the s22 oracle applies VERBATIM.
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
      val base = graft.search.JaccardEngine(
        docs.filter(col("doc_id") % 3 =!= 0),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/jaccard-add"),
        corpusFingerprint = tableFp(s, d, "documents") + ":jc-base")
      val eng = base.addDocuments(docs.filter(col("doc_id") % 3 === 0),
        fingerprint = tableFp(s, d, "documents") + ":jc-add")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s31_recall_eval" -> ((s, d) => {
      // the recall-measurement operator a production ANN deployment runs
      // continuously: a genuinely PRUNED candidate (nprobe=2 < nlist=8,
      // deterministic formula quantizer) evaluated against the exact
      // brute-force truth — per-query hits / truth_k / fixed-point
      // recall_bp, all integer-exact. The oracle replays BOTH engines
      // and the intersection, so it passes only if the measurement is
      // exactly the two rankings' overlap (recall here is well under
      // 10000 bp — the pruning genuinely bites).
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val cand = graft.search.IVFDenseEngine(
        vecs, nlist = 8, nprobe = 2,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivf-recall"),
        corpusFingerprint = tableFp(s, d, "embeddings"))
      val truth = graft.search.BruteForceDenseEngine(
        vecs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid"), indexField = "truth",
          mergePreviousResults = false))
      graft.search.RecallEval.vs(cand, truth, queries, "qid")
        .select("qid", "hits", "truth_k", "recall_bp")
        .orderBy("qid")
    }),

    "s30_sq_add" -> ((s, d) => {
      // incremental maintenance for the SCALAR quantizer: SQ8 built over
      // two thirds (per-dim min/max trained THERE), addVectors the rest
      // — new rows encode against the PINNED stats, so components
      // outside the trained range must SATURATE at code 0/255. Min/max
      // training is deterministic, so the oracle replays the pinned
      // train + full encode (clamp included) + ADC with NO fixed-state
      // injection — the only incremental gate with that property.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.SQDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0),
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        stateDir = Some("/tmp/graft-cache/sq-add"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":sq-base")
      val eng = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":sq-add")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s26_ivfpq_add" -> ((s, d) => {
      // incremental maintenance for the COMPOSED index: residual IVF-PQ
      // built over two thirds, addVectors the rest — only the new rows
      // are tagged AND encoded, coarse centroids + codebooks pinned.
      // Same deterministic formula state as s12, so the s12 oracle
      // (exhaustive replay of every coarse + ADC term over the union)
      // applies verbatim: incremental == build-over-union, bit for bit.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("query.vector"))
      val vecs = emb.select(col("vec_id").as("idx"), col("embedding").as("vector"))
      val base = graft.search.IVFPQDenseEngine(
        vecs.filter(col("idx") % 3 =!= 0),
        nlist = 8, nprobe = 8, m = 8, codebookSize = 16,
        config = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        fixedCodebooks = Some(graft.search.PQDenseEngine.formulaCodebooks(8, 16, 8)),
        residual = true,
        fixedCentroids = Some(graft.search.IVFDenseEngine.formulaCentroids(8, 64)),
        stateDir = Some("/tmp/graft-cache/ivfpq-add"),
        corpusFingerprint = tableFp(s, d, "embeddings") + ":b23")
      val eng = base.addVectors(vecs.filter(col("idx") % 3 === 0),
        fingerprint = tableFp(s, d, "embeddings") + ":add3")
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s14_lexical_dense_cascade" -> ((s, d) => {
      // the reference user guide's documented end-user flow
      // (user_guide/src/examples/index.py:46-63): elasticsearch(k=100) →
      // dense(k=3) with merge_previous_results — a BM25 recall stage, an
      // exact dense scorer, and the offset-merge (A-only: s_a + min(B);
      // B-only: s_b + min(A); both: s_a + s_b), resized to the final k=3.
      // Corpus = documents ⋈ embeddings on id, so every item has both a
      // text and a vector, as the reference's dataset does.
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      // both engines take several actions over the corpus (BM25 stats
      // build + score join; dense count + scan) — materialize the join
      // once instead of recomputing it per action
      val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("idx"), col("text"),
          col("embedding").as("vector"))
        .localCheckpoint()
      val queries = corpus.filter(col("idx") < 10)
        .select(col("idx").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("vector").as("query.vector"))
      // stateDir threads the fingerprint cache through the BM25 stats
      // build (same as s3c/s9/s18/s22) so the bench times the cascade's
      // QUERY path, not an inline stats rebuild every run
      val s14fp = graft.core.Fingerprint.combine(
        tableFp(s, d, "documents"), tableFp(s, d, "embeddings"))
      val bm25 = graft.search.BM25Engine(corpus,
        graft.search.SearchConfig(k = 100, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "idx", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s14"),
        corpusFingerprint = s14fp)
      val dense = graft.search.BruteForceDenseEngine(
        corpus.select(col("idx"), col("vector")),
        graft.search.SearchConfig(k = 3, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      graft.search.IndexPipe(Seq(bm25, dense))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s18_bm25_sq_cascade" -> ((s, d) => {
      // composition gate for the r9 engines: bm25(k=20) recall → SQ8 ADC
      // re-score (k=5) through IndexPipe, the SQ engine resolved by its
      // FAISS FACTORY STRING ("SQ8") from the registry — proves the new
      // names compose with the reference offset-merge (result.py:199-239)
      // exactly as the s14 user-guide cascade does with exact dense.
      // SQ8 is fully deterministic (min/max train), so the oracle replays
      // BOTH stages plus the merge from the raw tables.
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("idx"), col("text"),
          col("embedding").as("vector"))
        .localCheckpoint()
      val queries = corpus.filter(col("idx") < 10)
        .select(col("idx").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("vector").as("query.vector"))
      val fp = graft.core.Fingerprint.combine(
        tableFp(s, d, "documents"), tableFp(s, d, "embeddings"))
      val bm25 = graft.search.BM25Engine(corpus,
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "idx", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-cascade"),
        corpusFingerprint = fp)
      val sq = graft.search.AutoSearchEngine("SQ8",
        corpus.select(col("idx"), col("vector")),
        graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        opts = Map("stateDir" -> "/tmp/graft-cache/sq-cascade",
          "fingerprint" -> fp))
      graft.search.IndexPipe(Seq(bm25, sq))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s19_rrf_fusion" -> ((s, d) => {
      // rank-only fusion of HETEROGENEOUS engines (BM25 log-idf sums vs
      // raw dot products — incomparable score scales where the S6
      // sum_scores merge is unsound): fused = Σ_e 1/(60 + rank_e), the
      // oracle replays both rankings rank-for-rank. The fusion itself is a
      // per-row Column program over the two ranked arrays — zero shuffles
      // beyond what the engines already own.
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("idx"), col("text"),
          col("embedding").as("vector"))
        .localCheckpoint()
      val queries = corpus.filter(col("idx") < 10)
        .select(col("idx").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("vector").as("query.vector"))
      // stateDir: same contract as s14 — the joined-corpus fingerprint
      // keys the persisted stats so warm runs time the fusion, not a
      // BM25 stats rebuild
      val s19fp = graft.core.Fingerprint.combine(
        tableFp(s, d, "documents"), tableFp(s, d, "embeddings"))
      val bm25 = graft.search.BM25Engine(corpus,
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "idx", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s19"),
        corpusFingerprint = s19fp)
      val dense = graft.search.BruteForceDenseEngine(
        corpus.select(col("idx"), col("vector")),
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      graft.search.RRFFusionPipe(Seq(bm25, dense),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        rrfK = 60.0, roundScores = Some(6))(queries)
        .select(col("qid"), q("index.idx"), q("index.score"))
        .orderBy("qid")
    }),

    "s20_maxsim_rerank" -> ((s, d) => {
      // ColBERT two-stage serving shape: brute dense recall (k=20) over
      // the base vector → MaxSim late-interaction re-rank (k=5) over
      // per-token vectors. The multi-vector corpus is synthesized
      // deterministically (base embedding + circular shifts) so the
      // oracle replays every max/sum term exactly.
      def shl(c: org.apache.spark.sql.Column, p: Int) =
        concat(slice(c, lit(p + 1), size(c) - p), slice(c, lit(1), lit(p)))
      val emb = t(s, d, "embeddings")
      val corpus = emb.select(col("vec_id").cast("long").as("idx"),
        col("embedding").as("vector"))
      val mv = emb.select(col("vec_id").cast("long").as("idx"),
        array(col("embedding"), shl(col("embedding"), 1),
          shl(col("embedding"), 2)).as("vectors"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").cast("long").as("qid"),
          col("embedding").as("query.vector"),
          array(col("embedding"), shl(col("embedding"), 1)).as("query.vectors"))
      val dense = graft.search.BruteForceDenseEngine(corpus,
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      val maxsim = graft.search.MaxSimEngine(mv,
        graft.search.SearchConfig(k = 5, fillMaskedIndices = false,
          queryIdCol = Some("qid")), roundScores = Some(4))
      graft.search.IndexPipe(Seq(dense, maxsim))(queries)
        .select(col("qid"), q("index.idx"), q("index.score"))
        .orderBy("qid")
    }),

    "s21_bm25_incremental" -> ((s, d) => {
      // additive index maintenance: stats built on the even/odd halves
      // INDEPENDENTLY, merged with BM25Stats.merge — exactly the
      // full-rebuild statistics (disjoint doc ids), so the oracle is the
      // plain full-corpus replay. The 100 TB path: the base side's frames
      // load from the persisted state dir; only the delta is tokenized.
      val docs = t(s, d, "documents")
      val cfg = graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
        queryIdCol = Some("qid"))
      // the base (even) half loads from the persisted state dir — the
      // 100 TB shape this gate exists to prove; the odd half is the
      // freshly-tokenized DELTA, deliberately built per run
      def half(c: DataFrame, tag: String, cached: Boolean) =
        graft.search.BM25Engine(c, cfg,
          corpusIdxCol = "doc_id", corpusTextCol = "text",
          stateDir = if (cached) Some("/tmp/graft-cache/bm25-inc") else None,
          corpusFingerprint = tableFp(s, d, "documents") + ":" + tag)
      val merged = graft.search.BM25Stats.merge(
        half(docs.filter(col("doc_id") % 2 === 0), "even", cached = true).stats,
        half(docs.filter(col("doc_id") % 2 === 1), "odd", cached = false).stats)
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"))
      graft.search.BM25Engine(docs, cfg, corpusIdxCol = "doc_id",
        corpusTextCol = "text", roundScores = Some(4),
        fixedStats = Some(merged))(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),

    "s22_jaccard_search" -> ((s, d) => {
      // the dedup family's n-gram Jaccard as a QUERY operator: top-k
      // corpus docs overlapping the query text — the per-example
      // contamination lookup. Inverted-shingle equi-join; candidates
      // share >= 1 shingle, never a cross product.
      val docs = t(s, d, "documents")
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 8), " ").as("query.text"))
      // stateDir: the inverted shingle index persists under the
      // fingerprint cache so the bench times the QUERY join, not a
      // per-run re-shingle — same contract as s1/s3c/s15-s17
      val eng = graft.search.JaccardEngine(docs,
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "doc_id", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/jaccard"),
        corpusFingerprint = tableFp(s, d, "documents"))
      eng(queries)
        .select(col("qid"), q("index.idx"),
          transform(q("index.score"), v => round(v, 4)).as("index.score"))
        .orderBy("qid")
    }),
    "s23_weighted_fusion" -> ((s, d) => {
      // convex-combination hybrid: per-engine min-max normalization over
      // the returned list, fused 0.7·bm25 + 0.3·dense — the magnitude-
      // preserving sibling of s19's rank-only RRF
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("idx"), col("text"),
          col("embedding").as("vector"))
        .localCheckpoint()
      val queries = corpus.filter(col("idx") < 10)
        .select(col("idx").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("query.text"),
          col("vector").as("query.vector"))
      // stateDir: same contract as s14/s19 — warm runs time the fusion,
      // not a BM25 stats rebuild
      val s23fp = graft.core.Fingerprint.combine(
        tableFp(s, d, "documents"), tableFp(s, d, "embeddings"))
      val bm25 = graft.search.BM25Engine(corpus,
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        corpusIdxCol = "idx", corpusTextCol = "text", roundScores = Some(4),
        stateDir = Some("/tmp/graft-cache/bm25-s23"),
        corpusFingerprint = s23fp)
      val dense = graft.search.BruteForceDenseEngine(
        corpus.select(col("idx"), col("vector")),
        graft.search.SearchConfig(k = 20, fillMaskedIndices = false,
          queryIdCol = Some("qid")))
      graft.search.WeightedFusionPipe(Seq(bm25, dense), Seq(0.7, 0.3),
        graft.search.SearchConfig(k = 10, fillMaskedIndices = false,
          queryIdCol = Some("qid")),
        roundScores = Some(6))(queries)
        .select(col("qid"), q("index.idx"), q("index.score"))
        .orderBy("qid")
    }),
    "dd_keep_best" -> ((s, d) => {
      // duplicate-cluster RESOLUTION policy: clusters from the planted
      // LSH pairs, survivor = longest member (token count), ties by min
      // id; never-matched docs are singleton clusters and always survive
      val base = plantedNearDups(s, d)
      val pairs = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
        jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/lsh-planted"))(base)
      val clusters = graft.llm.DedupOps.connectedComponents(pairs)
      graft.llm.DedupOps.resolveKeepBest(
        base.withColumn("score", size(split(col("text"), " "))),
        clusters, "doc_id", "score")
        .select(col("doc_id"), col("cluster"), col("kept"))
        .orderBy("doc_id")
    }),

    // ----- data layout / incremental maintenance / profiling -------------
    "sp_split" -> ((s, d) =>
      // deterministic holdout assignment: quadratic-mixer hash of the id,
      // threshold cuts at floor(cumFraction·p) — rerun/cluster/engine-
      // invariant, map-only
      graft.llm.SplitPipe("doc_id")(t(s, d, "documents"))
        .select(col("doc_id"), col("split")).orderBy("doc_id")),
    "sp_split_leakfree" -> ((s, d) => {
      // leakage-free holdout: near-dup CLUSTERS split atomically — a doc
      // and its near-duplicates can never straddle train/test (the
      // contamination a row-wise split builds in by construction). Split
      // key = cluster id (min member); singletons key on themselves.
      val base = plantedNearDups(s, d)
      val clusters = graft.llm.DedupOps.connectedComponents(
        graft.llm.MinHashLSHDedupPipe("text", "doc_id",
          jaccardThreshold = 0.5,
          cacheDir = Some("/tmp/graft-cache/lsh-planted"))(base))
      val withC = base
        .join(clusters.select(col("id").as("doc_id"), col("cluster")),
          Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      graft.llm.SplitPipe("cluster")(withC)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy("doc_id")
    }),
    "qa_quantiles" -> ((s, d) =>
      // CorpusStatsPipe in EXACT mode: Spark `percentile`'s linear
      // interpolation replays bit-for-bit as DuckDB quantile_cont
      // (approx=true is the bounded-memory 100 TB default, spec-covered)
      graft.llm.CorpusStatsPipe(Seq("lang"), "len",
        quantiles = Seq(0.5, 0.9, 0.99), approx = false)(
        t(s, d, "documents").withColumn("len", size(split(col("text"), " "))))
        .select(col("lang"), col("n"), col("p50"), col("p90"), col("p99"))
        .orderBy("lang")),
    "pr_profile" -> ((s, d) =>
      // one aggregate pass: row/null/exact-distinct/min/max for every
      // profiled column (multiple count-distincts plan ONE scan + Expand)
      graft.pipes.ProfilePipe(
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"))(
        t(s, d, "lineitem"))
        .orderBy("col_name")),
    "pr_profile_approx" -> ((s, d) =>
      // the 100 TB default: HLL++ distincts — NO Expand, plain partial
      // aggregation. Spark's HLL estimate is not DuckDB-replayable, so
      // the oracle checks the deterministic stats exactly and the
      // estimate via an always-true sanity band (n_distinct must still
      // be COMPUTED for the band, so the HLL aggregate cannot be pruned
      // out of the timed plan; the estimate-vs-exact tolerance itself is
      // ProfileSpec's job)
      graft.pipes.ProfilePipe(
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"),
        exact = false)(t(s, d, "lineitem"))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          (col("n_distinct") >= 1 &&
            col("n_distinct") <= col("n_rows") * 2).as("nd_sane"),
          col("min_s"), col("max_s"))
        .orderBy("col_name")),
    "zo_zorder" -> ((s, d) => {
      // the z-value layout key: 8-bit × 2-dim Morton interleave over
      // bucketed (custkey, orderkey). ORDER BY zval IS the order
      // ZOrder.layout's range exchange writes, so the oracle verifies the
      // exact curve the clustering would lay on disk.
      t(s, d, "orders").select(col("o_orderkey"),
        graft.operators.ZOrder.zvalue(
          Seq(col("o_custkey") % 256, col("o_orderkey") % 256), 8).as("zval"))
        .orderBy("zval", "o_orderkey")
    }),
    "zo_zvalue_sql" -> ((s, d) => {
      // graft_zvalue(bits, dims...) — the Morton key as a SQL scalar via
      // GraftExtensions; same curve as zo_zorder, parsed not composed
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      t(s, d, "orders").createOrReplaceTempView("graft_sql_orders")
      s.sql("SELECT o_orderkey, graft_zvalue(8, o_custkey % 256, " +
        "o_orderkey % 256) AS zval FROM graft_sql_orders " +
        "ORDER BY zval, o_orderkey")
    }),
    "mg_upsert" -> ((s, d) => {
      // CDC MERGE: updates (%7, status→'U', price+10), deletes (%13),
      // inserts (key+1e8) — disjoint by construction, one change row per
      // key. Anti-join + union: the base side never shuffles when the
      // change set broadcasts.
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val updates = base
        .filter(col("o_orderkey") % 7 === 3 && col("o_orderkey") % 13 =!= 5)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 10.0).as("o_totalprice"),
          lit(false).as("__del__"))
      val deletes = base.filter(col("o_orderkey") % 13 === 5)
        .withColumn("__del__", lit(true))
      val inserts = base.filter(col("o_orderkey") % 11 === 2)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          col("o_totalprice"), lit(false).as("__del__"))
      val changes = updates.unionByName(deletes).unionByName(inserts)
      graft.operators.UpsertMerge(base, changes, Seq("o_orderkey"),
        deleteCol = Some("__del__"))
        .orderBy("o_orderkey")
    }),

    "mg_upsert_stream" -> ((s, d) => {
      // the STREAMING read path of the versioned CDC table: seed → two
      // micro-batches through StreamingUpsert.run → read back _LATEST.
      // Batch 1 deletes/updates rows that exist ONLY because batch 0
      // inserted them, so the result proves sequential batch semantics
      // (a reversed order would resurrect the deleted inserts). The
      // oracle replays the same two MERGEs as nested CTEs.
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val k = col("o_orderkey")
      def tuples(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
      val b0 = tuples(
        base.filter(k % 7 === 3 && k % 13 =!= 5)
          .select(k, col("o_custkey"), lit("U").as("s"),
            (col("o_totalprice") + 10.0).as("p"), lit(false).as("del"))
        .unionByName(base.filter(k % 11 === 2)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("N").as("s"), col("o_totalprice").as("p"), lit(false).as("del"))))
      val b1 = tuples(
        base.filter(k % 13 === 5)
          .select(k, col("o_custkey"), col("o_orderstatus").as("s"),
            col("o_totalprice").as("p"), lit(true).as("del"))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 0)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            col("o_orderstatus").as("s"), col("o_totalprice").as("p"),
            lit(true).as("del")))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 1)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("X").as("s"), (col("o_totalprice") + 5.0).as("p"),
            lit(false).as("del"))))
      val dir = java.nio.file.Files.createTempDirectory("graft-ups").toString
      graft.streaming.StreamingUpsert.seed(base, s"$dir/t")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Double, Boolean)]
      val q = graft.streaming.StreamingUpsert.run(
        mem.toDF.toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "__del__"),
        s"$dir/t", Seq("o_orderkey"), Some("__del__"), s"$dir/ckpt")
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      q.stop()
      graft.streaming.StreamingUpsert.latest(s, s"$dir/t").get
        .orderBy("o_orderkey")
    }),

    "mg_upsert_evolve" -> ((s, d) => {
      // additive schema evolution: the change set carries a NEW `quality`
      // column — merged output gains it, untouched base rows read NULL,
      // no backfill rewrite. Same update/delete/insert families as
      // mg_upsert so the merge semantics stay oracle-replayable.
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val updates = base
        .filter(col("o_orderkey") % 7 === 3 && col("o_orderkey") % 13 =!= 5)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 10.0).as("o_totalprice"),
          (col("o_orderkey") % 100 / 100.0).as("quality"),
          lit(false).as("__del__"))
      val deletes = base.filter(col("o_orderkey") % 13 === 5)
        .withColumn("quality", lit(0.0)).withColumn("__del__", lit(true))
      val inserts = base.filter(col("o_orderkey") % 11 === 2)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          col("o_totalprice"), lit(1.0).as("quality"),
          lit(false).as("__del__"))
      val changes = updates.unionByName(deletes).unionByName(inserts)
      graft.operators.UpsertMerge(base, changes, Seq("o_orderkey"),
        deleteCol = Some("__del__"), allowNewColumns = true)
        .orderBy("o_orderkey")
    }),

    "mg_version_diff" -> ((s, d) => {
      // time-travel CDC audit: the SAME seed + two micro-batches as
      // mg_upsert_stream, then StreamingUpsert.diff(vinit, v1) — one
      // classified row per changed key (insert/delete/update with
      // before/after), unchanged keys absent. One shuffle join on the
      // merge key; the oracle replays the merges then FULL OUTER JOINs
      // the endpoints with IS DISTINCT FROM semantics.
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val k = col("o_orderkey")
      def tuples(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
      val b0 = tuples(
        base.filter(k % 7 === 3 && k % 13 =!= 5)
          .select(k, col("o_custkey"), lit("U").as("s"),
            (col("o_totalprice") + 10.0).as("p"), lit(false).as("del"))
        .unionByName(base.filter(k % 11 === 2)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("N").as("s"), col("o_totalprice").as("p"),
            lit(false).as("del"))))
      val b1 = tuples(
        base.filter(k % 13 === 5)
          .select(k, col("o_custkey"), col("o_orderstatus").as("s"),
            col("o_totalprice").as("p"), lit(true).as("del"))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 0)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            col("o_orderstatus").as("s"), col("o_totalprice").as("p"),
            lit(true).as("del")))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 1)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("X").as("s"), (col("o_totalprice") + 5.0).as("p"),
            lit(false).as("del"))))
      val dir = java.nio.file.Files.createTempDirectory("graft-diff").toString
      graft.streaming.StreamingUpsert.seed(base, s"$dir/t")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Double, Boolean)]
      val q = graft.streaming.StreamingUpsert.run(
        mem.toDF.toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "__del__"),
        s"$dir/t", Seq("o_orderkey"), Some("__del__"), s"$dir/ckpt")
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      q.stop()
      graft.streaming.StreamingUpsert.diff(s, s"$dir/t", "vinit", "v1",
        Seq("o_orderkey"))
        .select(col("o_orderkey"), col("change"),
          col("o_orderstatus_before"), col("o_orderstatus_after"),
          col("o_totalprice_before"), col("o_totalprice_after"))
        .orderBy("o_orderkey")
    }),

    "mg_version_diff_partitioned" -> ((s, d) => {
      // time-travel CDC audit on the PRODUCTION (key-partitioned) layout:
      // the mg_version_diff construction run through PartitionedUpsert —
      // seed + two micro-batches over 8 hash partitions, then
      // diff(vinit, v1) where BOTH endpoints are reconstructed from the
      // per-version MANIFESTS (untouched partitions' entries still name
      // older dirs — exactly the reconstruction this gate exists to
      // prove). The oracle replays the merges and FULL OUTER JOINs the
      // endpoints with IS DISTINCT FROM; a manifest mapping a stale or
      // missing partition version hash-fails.
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val k = col("o_orderkey")
      def tuples(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
      val b0 = tuples(
        base.filter(k % 7 === 3 && k % 13 =!= 5)
          .select(k, col("o_custkey"), lit("U").as("s"),
            (col("o_totalprice") + 10.0).as("p"), lit(false).as("del"))
        .unionByName(base.filter(k % 11 === 2)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("N").as("s"), col("o_totalprice").as("p"),
            lit(false).as("del"))))
      val b1 = tuples(
        base.filter(k % 13 === 5)
          .select(k, col("o_custkey"), col("o_orderstatus").as("s"),
            col("o_totalprice").as("p"), lit(true).as("del"))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 0)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            col("o_orderstatus").as("s"), col("o_totalprice").as("p"),
            lit(true).as("del")))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 1)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("X").as("s"), (col("o_totalprice") + 5.0).as("p"),
            lit(false).as("del"))))
      val dir = java.nio.file.Files.createTempDirectory("graft-pdiff").toString
      graft.streaming.PartitionedUpsert.seed(base, s"$dir/t", Seq("o_orderkey"), 8)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Double, Boolean)]
      val q = graft.streaming.PartitionedUpsert.run(
        mem.toDF.toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "__del__"),
        s"$dir/t", Seq("o_orderkey"), Some("__del__"), s"$dir/ckpt")
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      q.stop()
      graft.streaming.PartitionedUpsert.diff(s, s"$dir/t", "vinit", "v1",
        Seq("o_orderkey"))
        .select(col("o_orderkey"), col("change"),
          col("o_orderstatus_before"), col("o_orderstatus_after"),
          col("o_totalprice_before"), col("o_totalprice_after"))
        .orderBy("o_orderkey")
    }),

    "mg_upsert_partitioned" -> ((s, d) => {
      // the KEY-PARTITIONED version layout (r12): same seed + same two
      // micro-batches as mg_upsert_stream, but the table is hash-split
      // into 8 key partitions and each batch rewrites ONLY the partitions
      // its keys occupy — the O(touched)-per-batch shape a 100 TB CDC
      // table needs. The oracle is the SAME sequential-MERGE CTE replay:
      // partitioning must be invisible to the merged result.
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val k = col("o_orderkey")
      def tuples(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
      val b0 = tuples(
        base.filter(k % 7 === 3 && k % 13 =!= 5)
          .select(k, col("o_custkey"), lit("U").as("s"),
            (col("o_totalprice") + 10.0).as("p"), lit(false).as("del"))
        .unionByName(base.filter(k % 11 === 2)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("N").as("s"), col("o_totalprice").as("p"), lit(false).as("del"))))
      val b1 = tuples(
        base.filter(k % 13 === 5)
          .select(k, col("o_custkey"), col("o_orderstatus").as("s"),
            col("o_totalprice").as("p"), lit(true).as("del"))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 0)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            col("o_orderstatus").as("s"), col("o_totalprice").as("p"),
            lit(true).as("del")))
        .unionByName(base.filter(k % 11 === 2 && k % 2 === 1)
          .select((k + 100000000L).as("o_orderkey"), col("o_custkey"),
            lit("X").as("s"), (col("o_totalprice") + 5.0).as("p"),
            lit(false).as("del"))))
      val dir = java.nio.file.Files.createTempDirectory("graft-pups").toString
      graft.streaming.PartitionedUpsert.seed(base, s"$dir/t", Seq("o_orderkey"), 8)
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String, Double, Boolean)]
      val q = graft.streaming.PartitionedUpsert.run(
        mem.toDF.toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "__del__"),
        s"$dir/t", Seq("o_orderkey"), Some("__del__"), s"$dir/ckpt")
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      q.stop()
      graft.streaming.PartitionedUpsert.latest(s, s"$dir/t").get
        .orderBy("o_orderkey")
    }),

    // ----- curation: repetition / decontamination / PII / stratified -----
    "cu_repetition" -> ((s, d) =>
      graft.llm.RepetitionStatsPipe("text")(t(s, d, "documents"))
        .select("doc_id", "dup_token_frac", "top_bigram_frac", "dup_bigram_frac")
        .orderBy("doc_id")),
    "cu_decontaminate" -> ((s, d) => {
      // eval corpus = docs 0-29; 4-grams split the sf0.01 corpus 81/419
      val docs = t(s, d, "documents")
      graft.llm.DecontaminatePipe(docs.filter(col("doc_id") < 30),
        "text", "doc_id", ngramSize = 4)(docs)
        .select("doc_id", "contaminated").orderBy("doc_id")
    }),
    "cu_bloom_decontam" -> ((s, d) => {
      // same eval split as cu_decontaminate, but the eval side is a
      // 2^20-bit Bloom bitmap and the train side a MAP-ONLY codegen'd
      // bit probe (no join/shuffle/broadcast table). The oracle replays
      // every bit collision, so false positives are deterministic.
      val docs = t(s, d, "documents")
      graft.llm.BloomDecontaminatePipe(docs.filter(col("doc_id") < 30),
        "text", "doc_id", ngramSize = 4)(docs)
        .select("doc_id", "contaminated").orderBy("doc_id")
    }),
    "ev_stream_decontam" -> ((s, d) =>
      // REAL StreamingQuery: stateless per-row n-gram overlap against the
      // static eval corpus — same flags as the batch pipe and oracle
      graft.streaming.EventStream.runDecontaminateStream(s, d)
        .select("doc_id", "contaminated").orderBy("doc_id")),
    "cu_overlap_frac" -> ((s, d) => {
      // the GPT-3/PaLM FRACTIONAL protocol (Brown et al. 2005.14165 App.
      // C; Chowdhery et al. 2204.02311 §8): flag only when >= 20% of a
      // doc's distinct 8-grams appear in the eval set. Partial
      // contamination is PLANTED — docs with doc_id % 7 == 3 get the
      // first 40 tokens of eval doc (doc_id % 30) appended, yielding
      // mid-range fractions; eval docs themselves sit at 100%, organic
      // docs near 0 — so the integer bp arithmetic is exercised across
      // the whole range, not just at the endpoints.
      val docs = t(s, d, "documents")
      val eval = docs.filter(col("doc_id") < 30).select("doc_id", "text")
      val evalSide = eval.select(col("doc_id").as("__eid__"),
        col("text").as("__etext__"))
      val planted = docs.select("doc_id", "text")
        .withColumn("__eid__", col("doc_id") % 30)
        .join(broadcast(evalSide), Seq("__eid__"))
        .withColumn("text", when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" "), concat_ws(" ",
            slice(graft.llm.TextAnalysisOps.toks(col("__etext__")), 1, 40))))
          .otherwise(col("text")))
        .drop("__eid__", "__etext__")
      graft.llm.OverlapFractionPipe(eval, "text", "doc_id",
        ngramSize = 8, thresholdBp = 2000)(planted)
        .select("doc_id", "matched_ngrams", "total_ngrams", "overlap_bp",
          "contaminated")
        .orderBy("doc_id")
    }),
    "ev_stream_overlap_frac" -> ((s, d) =>
      // REAL StreamingQuery: the fraction folded to a stateless per-row
      // array_intersect projection — counts, bp, and flag bit-identical
      // to the batch pipe, SAME oracle
      graft.streaming.EventStream.runOverlapFractionStream(s, d)
        .select("doc_id", "matched_ngrams", "total_ngrams", "overlap_bp",
          "contaminated")
        .orderBy("doc_id")),
    "ev_stream_domain_mixture" -> ((s, d) =>
      // REAL StreamingQuery: the quota plan built once from the static
      // corpus, arriving docs expanded by the stateless broadcast join +
      // bounded explode — rows/epochs bit-identical to the batch
      // mx_domain_mixture, SAME oracle
      graft.streaming.EventStream.runDomainMixtureStream(s, d)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")),
    "ev_stream_weighted_sample" -> ((s, d) =>
      // REAL StreamingQuery: Efraimidis-Spirakis reservoir folded per
      // micro-batch (O(k) state) — the final sample is bit-identical to
      // the batch ws_weighted_sample top-120, so the SAME oracle replays
      graft.streaming.EventStream.runWeightedSampleStream(s, d)
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")),
    "ev_stream_heavy_ngrams" -> ((s, d) =>
      // REAL StreamingQuery: per-micro-batch CMS folded into a persisted
      // <= depth*width-row sketch (linear merge), then the exact
      // second pass driven by the STREAMED sketch — result equals the
      // all-batch hh_heavy_ngrams, same GROUP BY HAVING oracle
      graft.streaming.EventStream.runHeavyNgramsStream(s, d)
        .orderBy("gram")),
    "ev_stream_bloom_decontam" -> ((s, d) =>
      // REAL StreamingQuery, bloom mode: eval side is a fixed 2^20-bit
      // bitmap probed map-only per arriving doc — zero state, no literal
      // cap; flags (false positives included) bit-identical to
      // cu_bloom_decontam, so the same oracle replays every collision
      graft.streaming.EventStream.runBloomDecontaminateStream(s, d)
        .select("doc_id", "contaminated").orderBy("doc_id")),
    "hh_heavy_ngrams" -> ((s, d) =>
      // count-min two-pass heavy hitters: pass 1 builds the fixed-memory
      // sketch, pass 2 keeps occurrences whose (one-sided) estimate
      // reaches the threshold and exact-counts ONLY those — the result
      // is exactly GROUP BY HAVING, but the exact aggregation never sees
      // the full gram vocabulary. width=512 forces real bucket
      // collisions to prove pruning stays exact under them.
      graft.llm.HeavyHitterPipe("text", ngramSize = 2, minCount = 35L,
        depth = 4, width = 512)(t(s, d, "documents"))
        .orderBy("gram")),
    "cu_pii" -> ((s, d) => {
      // plant deterministic email/phone/IP on every 3rd doc; the oracle
      // replays the planting and RE2-compatible redaction verbatim
      val planted = t(s, d, "documents").withColumn("t2",
        when(col("doc_id") % 3 === 0, concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
          .otherwise(col("text")))
      graft.llm.PiiRedactPipe("t2")(planted)
        .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
        .orderBy("doc_id")
    }),
    "cu_stratified" -> ((s, d) =>
      graft.llm.StratifiedSamplePipe("doc_id", "lang",
        Seq("en" -> 0.35, "de" -> 0.8), defaultRate = 0.6)(t(s, d, "documents"))
        .select("doc_id", "lang").orderBy("doc_id")),

    // ----- vocabulary learn + encode -----
    "vb_vocab_encode" -> ((s, d) => {
      val out = graft.llm.VocabEncodePipe("text", "doc_id", vocabSize = 25)(
        t(s, d, "documents"))
      out.select(col("doc_id"), col("token_ids"), col("n_oov"))
        .orderBy("doc_id")
    }),

    // ----- corpus-LM unigram NLL quality signal -----
    "ug_unigram_nll" -> ((s, d) =>
      graft.llm.UnigramLogProbPipe("text", "doc_id")(t(s, d, "documents"))
        .select("doc_id", "unigram_nll").orderBy("doc_id")),

    // ----- composed curation v2: the round-6 end-to-end cleaner -----
    "pp_crawl_v1" -> ((s, d) => {
      // the canonical web-crawl curation preset as ONE SequentialPipe:
      // within-page repetition removal (map-only) -> C4 line battery ->
      // page-keep floor -> Gopher lexical flags on the CLEANED page ->
      // lexical floor -> token budget. Every stage's kernel is already
      // individually oracled; this gate proves they COMPOSE — the oracle
      // replays the whole chain stage by stage.
      val pipe = SequentialPipe(Seq(
        graft.llm.IntraDocLineDedupPipe("text"),
        graft.llm.C4CleanPipe("text"),
        LambdaPipe(_.filter(col("c4_keep")), "c4_floor"),
        graft.llm.GopherQualityPipe("text"),
        LambdaPipe(_.filter(col("rule_alpha_words") && col("rule_stopwords")),
          "lexical_floor"),
        graft.llm.TokenCountPipe("text")))
      pipe(plantedC4(s, d))
        .select("doc_id", "text", "n_intra_removed", "kept_lines",
          "n_sentences", "alpha_words", "distinct_stopwords", "ws_tokens")
        .orderBy("doc_id")
    }),

    "ev_stream_crawl" -> ((s, d) => {
      // the ENTIRE crawl-curation preset running unchanged inside a REAL
      // StreamingQuery: every stage is map-only, so the stream carries
      // ZERO state, append emits each surviving page exactly once, and
      // the batch gate's oracle replays it verbatim — the unified
      // batch/stream story for the whole cleaner family at once.
      val stream = plantedC4Text(
        graft.streaming.EventStream.readStreamTable(s, d, "documents"))
      val pipe = SequentialPipe(Seq(
        graft.llm.IntraDocLineDedupPipe("text"),
        graft.llm.C4CleanPipe("text"),
        LambdaPipe(_.filter(col("c4_keep")), "c4_floor"),
        graft.llm.GopherQualityPipe("text"),
        LambdaPipe(_.filter(col("rule_alpha_words") && col("rule_stopwords")),
          "lexical_floor"),
        graft.llm.TokenCountPipe("text")))
      graft.streaming.EventStream.runToMemorySink(
        pipe(stream).select("doc_id", "text", "n_intra_removed",
          "kept_lines", "n_sentences", "alpha_words", "distinct_stopwords",
          "ws_tokens"), "append")
        .orderBy("doc_id")
    }),

    "pp_ingest_v1" -> ((s, d) => {
      // the FLAGSHIP end-to-end ingest driver (see [[graft.llm
      // .IngestPreset]]): raw crawl pages → pp_crawl_v1 cleaner chain →
      // incremental MinHash dedup against the standing corpus →
      // PredictWithCache embeddings → IVFPQDenseEngine.addVectors →
      // PartitionedUpsert commit. The final table row for every page
      // carries each stage's evidence (cleaned text, ws_tokens, rounded
      // vector, coarse cell id, PQ codes); the oracle replays the whole
      // cascade stage by stage from the documents fixture.
      // r16: the standing state is fingerprint-keyed (seedCached) — the
      // cleaned corpus, embeddings, index state AND the partitioned
      // table itself are deterministic in the documents fixture, so a
      // warm re-run skips the seed (manifest read) and the re-applied
      // batch id no-ops by the upsert's replay guard; the gate then
      // times the standing-state READ path, the same convention as the
      // state-cached search engines. A regenerated fixture re-seeds.
      val fp = tableFp(s, d, "documents")
      val corpusRaw = plantedC4(s, d).filter(col("doc_id") % 3 =!= 1)
        .select("doc_id", "text")
      val (tableDir, corpus) = graft.llm.IngestPreset.seedCached(
        corpusRaw, "/tmp/graft-cache", s"$fp:ingest-corpus", "batch-table")
      val res = graft.llm.IngestPreset.run(
        ingestArrivals(s, d), corpus, tableDir, "/tmp/graft-cache",
        s"$fp:ingest-corpus", s"$fp:ingest-b0")
      res.table.orderBy("doc_id")
    }),

    "ev_stream_ingest" -> ((s, d) => {
      // the streaming twin: the identical ingest cascade running as the
      // foreachBatch body of a REAL StreamingQuery over arriving raw
      // pages — clean, dedup vs the standing corpus, embed, addVectors,
      // partitioned commit — same oracle as pp_ingest_v1.
      // r16: same fingerprint-keyed standing state as pp_ingest_v1 (its
      // own table variant — the stream commits its own v0); the fresh
      // per-run checkpoint replays batch 0, which the upsert's replay
      // guard no-ops against the committed table on warm runs. This
      // assumes the arrivals land in ONE micro-batch (true for the
      // single-file fixture read without maxFilesPerTrigger); if a
      // layout change ever split them, a warm replay of batch 0 against
      // a committed id > 0 fails LOUDLY via the behind-id guard (the
      // deliberate contract — wipe the keyed table to re-seed).
      val fp = tableFp(s, d, "documents")
      val corpusRaw = plantedC4(s, d).filter(col("doc_id") % 3 =!= 1)
        .select("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ingest-s").toString
      val (tableDir, corpus) = graft.llm.IngestPreset.seedCached(
        corpusRaw, "/tmp/graft-cache", s"$fp:ingest-corpus", "stream-table")
      val stream = plantedC4Text(
        graft.streaming.EventStream.readStreamTable(s, d, "documents"))
      val arrivals = stream.select(explode(array(
        when(col("doc_id") % 3 === 0, struct(
          (col("doc_id") + 500000).as("doc_id"),
          concat(col("text"),
            lit("\nExtra tail sentence appended here okay.")).as("text"))),
        when(col("doc_id") % 3 === 1, struct(
          (col("doc_id") + 600000).as("doc_id"),
          col("text").as("text"))))).as("r"))
        .filter(col("r").isNotNull)
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      val q = graft.llm.IngestPreset.runStream(arrivals, corpus, tableDir,
        "/tmp/graft-cache", s"$fp:ingest-corpus", s"$fp:ingest-stream",
        s"$dir/ckpt")
      q.processAllAvailable(); q.stop()
      graft.streaming.PartitionedUpsert.latest(s, tableDir).get
        .orderBy("doc_id")
    }),

    "pp_curate_v2" -> ((s, d) => {
      // line-wrap -> line dedup -> repetition stats -> repetition floor
      // -> stratified rebalance -> token count, as ONE SequentialPipe;
      // the oracle replays the whole chain stage by stage. The wrap is a
      // single linear regex pass (every 8th inter-token space -> newline);
      // a chunked-slice HOF build re-evaluates the token split per chunk.
      val docs = t(s, d, "documents").withColumn("text",
        regexp_replace(trim(col("text")), "((?:\\S+\\s+){7}\\S+)\\s+", "$1\n"))
      val pipe = SequentialPipe(Seq(
        graft.llm.LineDedupPipe("text", "doc_id"),
        graft.llm.RepetitionStatsPipe("text"),
        LambdaPipe(_.filter(col("dup_token_frac") <= 0.5), "repetition_floor"),
        graft.llm.StratifiedSamplePipe("doc_id", "lang",
          Seq("en" -> 0.5), defaultRate = 0.9),
        graft.llm.TokenCountPipe("text")))
      pipe(docs)
        .select("doc_id", "lang", "n_lines_removed", "dup_token_frac", "ws_tokens")
        .orderBy("doc_id")
    }),

    // ----- URL/domain blocklist filter (C4-style) -----
    "ur_url_filter" -> ((s, d) => {
      // plant blocked subdomain / clean / blocked apex URLs on a cycle
      val planted = t(s, d, "documents").withColumn("t2",
        when(col("doc_id") % 4 === 0, concat(col("text"),
          lit(" see http://ads"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/x")))
        .when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" see https://ok.org/page")))
        .when(col("doc_id") % 4 === 2,
          concat(col("text"), lit(" ref http://example.com")))
        .otherwise(col("text")))
      graft.llm.UrlFilterPipe("t2", Seq("example.com"))(planted)
        .select("doc_id", "n_urls", "url_blocked").orderBy("doc_id")
    }),

    // ----- line-level exact dedup (CCNet-style corpus cleaner) -----
    "ld_line_dedup" -> ((s, d) => {
      // the synthetic docs are single-line; re-wrap every 8 tokens so the
      // corpus has realistic repeated lines (the oracle replays the wrap)
      val docs = t(s, d, "documents").withColumn("text",
        regexp_replace(trim(col("text")), "((?:\\S+\\s+){7}\\S+)\\s+", "$1\n"))
      graft.llm.LineDedupPipe("text", "doc_id")(docs)
        .select("doc_id", "text", "n_lines_removed").orderBy("doc_id")
    }),

    // ----- deterministic shuffle + corpus profiling -----
    "ds_shuffle" -> ((s, d) =>
      graft.llm.DeterministicShufflePipe("doc_id")(t(s, d, "documents"))
        .select("doc_id", "shuffle_slot").orderBy("shuffle_slot", "doc_id")),
    "cr_curriculum" -> ((s, d) =>
      // quality-annealed training order: rank by (n_chars, doc_id) →
      // 4 equal rank-slice phases, within-phase order = the quadratic
      // shuffle. The oracle replays rank, integer bucket cut, slot, and
      // the final position — a sketch-based or tie-unstable cut
      // hash-fails.
      graft.llm.CurriculumOrderPipe("doc_id", "n_chars")(
        t(s, d, "documents"))
        .select("doc_id", "curriculum_bucket", "curriculum_pos")
        .orderBy("doc_id")),
    "cs_stats" -> ((s, d) =>
      // exact-percentile path (oracle-replayable); approx path is spec'd
      graft.llm.CorpusStatsPipe(Seq("lang"), "n_chars", approx = false)(
        t(s, d, "documents"))
        .select("lang", "n", "mean", "min", "max", "p50", "p90", "p99")
        .orderBy("lang")),

    // ----- sequence packing (concat-and-chunk) -----
    "pk_pack" -> ((s, d) => {
      // global path: exercises the range-partition + broadcast-offset
      // prefix sum (the grouped path is covered by PackingSpec)
      val docs = t(s, d, "documents").withColumn("tok_cnt",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.llm.PackSequencesPipe("tok_cnt", 256, "doc_id")(docs)
        .select("doc_id", "tok_cnt", "pack_first", "pack_last", "pack_pos")
        .orderBy("doc_id")
    }),

    // ----- materialized packs: the frame a trainer consumes -----
    "pk2_materialize" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
      graft.llm.PackMaterializePipe("toks", 256, "doc_id", "doc_id")(docs)
        .select("pack_id", "n_tokens", "tokens", "doc_ids")
        .orderBy("pack_id")
    }),

    // ----- cluster-balanced sampling (SemDeDup-style) -----
    "cb_cluster_sample" -> ((s, d) =>
      graft.llm.ClusterBalancedSamplePipe("embedding", "vec_id",
        graft.llm.ClusterBalancedSamplePipe.formulaCentroids(8, 64), cap = 25)(
        t(s, d, "embeddings"))
        .select("vec_id", "cluster").orderBy("vec_id")),

    // ----- per-key rolling-window features -----
    "rl_rolling" -> ((s, d) => {
      val ev = graft.streaming.EventStream.readBatch(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      graft.operators.RollingWindowPipe(Seq("user_id"), "ts_us", "value",
        windowSize = 3600L * 1000000L)(ev)
        .select("event_id", "user_id", "ts_us", "rolling_cnt", "rolling_sum")
        .orderBy("event_id")
    }),

    // ----- group top-k + binned range join -----
    "gt_group_topk" -> ((s, d) =>
      graft.operators.GroupTopKPipe(Seq("lang"), "n_chars", 3, "doc_id")(
        t(s, d, "documents"))
        .select("lang", "doc_id", "n_chars", "rank").orderBy("lang", "rank")),
    "gt2_topk_heap" -> ((s, d) =>
      // the bounded-heap aggregate mode: identical results to the window
      // gate (same oracle), but the shuffle carries <= k rows per group
      // per input partition — map-side combine, the 100 TB shape
      graft.operators.GroupTopKPipe(Seq("lang"), "n_chars", 3, "doc_id",
        useHeap = true)(t(s, d, "documents"))
        .select("lang", "doc_id", "n_chars", "rank").orderBy("lang", "rank")),
    "rj_range" -> ((s, d) => {
      // clicks inside 30-min incident windows opened by same-user errors;
      // binWidth == window span -> each interval covers <= 2 bins
      val ev = graft.streaming.EventStream.readBatch(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val wins = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          unix_micros(col("ts")).as("wstart"),
          (unix_micros(col("ts")) + 1800L * 1000000L).as("wend"))
      graft.operators.RangeJoin.pointInInterval(clicks, wins,
        "ts_us", "wstart", "wend", binWidth = 1800L * 1000000L,
        keyCols = Seq("user_id"))
        .select("event_id", "user_id", "ts_us", "err_id", "wstart")
        .orderBy("event_id", "err_id")
    }),

    // ----- as-of join (point-in-time lookup) -----
    "aj_asof" -> ((s, d) => {
      // each click gets the latest prior purchase of the same user; ts
      // compared as exact epoch-micros (no float, no format divergence)
      val ev = graft.streaming.EventStream.readBatch(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      graft.operators.AsOfJoin.backward(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof_event_id"), col("asof_value"), col("asof_n_prior"))
        .orderBy("event_id")
    }),

    // ----- contrastive triplet mining over near-dup pairs -----
    "tp_triplets" -> ((s, d) => {
      val base = plantedNearDups(s, d)
      val pairs = graft.llm.MinHashLSHDedupPipe("text", "doc_id",
        jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/lsh-planted"))(base)
      graft.llm.TripletMiningPipe(base, "doc_id")(pairs)
        .orderBy("anchor_id", "pos_id")
    }),

    // ----- weighted corpus interleaving (HF interleave_datasets) -----
    "il_interleave" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.InterleaveDatasets(Seq(
        docs.filter(col("lang") === "en").select("doc_id", "lang") -> 3.0,
        docs.filter(col("lang") =!= "en").select("doc_id", "lang") -> 1.0),
        "doc_id")
        .select("doc_id", "lang", "source_idx", "interleave_pos")
        .orderBy("doc_id")
    }),

    // ----- temperature mix + bigram-LM fluency -----
    "tm_temperature_mix" -> ((s, d) =>
      graft.llm.TemperatureMixPipe("doc_id", "lang", alpha = 0.5)(
        t(s, d, "documents"))
        .select("doc_id", "lang").orderBy("doc_id")),
    "mx_domain_mixture" -> ((s, d) => {
      // deterministic domain-mixture sampling with bounded repetition
      // (the GPT-3/Pile/DoReMi recipe): budget = |corpus|, weights skewed
      // so every regime is exercised at once — src19 (wt 200) hits the
      // maxRepeat=3 cap (full epochs only, rem=0), wt-60 domains land
      // fe=1 + a partial epoch, wt-11/21 domains are partial-only, and
      // at sf<=0.01 the wt-1 domains' quota rounds to 0 (dropped
      // entirely). The oracle replays the whole plan: per-domain counts,
      // integer needed/cap/fe/rem, the HUGEINT threshold, and the
      // quadratic-M31 per-(id, epoch) draw — any drift in quota math,
      // cap, epoch explosion, or hash selection hash-fails.
      val docs = t(s, d, "documents")
      val budget = docs.count() // one-row driver read: the gate's budget
      graft.llm.DomainMixturePipe("doc_id", "source",
        graft.llm.DomainMixturePipe.fixtureGateWeights,
        budget = budget, maxRepeat = 3)(docs)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    }),
    "mx_token_mixture" -> ((s, d) => {
      // token-budget accounting — the unit the published recipes
      // actually budget: quotas/caps/epochs over per-domain n_chars
      // SUMS (sizeCol), budget = total corpus chars, same skewed weight
      // table. The partial epoch keeps rows at rate rem/S_d, so its
      // expected char yield is exactly rem whatever the length
      // distribution; the oracle replays sum-based quota math + the
      // same per-(id, epoch) draw — a row-counted plan hash-fails.
      val docs = t(s, d, "documents")
      // coalesce: an empty/all-null table means budget 0, not an NPE
      val budget = docs.agg(coalesce(sum("n_chars"), lit(0L)))
        .first().getLong(0)
      graft.llm.DomainMixturePipe("doc_id", "source",
        graft.llm.DomainMixturePipe.fixtureGateWeights,
        budget = budget, maxRepeat = 3, sizeCol = Some("n_chars"))(docs)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    }),
    "bg_bigram_nll" -> ((s, d) =>
      graft.llm.BigramLogProbPipe("text", "doc_id")(t(s, d, "documents"))
        .select("doc_id", "bigram_nll").orderBy("doc_id")),

    // ----- media resize stub (nearest-neighbor byte resample) -----
    "mm_resize" -> ((s, d) => {
      // text payload as the media binary (ASCII -> byte pos == char pos,
      // so the oracle replays the resample on the string side)
      val media = graft.llm.ToMediaColumnPipe("text")(t(s, d, "documents"))
      graft.llm.ResampleBytesPipe("media", targetBytes = 32)(media)
        .select(col("doc_id"),
          col("media_resized").cast("string").as("resized_text"),
          col("resized_meta.n_bytes").as("n_bytes"))
        .orderBy("doc_id")
    }),

    // ----- JSONL interchange round-trip -----
    "io_jsonl_roundtrip" -> ((s, d) => {
      // land the corpus as JSONL, read it back with a pinned schema —
      // values must survive the interchange bit-for-bit (oracle = the
      // original parquet)
      val docs = t(s, d, "documents")
      val path = s"/tmp/graft_io_${math.abs(d.hashCode)}/documents_jsonl"
      graft.sources.Formats.writeJsonl(docs, path)
      graft.sources.Formats.readJsonl(s, path, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    "io_orc_roundtrip" -> ((s, d) => {
      // same roundtrip contract through ORC (typed columnar, so this is
      // the drift guard for an ORC-native warehouse hop)
      val docs = t(s, d, "documents")
      val path = s"/tmp/graft_io_${math.abs(d.hashCode)}/documents_orc"
      graft.sources.Formats.writeOrc(docs, path)
      graft.sources.Formats.readOrc(s, path, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    "io_csv_roundtrip" -> ((s, d) => {
      // the HARD interchange case: CSV with full quoting — doc text
      // carries commas/quotes; the writeCsv/readCsv dialect (quoteAll,
      // escaped quotes, multiLine) must return every value bit-for-bit
      val docs = t(s, d, "documents")
      val path = s"/tmp/graft_io_${math.abs(d.hashCode)}/documents_csv"
      graft.sources.Formats.writeCsv(docs, path)
      graft.sources.Formats.readCsv(s, path, docs.schema)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    "io_compacted_roundtrip" -> ((s, d) => {
      // the small-file compaction writer end-to-end: writeCompacted
      // splits the table into ceil(estimate/target) files via
      // round-robin repartition — content must survive the rewrite
      // bit-for-bit (the oracle is the identity replay), and the layout
      // claim (more than one file at a small target) is asserted
      // in-plan so a silent coalesce-to-one regression fails loudly.
      val docs = t(s, d, "documents")
      val path = s"/tmp/graft_io_${math.abs(d.hashCode)}/documents_compacted"
      val n = graft.sources.Formats.writeCompacted(docs, path,
        targetFileBytes = 16L << 10)
      require(n > 1, s"a 16 KiB target must yield multiple files (got $n)")
      s.read.parquet(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    "io_footer_audit" -> ((s, d) => {
      // the footer-only layout audit end-to-end AGAINST THE DATA: write
      // the table compacted, read per-file row counts + doc_id min/max
      // from parquet FOOTERS ONLY (zero data pages), fold to one row —
      // which must equal the SQL count/min/max over the table itself.
      // A footer misread, a dropped file, or a stats-less file all
      // hash-fail.
      val docs = t(s, d, "documents")
      val path = s"/tmp/graft_io_${math.abs(d.hashCode)}/documents_audit"
      graft.sources.Formats.writeCompacted(docs, path,
        targetFileBytes = 16L << 10)
      graft.sources.ParquetStats.fileStats(s, path, Seq("doc_id"))
        .agg(sum("rows").as("total_rows"),
          min("min").as("min_doc"), max("max").as("max_doc"))
    }),

    // ----- composed selection pipeline v3: the round-6 capstone -----
    "pp_select_v3" -> ((s, d) => {
      // the full modern selection flow as ONE chain: duplicated-substring
      // removal -> DSIR importance weights vs the English target ->
      // selection floor -> temperature rebalance -> deterministic shuffle
      // + fixed-size shard layout; the oracle replays every stage
      val docs = t(s, d, "documents")
      // materialize stage boundaries: the dedup subplan feeds THREE
      // consumers inside ImportanceWeight (raw features, target features,
      // the final overlay join) and the weighted frame two more. AQE's
      // exchange reuse already deduplicates most of the re-computation, so
      // the measured win is modest (7.9 -> 7.1 s at sf0.1), but the
      // checkpointed shape is immune to reuse-defeating replans and keeps
      // each stage's cost visible in the UI
      val deduped = graft.llm.SubstringDedupPipe("text", "doc_id", k = 5,
        hashShingles = false)(docs).localCheckpoint(true)
      val weighted = graft.llm.ImportanceWeightPipe("text", "doc_id",
        deduped.filter(col("lang") === "en"), "text")(deduped)
      val selected = weighted.filter(col("dsir_logweight") > -1.0)
        .localCheckpoint(true)
      val mixed = graft.llm.TemperatureMixPipe("doc_id", "lang",
        alpha = 0.5)(selected)
      val shuffled = graft.llm.DeterministicShufflePipe("doc_id")(mixed)
        .withColumn("ord", col("shuffle_slot") * 1048576L + col("doc_id"))
      graft.llm.ShardAssignPipe("ord", 32)(shuffled)
        .select("doc_id", "lang", "n_tokens_removed", "dsir_logweight",
          "shard_id", "pos_in_shard")
        .orderBy("doc_id")
    }),

    // ----- the training-data EPILOGUE as one chain (capstone): mix ->
    // curriculum order -> sequence packing -> shard layout — the stages a
    // real pretraining job runs AFTER selection, composed and replayed
    // end-to-end the way pp_select_v3 replays the selection chain -----
    "pp_train_order_v1" -> ((s, d) =>
      trainOrderChain(s, d)
        .select("doc_id", "epoch", "curriculum_bucket", "curriculum_pos",
          "pack_first", "pack_last", "pack_pos", "shard_id", "pos_in_shard")
        .orderBy("doc_id", "epoch")),

    // ----- the epilogue MATERIALIZED: one parquet file per shard, rows
    // in pos order, read back whole — content must round-trip exactly
    // (same oracle as the capstone; file-per-shard + in-file order are
    // TrainingShardsSpec's half, invisible to SQL) -----
    "io_train_shards" -> ((s, d) => {
      val dir = s"/tmp/graft_io_${math.abs(d.hashCode)}/train_shards"
      graft.sources.TrainingShards.write(trainOrderChain(s, d), dir)
      s.read.parquet(dir)
        .select(col("doc_id"), col("epoch"), col("curriculum_bucket"),
          col("curriculum_pos"), col("pack_first"), col("pack_last"),
          col("pack_pos"),
          // the partition column comes back as the discovery-inferred INT
          col("shard_id").cast("long").as("shard_id"), col("pos_in_shard"))
        .orderBy("doc_id", "epoch")
    }),

    // ----- realized-vs-owed mixture audit over the same construction -----
    "mx_mixture_report" -> ((s, d) => {
      val (docs, budget, mixed) = fixtureMixture(s, d)
      graft.llm.MixtureReportPipe(docs, "doc_id", "source",
        graft.llm.DomainMixturePipe.fixtureGateWeights,
        budget = budget, maxRepeat = 3)(mixed)
        .select("source", "needed", "capped", "fe", "emitted",
          "distinct_docs", "max_epoch", "quota_fill_bp")
        .orderBy("source")
    }),

    // ----- dense global row ids + deterministic shard layout -----
    "u5_assign_row_id" -> ((s, d) =>
      graft.pipes.AssignRowIdPipe("doc_id")(t(s, d, "documents"))
        .select("doc_id", "row_idx").orderBy("doc_id")),
    "sh_shard_assign" -> ((s, d) => {
      // reproducible shuffled shards: deterministic shuffle slot mixed
      // with the id into a UNIQUE order key (slot < 2^20, doc_id < 2^20),
      // then fixed-size shard layout over that order
      val sh = graft.llm.DeterministicShufflePipe("doc_id")(t(s, d, "documents"))
        .withColumn("ord", col("shuffle_slot") * 1048576L + col("doc_id"))
      graft.llm.ShardAssignPipe("ord", 64)(sh)
        .select("doc_id", "shard_id", "pos_in_shard").orderBy("doc_id")
    }),

    // ----- DSIR importance weighting (target = English subset) -----
    "ir_dsir" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.ImportanceWeightPipe("text", "doc_id",
        docs.filter(col("lang") === "en"), "text")(docs)
        .select("doc_id", "dsir_logweight").orderBy("doc_id")
    }),

    // ----- hashed linear quality classifier (fastText-style scorer) -----
    "qc_hash_score" -> ((s, d) =>
      graft.llm.HashedLinearScorerPipe("text",
        graft.llm.HashedLinearScorerPipe.formulaWeights(4096), bias = 0.05)(
        t(s, d, "documents"))
        .select("doc_id", "quality_logit", "quality_keep").orderBy("doc_id")),

    // ----- duplicated-substring removal (ExactSubstr-style) -----
    "dd_substring" -> ((s, d) => {
      // plant a 7-token boilerplate sentence on every 5th doc; string
      // shingles (hashShingles=false) let the oracle replay coverage 1:1
      val planted = t(s, d, "documents").withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"),
          lit(" subscribe to our newsletter for updates today")))
          .otherwise(col("text")))
      graft.llm.SubstringDedupPipe("text", "doc_id", k = 5,
        hashShingles = false)(planted)
        .select("doc_id", "text", "n_tokens_removed").orderBy("doc_id")
    }),

    // ----- cross-corpus fuzzy contamination (train-vs-eval MinHash) -----
    "dd_incremental" -> ((s, d) => {
      // incremental ingest dedup: batch = two mutations of corpus docs
      // (drop-last-2 of every 10th, drop-last-1 of every 20th) so the
      // result carries BOTH cross pairs (batch vs corpus) and
      // within-batch pairs (the two mutations of the same doc) — never
      // corpus-vs-corpus. The corpus signature state loads from the
      // per-corpus cache; the oracle is the exact-complete
      // inverted-index Jaccard over the same restricted pair set.
      val docs = t(s, d, "documents")
      val toksI = split(col("text"), " ")
      def dropLast(n: Int) = array_join(
        slice(toksI, lit(1), greatest(size(toksI) - n, lit(1))), " ")
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), dropLast(2).as("text"))
        .unionByName(docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 300000).as("doc_id"), dropLast(1).as("text")))
      graft.llm.IncrementalMinHashDedupPipe("text", "doc_id",
        docs, "text", "doc_id", jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/incdedup"))(batch)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"), col("pair_src"))
        .orderBy("id_a", "id_b")
    }),

    "cu_cross_contam" -> ((s, d) => {
      // eval side = every 10th doc with the last 2 words dropped (the
      // plantedNearDups mutation) — high-Jaccard fuzzy leaks the exact
      // n-gram DecontaminatePipe would also catch, but found here by LSH
      val docs = t(s, d, "documents")
      val toksE = split(col("text"), " ")
      val evalDf = docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 100000).as("eval_id"),
        array_join(slice(toksE, lit(1), greatest(size(toksE) - 2, lit(1))), " ")
          .as("text"))
      graft.llm.CrossCorpusMinHashPipe("text", "doc_id",
        evalDf, "text", "eval_id", jaccardThreshold = 0.5,
        cacheDir = Some("/tmp/graft-cache/xcontam"))(docs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
  )

  // ---- DuckDB mirrors of Scalarize's canonical array encoding ----------
  // Verify dumps every array column as a deterministic string (see
  // [[graft.Scalarize]]); these helpers rewrite an oracle's array columns
  // to the identical encoding so the driver's pandas comparer sees only
  // scalars on both sides. coalesce(...,''): DuckDB's array_to_string
  // returns NULL for empty lists where Spark's concat_ws returns ''.
  private def ddIntArr(c: String) =
    s"coalesce(array_to_string($c, ','), '')"
  private def ddStrArr(c: String) =
    s"coalesce(array_to_string($c, chr(31)), '')"
  private def ddDblArr(c: String) =
    s"coalesce(array_to_string(list_transform($c, __x -> CASE WHEN isnan(__x) THEN 'nan' WHEN __x = 'infinity' THEN 'inf' WHEN __x = '-infinity' THEN '-inf' ELSE CAST(CAST(round(__x*10000) AS BIGINT) AS VARCHAR) END), ','), '')"
  private def ddIntArrArr(c: String) =
    s"coalesce(array_to_string(list_transform($c, __ii -> coalesce(array_to_string(__ii, ','), '')), ';'), '')"

  /** Wrap an oracle query so its array columns match [[Scalarize]]'s
    * encoding. Kinds: "" scalar passthrough, "i" integral list, "d" double
    * list, "s" string list, "ii" list of integral lists. Row order is
    * irrelevant (the driver sorts both frames), so no outer ORDER BY;
    * LIMIT/ORDER inside `inner` still picks the rows.
    */
  private def scl(inner: String, cols: (String, String)*): String = {
    val sel = cols.map { case (n, kind) =>
      val qn = "\"" + n + "\""
      kind match {
        case ""   => qn
        case "i"  => s"${ddIntArr(qn)} AS $qn"
        case "d"  => s"${ddDblArr(qn)} AS $qn"
        case "s"  => s"${ddStrArr(qn)} AS $qn"
        case "ii" => s"${ddIntArrArr(qn)} AS $qn"
      }
    }.mkString(", ")
    s"SELECT $sel FROM ($inner) __scl"
  }

  /** DuckDB replay of [[graft.search.SQDenseEngine]]: train (per-dim
    * min/max), encode (round half-up, clamp to [0,255], constant dims
    * encode 0), ADC (`qmin + qd·codes`), top-k with idx tie-break.
    * `trainWhere` restricts the TRAINED rows (the incremental-add gate
    * trains on the base two thirds and encodes everything — out-of-range
    * added components must saturate at 0/255 exactly like the engine).
    * `scoreWhere` restricts the SCORED candidates (the deletion gates
    * train on the full corpus — stats stay pinned — and score only the
    * survivors, so a stale code row hash-fails).
    */
  private def sqOracle(k: Int, qmax: Int, trainWhere: String = "TRUE",
      scoreWhere: String = "TRUE"): String = scl(
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |d AS (SELECT generate_subscripts(ev, 1) AS p, unnest(ev) AS x FROM v WHERE $trainWhere),
      |st AS (SELECT p, min(x) AS mn, max(x) - min(x) AS df FROM d GROUP BY p),
      |stl AS (SELECT list(mn ORDER BY p) AS vmin, list(df ORDER BY p) AS vdiff FROM st),
      |cd AS (SELECT vec_id, list_transform(range(1, length(ev)+1), i -> CASE WHEN vdiff[i] <= 0 THEN CAST(0 AS DOUBLE) ELSE least(greatest(round((ev[i]-vmin[i])/vdiff[i]*255, 0), 0), 255) END) AS codes FROM v, stl),
      |qs AS (SELECT vec_id AS qid, list_dot_product(ev, vmin) AS qmin, list_transform(range(1, length(ev)+1), i -> ev[i]*vdiff[i]/255) AS qd FROM v, stl WHERE vec_id < $qmax),
      |sc AS (SELECT qs.qid, cd.vec_id AS idx, qs.qmin + list_dot_product(qs.qd, cd.codes) AS score FROM qs CROSS JOIN cd WHERE $scoreWhere),
      |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
      |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
      |FROM rk WHERE r <= $k GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
    "qid" -> "", "index.idx" -> "i", "index.score" -> "d")

  private val oracleBase: Map[String, String] = Map(
    "c1_identity" -> "SELECT * FROM region ORDER BY r_regionkey",
    "c2_input_filter" -> "SELECT upper(n_name) AS n_name FROM nation ORDER BY n_name",
    "c3_update_overlay" ->
      "SELECT l_orderkey, l_linenumber, l_quantity*2 AS l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "c4_cached_stage" ->
      "SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
    "c7_condition_filter" -> "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "c9_dataset_dict" ->
      """SELECT 'done' AS split, o_orderkey, o_totalprice*2 AS o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL SELECT 'open', o_orderkey, o_totalprice*2 FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey, split""".stripMargin.replace("\n", " "),
    "c8_gate_true" -> "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_custkey",
    "b3_getkey" -> "SELECT p_name FROM part ORDER BY p_name",
    "b5_dropkeys" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders ORDER BY o_orderkey",
    "b6_addprefix" ->
      "SELECT doc_id AS \"doc.doc_id\", text AS \"doc.text\", lang AS \"doc.lang\", source AS \"doc.source\", n_chars AS \"doc.n_chars\" FROM documents ORDER BY \"doc.doc_id\"",
    "b7_replaceinkeys" ->
      "SELECT r_regionkey AS region_regionkey, r_name AS region_name FROM region ORDER BY region_regionkey",
    "b8_renamekeys" -> "SELECT s_suppkey AS id, s_name AS name FROM supplier ORDER BY id",
    "b9_apply_elementwise" ->
      scl("SELECT l_orderkey, list_transform(list_sort(list(l_linenumber)), x -> x*2) AS nums FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
        "l_orderkey" -> "", "nums" -> "i"),
    "b10_apply_all_upper" ->
      "SELECT c_custkey, upper(c_name) AS c_name, c_nationkey, c_acctbal, upper(c_mktsegment) AS c_mktsegment FROM customer ORDER BY c_custkey",
    "p1_sequential" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity*2 AS l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "p2_parallel" ->
      "SELECT l_orderkey, l_linenumber, l_quantity*2 AS l_quantity, l_partkey*10 AS l_partkey FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "p3_gate_alt" -> "SELECT r_name FROM region ORDER BY r_name",
    "p4_block_sequential" ->
      "SELECT upper(n_name) AS n_name, n_regionkey FROM nation ORDER BY n_name",
    "p5_parallel_by_field" ->
      "SELECT doc_id AS \"doc.doc_id\", text AS \"doc.text\", upper(lang) AS \"doc.lang\", source AS \"doc.source\", n_chars AS \"doc.n_chars\" FROM documents ORDER BY \"doc.doc_id\"",
    "n1_flatten" ->
      "SELECT l_orderkey, l_linenumber AS nums FROM lineitem ORDER BY l_orderkey, nums",
    "n2_nest" ->
      scl("WITH r2 AS (SELECT l_orderkey*10+l_linenumber AS ordv, l_quantity AS qty FROM lineitem), r3 AS (SELECT ordv, qty, (row_number() OVER (ORDER BY ordv) - 1) AS rn FROM r2), g AS (SELECT list(ordv ORDER BY rn) AS ordv, list(qty ORDER BY rn) AS qty FROM r3 GROUP BY rn // 8) SELECT ordv, qty FROM g ORDER BY ordv[1]",
        "ordv" -> "i", "qty" -> "d"),
    "n3_apply_as_flatten" ->
      scl("SELECT list_transform(list_sort(list(l_linenumber)), x -> x*2) AS nums, l_orderkey FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
        "nums" -> "i", "l_orderkey" -> ""),
    "n4_nested_inner_filter" ->
      scl("SELECT list_filter(list_sort(list(l_linenumber)), x -> x % 2 = 0) AS nums, l_orderkey FROM lineitem GROUP BY l_orderkey HAVING len(nums) > 0 ORDER BY l_orderkey",
        "nums" -> "i", "l_orderkey" -> ""),
    "n5_nested_level2" ->
      scl("""WITH a AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS nums FROM lineitem GROUP BY 1),
        |b AS (SELECT l_orderkey, list_filter(list_transform(range(0, (len(nums)-1)//2 + 1), i -> nums[i*2+1:i*2+2]), x -> len(x) > 0) AS nn FROM a)
        |SELECT list_transform(nn, inner_l -> list_transform(inner_l, x -> x*2)) AS nn, l_orderkey FROM b ORDER BY l_orderkey""".stripMargin.replace("\n", " "),
        "nn" -> "ii", "l_orderkey" -> ""),
    "n6_expand" ->
      scl("SELECT r_regionkey, [r_name, r_name, r_name] AS r_name FROM region ORDER BY r_regionkey",
        "r_regionkey" -> "", "r_name" -> "s"),
    "n7_nest_idx" ->
      "SELECT l_orderkey, l_linenumber, l_orderkey*10 + l_linenumber AS nest_idx FROM lineitem ORDER BY nest_idx",
    "l4_apply_each" ->
      "SELECT l_orderkey, l_linenumber, l_quantity*2 AS l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "l1_collate" ->
      scl("WITH r2 AS (SELECT l_orderkey*10+l_linenumber AS ordv, l_quantity AS qty FROM lineitem), r3 AS (SELECT ordv, qty, (row_number() OVER (ORDER BY ordv) - 1) AS rn FROM r2), g AS (SELECT list(ordv ORDER BY rn) AS ordv, list(qty ORDER BY rn) AS qty FROM r3 GROUP BY rn // 16) SELECT ordv, qty FROM g ORDER BY ordv[1]",
        "ordv" -> "i", "qty" -> "d"),
    "l2_decollate" ->
      "SELECT l_orderkey, l_linenumber AS nums, l_quantity AS qtys FROM lineitem ORDER BY l_orderkey, nums, qtys",
    "l3_first_eg" -> "SELECT * FROM region ORDER BY r_regionkey LIMIT 1",
    "l6_padding" ->
      scl("WITH a AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS input_ids FROM lineitem GROUP BY 1), m AS (SELECT max(len(input_ids)) AS ml FROM a) SELECT l_orderkey, input_ids || list_transform(range(ml - len(input_ids)), x -> 0) AS input_ids FROM a, m ORDER BY l_orderkey",
        "l_orderkey" -> "", "input_ids" -> "i"),
    "l6b_padding_batch" ->
      scl("WITH a AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS input_ids FROM lineitem GROUP BY 1), r AS (SELECT *, (row_number() OVER (ORDER BY l_orderkey) - 1) // 50 AS grp FROM a), m AS (SELECT grp, max(len(input_ids)) AS ml FROM r GROUP BY grp) SELECT l_orderkey, input_ids || list_transform(range(ml - len(input_ids)), x -> 0) AS input_ids FROM r JOIN m USING (grp) ORDER BY l_orderkey",
        "l_orderkey" -> "", "input_ids" -> "i"),
    "l7_collate_field" ->
      scl("WITH a AS (SELECT l_orderkey AS \"tok.idx\", list_sort(list(l_linenumber)) AS ids FROM lineitem GROUP BY 1), m AS (SELECT max(len(ids)) AS ml FROM a) SELECT \"tok.idx\", ids || list_transform(range(ml - len(ids)), x -> 0) AS \"tok.input_ids\", list_transform(ids, x -> 1) || list_transform(range(ml - len(ids)), x -> 0) AS \"tok.attention_mask\" FROM a, m ORDER BY \"tok.idx\"",
        "tok.idx" -> "", "tok.input_ids" -> "i", "tok.attention_mask" -> "i"),
    "u2_keep_columns" -> "SELECT p_partkey, p_name FROM part ORDER BY p_partkey",
    "u3_concat_rows" ->
      "SELECT * FROM (SELECT * FROM region UNION ALL SELECT * FROM region) ORDER BY r_regionkey",
    "u3_concat_columns" ->
      "SELECT doc_id, text, lang, source, n_chars, n_chars*2 AS n_chars_x2 FROM documents ORDER BY doc_id",
    "dd_exact" ->
      """WITH planted AS (SELECT * FROM documents UNION ALL SELECT doc_id+10000, text, lang, source, n_chars FROM documents WHERE doc_id < 100)
        |SELECT min(doc_id) AS doc_id, text, arg_min(lang, doc_id) AS lang, arg_min(source, doc_id) AS source, arg_min(n_chars, doc_id) AS n_chars, count(*) AS dup_count
        |FROM planted GROUP BY text ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // exact inverted-index Jaccard (NOT a MinHash replay): |∩| from the
    // shared-shingle count, |∪| = na + nb − |∩|. Complete for any
    // threshold > 0 (a qualifying pair shares ≥ 1 shingle), so unlike the
    // old all-pairs cross join it is exact AND tractable at sf0.1+.
    "dd_minhash_lsh" -> minhashPairOracle,
    // the STREAMING twin discovers the same pair set inside one drain
    // (eviction semantics are the multi-batch spec's job)
    "ev_stream_neardup" -> minhashPairOracle,
    "ev_stream_neardup_unique" -> minhashPairOracle,
    // the rewritten banded predicate must select exactly what DuckDB's
    // unbounded levenshtein selects
    "dd_edit_sql" ->
      """WITH m AS (SELECT doc_id, text, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS mtext
        | FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
        |SELECT doc_id, CAST(levenshtein(text, mtext) AS INTEGER) AS edit_distance
        |FROM m WHERE levenshtein(text, mtext) <= 12 ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the same planted corpus + blocking, verified by DuckDB's own
    // unbounded levenshtein behind the identical length-gap prune
    "dd_edit_verify" ->
      """WITH planted AS (SELECT doc_id, text, lang || '/' || substr(trim(text), 1, 8) AS blk FROM documents UNION ALL
        | SELECT doc_id+10000, mtext, lang || '/' || substr(trim(mtext), 1, 8)
        | FROM (SELECT doc_id, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS mtext, lang
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks, lang FROM documents WHERE doc_id < 50))),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_distance
        | FROM planted a JOIN planted b ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(length(a.text) - length(b.text)) <= 16)
        |SELECT id_a, id_b, edit_distance FROM p WHERE edit_distance <= 16 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    "dd_ngram_jaccard" ->
      """WITH planted AS (SELECT doc_id, text, lang || '/' || substr(trim(text), 1, 8) AS blk FROM documents UNION ALL
        | SELECT doc_id+10000, mtext, lang || '/' || substr(trim(mtext), 1, 8)
        | FROM (SELECT doc_id, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS mtext, lang
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks, lang FROM documents WHERE doc_id < 50))),
        |sh AS (SELECT doc_id, blk, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, blk, string_split(trim(text), ' ') AS toks FROM planted)),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE AS j
        | FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.3 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    "dd_cosine_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |  (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |   sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE a.vec_id < 150 AND b.vec_id < 150
        |  AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |  (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |   sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.15
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    // batch and streaming twins replay the SAME cell-scoped cross-cosine
    "cu_semdedup_contam" -> semDeDupContamOracle,
    "ev_stream_semdedup" -> semDeDupContamOracle,
    // full replay: formula-centroid assignment (cb_cluster_sample shape),
    // in-cell cosine pairs, recursive-CTE components, keep-furthest window
    "dd_semdedup" ->
      """WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings WHERE vec_id < 200),
        |planted AS (SELECT vec_id, vec FROM emb UNION ALL
        | SELECT vec_id+10000, list_transform(range(0,64), i -> vec[i+1] + ((i%5)-2)*0.01) FROM emb WHERE vec_id < 40),
        |a AS (SELECT vec_id, vec, list_transform(range(0,16), c ->
        |  list_sum(list_transform(range(0,64), t -> (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4)) * (vec[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4))))) AS ds FROM planted),
        |cl AS (SELECT vec_id, vec, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS kcluster, list_min(ds) AS cd FROM a),
        |pairs AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b FROM cl x JOIN cl y ON x.kcluster = y.kcluster AND x.vec_id < y.vec_id
        | WHERE list_dot_product(x.vec, y.vec) / (sqrt(list_dot_product(x.vec, x.vec)) * sqrt(list_dot_product(y.vec, y.vec))) >= 0.9),
        |edges AS (SELECT id_a AS u, id_b AS w FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(u, w) AS (SELECT u, w FROM edges UNION SELECT u, u FROM edges
        | UNION SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u),
        |cc AS (SELECT u AS id, min(w) AS dup_group FROM reach GROUP BY u),
        |scored AS (SELECT cl.vec_id AS id, cl.kcluster, coalesce(cc.dup_group, cl.vec_id) AS dup_group, cl.cd
        | FROM cl LEFT JOIN cc ON cl.vec_id = cc.id),
        |rk AS (SELECT id, kcluster, dup_group, row_number() OVER (PARTITION BY dup_group ORDER BY cd DESC, id) AS r FROM scored)
        |SELECT id AS vec_id, kcluster, dup_group, (r = 1) AS kept FROM rk ORDER BY vec_id""".stripMargin.replace("\n", " "),
    // pair generation shares dd_minhash_lsh's exact inverted-index shape
    "dd_clusters" ->
      """WITH RECURSIVE planted AS (SELECT doc_id, text FROM documents UNION ALL
        | SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
        | FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM planted)),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b
        | FROM cand JOIN szs sa ON sa.doc_id = cand.id_a JOIN szs sb ON sb.doc_id = cand.id_b
        | WHERE shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(u, v) AS (SELECT u, v FROM edges UNION SELECT u, u FROM edges
        | UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT u AS id, min(v) AS cluster FROM reach GROUP BY u ORDER BY id""".stripMargin.replace("\n", " "),
    "l5_to_tensor" ->
      scl("SELECT l_orderkey, CAST(list_sort(list(l_linenumber)) AS DOUBLE[]) AS nums FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
        "l_orderkey" -> "", "nums" -> "d"),
    "s3b_bm25_aux" ->
      scl("""WITH c AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks, toks[6:5+(doc_id % 4 + 1)] AS atoks FROM c WHERE doc_id < 20),
        |qw AS (SELECT qid, qtoks, atoks,
        |  CASE WHEN len(atoks) > 0 THEN 1 + greatest(0.5 * ln(greatest(CAST(len(qtoks) AS DOUBLE)/len(atoks), 1)), 0) ELSE 0 END AS w
        | FROM q),
        |qt AS (SELECT qid, unnest(qtoks) AS term, 1.0 AS w FROM qw
        |  UNION ALL SELECT qid, unnest(atoks) AS term, w FROM qw),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( qt.w * ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) / 2.0 AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "m2s2_cached_dense" ->
      scl("""WITH v AS (SELECT vec_id, [list_sum(CAST(embedding AS DOUBLE[])),
        |  list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * (i-1) * 0.1))] AS vec FROM embeddings),
        |qs AS (SELECT vec_id AS qid, vec AS qv FROM v WHERE vec_id < 8),
        |sc AS (SELECT qs.qid, v.vec_id AS idx, qs.qv[1]*v.vec[1] + qs.qv[2]*v.vec[2] AS score FROM qs CROSS JOIN v),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 5 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "ta_langid" ->
      """WITH s AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        | len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for'))) AS s_en,
        | len(list_filter(toks, t -> t IN ('der','die','das','und','ist','von','mit','ein','zu','den'))) AS s_de,
        | len(list_filter(toks, t -> t IN ('el','la','los','y','de','un','es','en','que','por'))) AS s_es,
        | len(list_filter(toks, t -> t IN ('le','la','les','et','de','un','est','en','que','pour'))) AS s_fr,
        | len(list_filter(toks, t -> t IN ('de','shi','le','zai','he','you','wo','ta','men','bu'))) AS s_zh
        | FROM s)
        |SELECT doc_id, CASE
        | WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
        | WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
        | WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
        | WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
        | WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
        | ELSE 'zh' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // quality replays the EXACT fixed-point rational (floor((2·num+den)/
    // (2·den))/1e4) — no double rounding step, boundary-free at any scale
    "ta_quality" ->
      """WITH s AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks, CAST(length(text) AS DOUBLE) AS nc FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS nt, nc,
        | CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for','der','die','das','und','ist','von','mit','ein','zu','den','el','la','los','y','de','un','es','en','que','por','le','les','et','est','pour','shi','zai','he','you','wo','ta','men','bu'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_r,
        | (nc - length(regexp_replace(text, '[0-9]', '', 'g'))) / nc AS dig_r,
        | (nc - length(regexp_replace(text, '[A-Z]', '', 'g'))) / nc AS up_r,
        | CAST(len(toks) AS BIGINT) AS nti,
        | CAST(greatest(length(text), 1) AS BIGINT) AS nci,
        | CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for','der','die','das','und','ist','von','mit','ein','zu','den','el','la','los','y','de','un','es','en','que','por','le','les','et','est','pour','shi','zai','he','you','wo','ta','men','bu'))) AS BIGINT) AS si,
        | CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS ldi,
        | CAST(length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS lui
        | FROM s)
        |SELECT doc_id, CAST(nt AS INT) AS n_tokens,
        | round((nc - (nt - 1)) / nt, 4) AS mean_token_len,
        | round(stop_r, 4) AS stopword_ratio,
        | round(dig_r, 4) AS digit_ratio,
        | round(up_r, 4) AS upper_ratio,
        | CAST(floor(((80*least(nti,50)*nti*nci + 4000*least(4*si,nti)*nci + 1000*ldi*nti + 1000*lui*nti)*2 + nti*nci) / (nti*nci*2.0)) AS DOUBLE) / 10000.0 AS quality
        |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ta_token_count" ->
      """SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
        | CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> length(t) > 0)) AS INT) AS word_tokens,
        | CAST(ceil(length(text)/4.0) AS INT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ta_fingerprint" ->
      """WITH s AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
        |SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(toks, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |   list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))),
        |   (h, c) -> (h*31 + c) % 1000003))),
        | (h, t) -> (h*131 + t) % 1000000007) AS fingerprint
        |FROM s ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ta_normalize" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[0-9]', '0', 'g'), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the SQL front end must equal the pipe's output exactly — same oracle
    "ta_normalize_sql" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[0-9]', '0', 'g'), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ta_quality_sql" ->
      """WITH s AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
        |m AS (SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS nti,
        | CAST(greatest(length(text), 1) AS BIGINT) AS nci,
        | CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for','der','die','das','und','ist','von','mit','ein','zu','den','el','la','los','y','de','un','es','en','que','por','le','les','et','est','pour','shi','zai','he','you','wo','ta','men','bu'))) AS BIGINT) AS si,
        | CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS ldi,
        | CAST(length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS lui
        | FROM s)
        |SELECT doc_id, CAST(floor(((80*least(nti,50)*nti*nci + 4000*least(4*si,nti)*nci + 1000*ldi*nti + 1000*lui*nti)*2 + nti*nci) / (nti*nci*2.0)) AS DOUBLE) / 10000.0 AS quality
        |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ta_fold_accents" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(strip_accents(coalesce(text, '') || ' café Zürich niño àéîõü ÀÉÎÕÜ ç!')), '[0-9]', '0', 'g'), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // integer-exact replay of the Gopher rule battery over the
    // identically planted line/symbol structure
    "qg_gopher_rules" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 5 = 0 THEN '# ' ELSE '' END) || replace(replace(text, ' line ', chr(10) || '- line '), ' slow ', '…' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN ' ...' ELSE '' END) AS text
        | FROM documents),
        |m AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, string_split(text, chr(10)) AS lines, text FROM s),
        |c AS (SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_words,
        | CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS BIGINT) AS sum_word_len,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS BIGINT) AS bullet_lines,
        | CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS BIGINT) AS ellipsis_lines,
        | CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        | CAST((length(text)-length(replace(text,'#',''))) + (length(text)-length(replace(text,'...','')))//3 + (length(text)-length(replace(text,'…',''))) AS BIGINT) AS symbol_count,
        | CAST(len(list_distinct(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for')))) AS BIGINT) AS distinct_stopwords
        | FROM m)
        |SELECT doc_id, n_words, sum_word_len, n_lines, bullet_lines, ellipsis_lines, alpha_words, symbol_count, distinct_stopwords,
        | (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
        | (sum_word_len >= n_words*3 AND sum_word_len <= n_words*10) AS rule_mean_word_len,
        | (symbol_count*10 <= n_words) AS rule_symbol_ratio,
        | (bullet_lines*10 <= n_lines*9) AS rule_bullet_lines,
        | (ellipsis_lines*10 <= n_lines*3) AS rule_ellipsis_lines,
        | (alpha_words*5 >= n_words*4) AS rule_alpha_words,
        | (distinct_stopwords >= 2) AS rule_stopwords,
        | (n_words >= 50 AND n_words <= 100000 AND sum_word_len >= n_words*3 AND sum_word_len <= n_words*10 AND symbol_count*10 <= n_words AND bullet_lines*10 <= n_lines*9 AND ellipsis_lines*10 <= n_lines*3 AND alpha_words*5 >= n_words*4 AND distinct_stopwords >= 2) AS gopher_keep
        |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the SQL front end folds the same battery to its keep flag
    "qg_gopher_sql" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 5 = 0 THEN '# ' ELSE '' END) || replace(replace(text, ' line ', chr(10) || '- line '), ' slow ', '…' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN ' ...' ELSE '' END) AS text
        | FROM documents),
        |m AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks, string_split(text, chr(10)) AS lines, text FROM s),
        |c AS (SELECT doc_id,
        | CAST(len(toks) AS BIGINT) AS n_words,
        | CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS BIGINT) AS sum_word_len,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS BIGINT) AS bullet_lines,
        | CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS BIGINT) AS ellipsis_lines,
        | CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        | CAST((length(text)-length(replace(text,'#',''))) + (length(text)-length(replace(text,'...','')))//3 + (length(text)-length(replace(text,'…',''))) AS BIGINT) AS symbol_count,
        | CAST(len(list_distinct(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for')))) AS BIGINT) AS distinct_stopwords
        | FROM m)
        |SELECT doc_id,
        | (n_words >= 50 AND n_words <= 100000 AND sum_word_len >= n_words*3 AND sum_word_len <= n_words*10 AND symbol_count*10 <= n_words AND bullet_lines*10 <= n_lines*9 AND ellipsis_lines*10 <= n_lines*3 AND alpha_words*5 >= n_words*4 AND distinct_stopwords >= 2) AS gopher_keep
        |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the C4 line battery replayed over the identically planted pages
    "cu_c4_clean" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) || (CASE WHEN doc_id % 13 = 0 THEN '{ cfg }' || chr(10) ELSE '' END) || replace(replace(text, ' fast ', '.' || chr(10)), ' data ', '?' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Enable javascript to proceed now please.' ELSE '' END) AS text
        | FROM documents),
        |m AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM s),
        |k AS (SELECT doc_id, text, lines,
        | list_filter(lines, l -> regexp_matches(rtrim(l, ' ' || chr(9)), '[.!?"”]$') AND length(trim(rtrim(l, ' ' || chr(9)))) > 0 AND len(regexp_split_to_array(trim(rtrim(l, ' ' || chr(9))), '\s+')) >= 5 AND NOT contains(lower(rtrim(l, ' ' || chr(9))), 'javascript')) AS kept
        | FROM m),
        |c AS (SELECT doc_id, text, lines, kept, coalesce(array_to_string(kept, chr(10)), '') AS clean FROM k),
        |f AS (SELECT doc_id, clean,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(kept) AS BIGINT) AS kept_lines,
        | CAST(len(regexp_extract_all(clean, '[.!?]+')) AS BIGINT) AS n_sentences,
        | contains(lower(text), 'lorem ipsum') AS flag_lorem_ipsum,
        | contains(text, '{') AS flag_curly_brace
        | FROM c)
        |SELECT doc_id, clean AS text, n_lines, kept_lines, n_sentences, flag_lorem_ipsum, flag_curly_brace,
        | (n_sentences >= 3) AS rule_min_sentences,
        | (n_sentences >= 3 AND NOT flag_lorem_ipsum AND NOT flag_curly_brace) AS c4_keep
        |FROM f ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the SQL front end folds the same battery to the cleaned page
    "cu_c4_clean_sql" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) || (CASE WHEN doc_id % 13 = 0 THEN '{ cfg }' || chr(10) ELSE '' END) || replace(replace(text, ' fast ', '.' || chr(10)), ' data ', '?' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Enable javascript to proceed now please.' ELSE '' END) AS text
        | FROM documents),
        |m AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM s)
        |SELECT doc_id, coalesce(array_to_string(list_filter(lines, l -> regexp_matches(rtrim(l, ' ' || chr(9)), '[.!?"”]$') AND length(trim(rtrim(l, ' ' || chr(9)))) > 0 AND len(regexp_split_to_array(trim(rtrim(l, ' ' || chr(9))), '\s+')) >= 5 AND NOT contains(lower(rtrim(l, ' ' || chr(9))), 'javascript')), chr(10)), '') AS text
        |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // tumbling three-sentence spans, global-first survivor, rebuild
    "dd_span_dedup" ->
      """WITH s AS (SELECT doc_id,
        | replace(replace(text, ' merge ', '. '), ' join ', '! ') || (CASE WHEN doc_id % 10 < 3 THEN ' One shared passage sits here. It repeats across documents verbatim. Every planted page carries this boilerplate.' ELSE '' END) AS text
        | FROM documents),
        |m AS (SELECT doc_id, regexp_extract_all(text, '[^.!?]*[.!?]+') AS sents FROM s),
        |e AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, array_to_string(sents[(i-1)*3+1:(i-1)*3+3], '') AS span
        | FROM m, unnest(generate_series(1, CAST(ceil(len(sents)/3.0) AS INT))) AS u(i)),
        |r AS (SELECT doc_id, pos, span, row_number() OVER (PARTITION BY trim(span) ORDER BY doc_id, pos) AS rn FROM e),
        |b AS (SELECT doc_id, coalesce(string_agg(CASE WHEN rn = 1 THEN span END, '' ORDER BY pos), '') AS clean, sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS removed FROM r GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(b.clean, '') AS text, CAST(coalesce(b.removed, 0) AS BIGINT) AS n_spans_removed
        |FROM s LEFT JOIN b ON s.doc_id = b.doc_id ORDER BY s.doc_id""".stripMargin.replace("\n", " "),
    // first-occurrence line filter replayed via the indexed list lambda
    "ld_intra_doc" ->
      """WITH s AS (SELECT doc_id, replace(text, ' line ', chr(10) || 'Repeated boilerplate block.' || chr(10)) AS text FROM documents),
        |m AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM s),
        |k AS (SELECT doc_id, lines, list_filter(lines, (l, i) -> list_position(lines, l) = i) AS kept FROM m)
        |SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS text, CAST(len(lines) - len(kept) AS BIGINT) AS n_intra_removed
        |FROM k ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // byte-level replay of the fixture files the gate itself lays down
    "mm_binary_ingest" ->
      """WITH s AS (SELECT doc_id,
        | (CASE doc_id % 3 WHEN 0 THEN 'PNG' WHEN 1 THEN 'JPG' ELSE 'BIN' END) || substr(text, 1, 64) AS payload
        | FROM documents WHERE doc_id < 200)
        |SELECT doc_id, CAST(length(payload) AS BIGINT) AS length, substr(payload, 1, 3) AS format, md5(payload) AS digest
        |FROM s ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the identical anchored URL regex + list algebra over planted URLs
    "cu_url_canonicalize" ->
      """WITH s AS (SELECT doc_id,
        | CASE WHEN doc_id % 17 = 0 THEN 'not a url' ELSE 'HTTP://Ex' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END) || '/Path/' || CAST(doc_id % 13 AS VARCHAR) || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=news&b=2&a=1&fbclid=x' ELSE '?z=9&y=8' END) || '#f' || CAST(doc_id % 5 AS VARCHAR) END AS url
        | FROM documents),
        |m AS (SELECT doc_id, url,
        | regexp_matches(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$') AS valid,
        | lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
        | lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS auth0,
        | regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path0,
        | regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS q
        | FROM s),
        |a AS (SELECT doc_id, valid,
        | CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '') WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '') ELSE auth0 END AS auth,
        | scheme, CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        | list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') AND string_split(p, '=')[1] NOT IN ('fbclid', 'gclid', 'msclkid', 'mc_eid'))) AS kept
        | FROM m)
        |SELECT doc_id,
        | CASE WHEN valid THEN scheme || '://' || auth || path || (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END) END AS url_canonical,
        | CASE WHEN valid THEN regexp_replace(auth, ':[0-9]+$', '') END AS url_host,
        | valid AS url_valid
        |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the SQL front end folds the same algebra to the canonical scalar
    "cu_url_canonical_sql" ->
      """WITH s AS (SELECT doc_id,
        | CASE WHEN doc_id % 17 = 0 THEN 'not a url' ELSE 'HTTP://Ex' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' || (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END) || '/Path/' || CAST(doc_id % 13 AS VARCHAR) || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=news&b=2&a=1&fbclid=x' ELSE '?z=9&y=8' END) || '#f' || CAST(doc_id % 5 AS VARCHAR) END AS url
        | FROM documents),
        |m AS (SELECT doc_id, url,
        | regexp_matches(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$') AS valid,
        | lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
        | lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS auth0,
        | regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path0,
        | regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS q
        | FROM s),
        |a AS (SELECT doc_id, valid,
        | CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '') WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '') ELSE auth0 END AS auth,
        | scheme, CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        | list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') AND string_split(p, '=')[1] NOT IN ('fbclid', 'gclid', 'msclkid', 'mc_eid'))) AS kept
        | FROM m)
        |SELECT doc_id,
        | CASE WHEN valid THEN scheme || '://' || auth || path || (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END) END AS url_canonical
        |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the identical RE2 pattern chain over the identically planted markup
    "tx_html_extract" ->
      """WITH h AS (SELECT doc_id,
        | '<html><head><title>T</title><style>p { color: red; }</style></head><body><!-- drop me --><h1>H &amp;lt; X</h1><p class="a">'
        | || text ||
        | ' &quot;q&#39;s&quot; &lt;tag&gt;&nbsp;end</p><script type="text/javascript">var x = "<p>not text</p>";</script></body></html>' AS html
        | FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html, '(?s)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        | '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'), '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM s3)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text_extracted
        |FROM s4 ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ws_weighted_sample" -> weightedSampleOracle,
    // the streaming reservoir must converge to the SAME top-120
    "ev_stream_weighted_sample" -> weightedSampleOracle,
    "ws_weighted_stratified" ->
      """WITH s AS (SELECT doc_id, lang, n_chars, (doc_id*131 + 17) % 2147483647 AS s1
        | FROM documents WHERE n_chars > 0),
        |m AS (SELECT doc_id, lang, n_chars,
        | ln(((s1*s1 + s1) % 2147483647 + 1) / 2147483648.0) / CAST(n_chars AS DOUBLE) AS k FROM s),
        |r AS (SELECT doc_id, lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn FROM m)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "dd_norm_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |planted AS (SELECT doc_id, text FROM base
        | UNION ALL SELECT doc_id+500000, upper(text) || ' !!' FROM base WHERE doc_id < 50),
        |norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[0-9]', '0', 'g'), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS tn FROM planted)
        |SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM norm GROUP BY tn ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // REAL decode oracle: the formula that painted the BMP/PNG fixtures
    // regenerates every RGB value — dims and the md5 pixel digest must
    // match the javax.imageio decode byte-exactly
    "mm_decode_real" ->
      """WITH ids AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents WHERE doc_id < 200),
        |pix AS (SELECT i.doc_id, i.w, i.h, yy.y AS y, xx.x AS x,
        | (i.doc_id*7 + xx.x*13 + yy.y*31) % 256 AS r,
        | (i.doc_id*11 + xx.x*5 + yy.y*17) % 256 AS g,
        | (i.doc_id*3 + xx.x*23 + yy.y*29) % 256 AS b
        | FROM ids i, generate_series(0, 11) AS yy(y), generate_series(0, 15) AS xx(x)
        | WHERE yy.y < i.h AND xx.x < i.w)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(3 AS INT) AS channels,
        | md5(string_agg(r || ',' || g || ',' || b, ',' ORDER BY y, x)) AS pix_digest
        |FROM pix GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // nearest-neighbor resample replay: out(x,y) = formula(x*w//7, y*h//5)
    "mm_resize_real" ->
      """WITH ids AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents WHERE doc_id < 200),
        |pix AS (SELECT i.doc_id, yy.y AS y, xx.x AS x,
        | (i.doc_id*7 + ((xx.x * i.w) // 7)*13 + ((yy.y * i.h) // 5)*31) % 256 AS r,
        | (i.doc_id*11 + ((xx.x * i.w) // 7)*5 + ((yy.y * i.h) // 5)*17) % 256 AS g,
        | (i.doc_id*3 + ((xx.x * i.w) // 7)*23 + ((yy.y * i.h) // 5)*29) % 256 AS b
        | FROM ids i, generate_series(0, 4) AS yy(y), generate_series(0, 6) AS xx(x))
        |SELECT doc_id, CAST(7 AS INT) AS width, CAST(5 AS INT) AS height,
        | md5(string_agg(r || ',' || g || ',' || b, ',' ORDER BY y, x)) AS pix_digest
        |FROM pix GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // REAL audio decode oracle: the formula that wrote the PCM WAV
    // fixtures regenerates every amplitude — format fields and the md5
    // sample digest must match the javax.sound.sampled decode exactly
    "mm_audio_decode" ->
      """WITH ids AS (SELECT doc_id, 8000 + (doc_id % 3)*4000 AS sr, 1 + doc_id % 2 AS ch, 40 + doc_id % 25 AS nf FROM documents WHERE doc_id < 200),
        |smp AS (SELECT i.doc_id, i.sr, i.ch, i.nf, ff.i AS frame, cc.c AS c,
        | ((i.doc_id*31 + ff.i*17 + cc.c*101) % 65536) - 32768 AS v
        | FROM ids i, generate_series(0, 64) AS ff(i), generate_series(0, 1) AS cc(c)
        | WHERE ff.i < i.nf AND cc.c < i.ch)
        |SELECT doc_id, CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels, CAST(nf AS INT) AS n_frames,
        | md5(string_agg(v, ',' ORDER BY frame, c)) AS sample_digest
        |FROM smp GROUP BY doc_id, sr, ch, nf ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // nearest-neighbor frame resample replay: out frame j reads source
    // frame (j*nf)//24, every channel copied
    "mm_audio_resample" ->
      """WITH ids AS (SELECT doc_id, 8000 + (doc_id % 3)*4000 AS sr, 1 + doc_id % 2 AS ch, 40 + doc_id % 25 AS nf FROM documents WHERE doc_id < 200),
        |smp AS (SELECT i.doc_id, i.sr, i.ch, jj.j AS frame, cc.c AS c,
        | ((i.doc_id*31 + ((jj.j*i.nf)//24)*17 + cc.c*101) % 65536) - 32768 AS v
        | FROM ids i, generate_series(0, 23) AS jj(j), generate_series(0, 1) AS cc(c)
        | WHERE cc.c < i.ch)
        |SELECT doc_id, CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels, CAST(24 AS INT) AS n_frames,
        | md5(string_agg(v, ',' ORDER BY frame, c)) AS sample_digest
        |FROM smp GROUP BY doc_id, sr, ch ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "mm_media_meta" ->
      "SELECT doc_id, 'utf8-text' AS format, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes FROM documents ORDER BY doc_id",
    "mm_decode_stub" ->
      scl("""SELECT doc_id, list_transform(range(0, 8), j ->
        | round(list_avg(list_transform(range(j+1, length(text)+1, 8), i -> unicode(text[i]))) / 255, 4)) AS f
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
        "doc_id" -> "", "f" -> "d"),
    "mm_frame_sample" ->
      scl("""SELECT doc_id,
        | list_transform(range(0, length(text), 64)[1:8], x -> x) AS offsets,
        | list_transform(range(0, length(text), 64)[1:8], o -> substr(text, o+1, 16)) AS chunks
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
        "doc_id" -> "", "offsets" -> "i", "chunks" -> "s"),
    "m1_predict" ->
      scl("""SELECT vec_id, [round(list_sum(CAST(embedding AS DOUBLE[])), 4), round(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * (i-1))) + 0.5, 4)] AS vector FROM embeddings ORDER BY vec_id""",
        "vec_id" -> "", "vector" -> "d"),
    "m2_predict_cached" ->
      scl("""SELECT vec_id, [round(list_sum(CAST(embedding AS DOUBLE[])), 4), round(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * (i-1))) + 0.5, 4)] AS vector FROM embeddings ORDER BY vec_id""",
        "vec_id" -> "", "vector" -> "d"),
    // both GEMM layers replayed from the weight formula (k-ascending
    // sums; ReLU = greatest; fixed-point e4 output, no round())
    "m4_mlp_batched" ->
      scl("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |h AS (SELECT vec_id, list_transform(range(0,32), j -> greatest(list_sum(list_transform(range(0,64), k -> x[k+1] * ((((k*7 + j*11) % 9) - 4) * 0.125))) + (j % 5) * 0.0625, 0)) AS h FROM v),
        |y AS (SELECT vec_id, list_transform(range(0,16), j -> list_sum(list_transform(range(0,32), k -> h[k+1] * ((((k*13 + j*5) % 9) - 4) * 0.125))) + (j % 7) * 0.0625) AS y FROM h)
        |SELECT vec_id, list_transform(y, e -> CAST(floor(e * 10000 + 0.5) AS BIGINT)) AS vector FROM y ORDER BY vec_id""".stripMargin.replace("\n", " "),
        "vec_id" -> "", "vector" -> "i"),
    // identical weights to m4 (the file round-trip is F32-exact), so the
    // same formula replay is the oracle
    "m5_mlp_from_file" ->
      scl("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |h AS (SELECT vec_id, list_transform(range(0,32), j -> greatest(list_sum(list_transform(range(0,64), k -> x[k+1] * ((((k*7 + j*11) % 9) - 4) * 0.125))) + (j % 5) * 0.0625, 0)) AS h FROM v),
        |y AS (SELECT vec_id, list_transform(range(0,16), j -> list_sum(list_transform(range(0,32), k -> h[k+1] * ((((k*13 + j*5) % 9) - 4) * 0.125))) + (j % 7) * 0.0625) AS y FROM h)
        |SELECT vec_id, list_transform(y, e -> CAST(floor(e * 10000 + 0.5) AS BIGINT)) AS vector FROM y ORDER BY vec_id""".stripMargin.replace("\n", " "),
        "vec_id" -> "", "vector" -> "i"),
    "s2_dense_bruteforce" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // identical to s2: with nprobe = nlist the IVF candidate set is total,
    // so exact brute-force top-k is the oracle
    // the streamed results must equal the batch brute-force replay
    "ev_stream_dense_search" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s1_ivf_dense" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // state persisted + reloaded by a fresh engine instance; nprobe = nlist
    // keeps the reloaded-state search exact, so the same brute-force shape
    // is the oracle (k=8 over the first 8 queries)
    "s1b_ivf_state_roundtrip" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 8 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "u1_take_subset" ->
      "SELECT * FROM part ORDER BY (p_partkey * 2654435761) % 1000003, p_partkey LIMIT 500",
    // replays SimHashDedupPipe(tokenHash=poly61) exactly: tokenId
    // polynomial fold -> two multiply+rotate-xor mixing steps -> 61-bit
    // per-bit majority votes -> Hamming <= 3 verified on full signatures.
    // Candidates come from 16-bit band equality — COMPLETE by pigeonhole
    // (4 disjoint bands cover 61 bits; <= 3 diffs leave one band clean) —
    // so the result equals the old all-pairs join at any scale, sf0.1+
    // tractable.
    "dd_simhash" ->
      """WITH planted AS (SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)
        | UNION ALL SELECT doc_id+20000, text FROM documents WHERE doc_id < 30),
        |tok AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM planted),
        |ids AS (SELECT doc_id, list_transform(toks, t -> list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))), (h,c) -> (h*31+c) % 1000003)) AS l FROM tok),
        |s0 AS (SELECT doc_id, list_transform(l, x -> x*2097169 + 12345) AS l FROM ids),
        |s1 AS (SELECT doc_id, list_transform(l, x -> xor(x, (x % 1073741824) * 2147483648 + x // 1073741824)) AS l FROM s0),
        |s2 AS (SELECT doc_id, list_transform(l, x -> (x*3 + 7) % 2305843009213693951) AS l FROM s1),
        |sg AS (SELECT doc_id, list_transform(l, x -> xor(x, (x % 17592186044416) * 131072 + x // 17592186044416)) AS sigs FROM s2),
        |sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 61), b ->
        |  CASE WHEN list_sum(list_transform(sigs, s -> CASE WHEN (s // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS sim FROM sg),
        |bnd AS (SELECT doc_id, sim, z.b AS b, (sim // (1::BIGINT << CAST(z.b*16 AS INT))) % 65536 AS bv
        | FROM sim, LATERAL (SELECT unnest(range(0, 4)) AS b) z),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sim AS sa, b.sim AS sb
        | FROM bnd a JOIN bnd b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    // the streamed lexical results must equal the batch scoring replay
    "ev_stream_bm25_search" ->
      scl("""WITH c AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s3_bm25" ->
      scl("""WITH c AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s3c_bm25_filter" ->
      scl("""WITH c AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, lang AS qlang, toks[1:5] AS qtoks FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, qlang, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id
        |  JOIN c cd ON post.doc_id = cd.doc_id AND cd.lang = qt.qlang CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s4_group_lookup" ->
      scl("""WITH li AS (SELECT l_orderkey AS gid, l_orderkey*10+l_linenumber AS rid FROM lineitem),
        |lk AS (SELECT gid, list_sort(list(rid)) AS members FROM li GROUP BY gid),
        |q AS (SELECT o_orderkey AS qid FROM orders WHERE o_orderkey < 200),
        |j AS (SELECT qid, coalesce(members[1:8], []) AS m FROM q LEFT JOIN lk ON qid = gid)
        |SELECT qid, m || list_transform(range(8 - len(m)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | list_transform(m, x -> 0.0) || list_transform(range(8 - len(m)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM j ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s5_topk" ->
      scl("""WITH x AS (SELECT l_orderkey AS qid, CAST(l_linenumber AS BIGINT) AS idx, l_quantity AS score FROM lineitem),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM x),
        |g AS (SELECT qid, list(idx ORDER BY r) AS li, list(score ORDER BY r) AS ls FROM rk WHERE r <= 3 GROUP BY qid)
        |SELECT qid, li || list_transform(range(3 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(3 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s6_merge_engines" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label FROM embeddings WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |d5 AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc) WHERE r <= 5),
        |l5 AS (SELECT qs.qid, e.vec_id AS idx FROM qs JOIN embeddings e ON qs.label = e.label QUALIFY row_number() OVER (PARTITION BY qs.qid ORDER BY e.vec_id) <= 5),
        |mins AS (SELECT qid, min(score) AS mn FROM d5 GROUP BY qid),
        |contrib AS (SELECT qid, idx, score - mn AS s FROM d5 JOIN mins USING(qid) UNION ALL SELECT qid, idx, 0.0 AS s FROM l5),
        |merged AS (SELECT qid, idx, sum(s) AS soff FROM contrib GROUP BY qid, idx),
        |fin AS (SELECT m.qid, CAST(m.idx AS BIGINT) AS idx, m.soff + mins.mn AS score FROM merged m JOIN mins USING(qid)),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM fin)
        |SELECT qid, list(idx ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 5 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s8_index_cascade" ->
      scl("""WITH qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, CAST(e.embedding AS DOUBLE[])) AS score FROM qs CROSS JOIN embeddings e),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s8b_index_builder" ->
      scl("""WITH v AS (SELECT vec_id, [list_sum(CAST(embedding AS DOUBLE[])),
        |  list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * (i-1) * 0.1))] AS vec FROM embeddings),
        |qs AS (SELECT vec_id AS qid, vec AS qv FROM v WHERE vec_id < 8),
        |sc AS (SELECT qs.qid, v.vec_id AS idx, qs.qv[1]*v.vec[1] + qs.qv[2]*v.vec[2] AS score FROM qs CROSS JOIN v),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score" FROM rk WHERE r <= 3 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "t3_field_collate" ->
      scl("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |ids AS (SELECT doc_id, list_transform(toks, t -> CAST(list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))), (h,c) -> (h*31+c) % 1000003) AS INT)) AS l FROM t),
        |m AS (SELECT max(len(l)) AS ml FROM ids)
        |SELECT doc_id,
        | l || list_transform(range(ml - len(l)), x -> 0) AS "doc.input_ids",
        | list_transform(l, x -> 1) || list_transform(range(ml - len(l)), x -> 0) AS "doc.attention_mask"
        |FROM ids, m ORDER BY doc_id""".stripMargin.replace("\n", " "),
        "doc_id" -> "", "doc.input_ids" -> "i", "doc.attention_mask" -> "i"),
    "t1_tokenizer" ->
      scl("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
        |SELECT doc_id,
        | list_transform(toks, t -> CAST(list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))), (h,c) -> (h*31+c) % 1000003) AS INT)) AS input_ids,
        | list_transform(toks, t -> 1) AS attention_mask,
        | list_transform(toks, t -> 0) AS token_type_ids,
        | list_transform(range(1, len(toks)+1), i -> [CAST(coalesce(list_sum(list_transform(toks[1:i-1], s -> length(s)+1)),0) AS INT), CAST(coalesce(list_sum(list_transform(toks[1:i-1], s -> length(s)+1)),0)+length(toks[i]) AS INT)]) AS offset_mapping
        |FROM t ORDER BY doc_id""".stripMargin.replace("\n", " "),
        "doc_id" -> "", "input_ids" -> "i", "attention_mask" -> "i", "token_type_ids" -> "i", "offset_mapping" -> "ii"),
    "bp_bpe_encode" ->
      scl(bpeOracleSql(bpePinnedMerges),
        "doc_id" -> "", "bpe_tokens" -> "s", "n_bpe_tokens" -> ""),
    // two front ends, one kernel: the SQL function must hash-match the
    // pipe gate's oracle byte-for-byte
    "bp_bpe_encode_sql" ->
      scl(bpeOracleSql(bpePinnedMerges),
        "doc_id" -> "", "bpe_tokens" -> "s", "n_bpe_tokens" -> ""),
    "t2_passages" ->
      scl("""WITH t AS (SELECT doc_id, text, string_split(text,' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, text,
        | list_transform(toks, t -> CAST(list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(range(1, length(t)+1), j -> CAST(unicode(t[j]) AS BIGINT))), (h,c) -> (h*31+c)%1000003) AS INT)) AS ids,
        | list_transform(range(1, len(toks)+1), j -> [CAST(coalesce(list_sum(list_transform(toks[1:j-1], s -> length(s)+1)),0) AS INT), CAST(coalesce(list_sum(list_transform(toks[1:j-1], s -> length(s)+1)),0)+length(toks[j]) AS INT)]) AS om
        | FROM t),
        |win AS (SELECT doc_id, text, ids, om, len(ids) AS n,
        | unnest(list_filter(range(0, greatest(len(ids),1), 14), ii -> least(22, len(ids) - ii) > (CASE WHEN ii=0 THEN 0 ELSE 4 END))) AS i
        | FROM tok),
        |p AS (SELECT doc_id, text, ids, om, n, i,
        | CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INT) AS passage_idx,
        | CASE WHEN i=0 THEN 0 ELSE 4 END AS lp,
        | least(22, n - i) AS sl
        | FROM win)
        |SELECT doc_id, passage_idx,
        | [1] || ids[i+1:i+sl] || [2] || list_transform(range(22 - sl), x -> 0) AS input_ids,
        | [1] || list_transform(ids[i+1:i+sl], x -> 1) || [1] || list_transform(range(22 - sl), x -> 0) AS attention_mask,
        | [[-1,-1]] || om[i+1:i+sl] || [[-1,-1]] || list_transform(range(22 - sl), x -> [-1,-1]) AS offset_mapping,
        | list_transform(range(0, 24), pp -> CASE WHEN pp >= 1 + lp AND pp < 1 + lp + (22 - lp - 4) AND pp < sl + 2 THEN 1 ELSE 0 END) AS passage_mask,
        | text[(list_min(list_filter(flatten(om[i+1:i+sl]), v -> v >= 0)) + 1):list_max(flatten(om[i+1:i+sl]))] AS text
        |FROM p ORDER BY doc_id, passage_idx""".stripMargin.replace("\n", " "),
        "doc_id" -> "", "passage_idx" -> "", "input_ids" -> "i", "attention_mask" -> "i", "offset_mapping" -> "ii", "passage_mask" -> "i", "text" -> ""),
    "ev_window_agg" ->
      "SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS ws, event_type, count(*) AS cnt, round(sum(value),4) AS sv FROM events GROUP BY 1,2 ORDER BY ws, event_type",
    // same oracle as ev_window_agg — the Spark side runs a real
    // StreamingQuery (file source -> memory sink) instead of the batch plan
    "ev_stream_window" ->
      "SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS ws, event_type, count(*) AS cnt, round(sum(value),4) AS sv FROM events GROUP BY 1,2 ORDER BY ws, event_type",
    "ev_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "ev_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment, c.c_acctbal
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin.replace("\n", " "),
    "ev_stream_curate" ->
      """WITH p AS (SELECT event_id, props || ' reach user' || event_id || '@example.com or 555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') AS note FROM events)
        |SELECT event_id,
        | CAST(len(regexp_extract_all(note, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(note, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
        | CAST(len(regexp_extract_all(note, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ips,
        | regexp_replace(regexp_replace(regexp_replace(note,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS note_redacted
        |FROM p ORDER BY event_id""".stripMargin.replace("\n", " "),
    "ev_stream_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type='click'),
        |w AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS wstart FROM events WHERE event_type='error')
        |SELECT c.event_id, c.user_id, c.ts_us, w.err_id, w.wstart
        |FROM c JOIN w ON c.user_id = w.user_id AND c.ts_us >= w.wstart AND c.ts_us <= w.wstart + 1800000000
        |ORDER BY c.event_id, w.err_id""".stripMargin.replace("\n", " "),
    "ev_sessionize" ->
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
        |       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS ns
        | FROM events),
        |s AS (SELECT user_id, ts,
        |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
        | FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin.replace("\n", " "),
    "q1_pricing_summary" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, round(sum(l_extendedprice),2) AS sum_base, round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc, round(avg(l_quantity),4) AS avg_qty, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q3_order_revenue" ->
      "SELECT o_orderkey, o_orderpriority, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey, o_orderpriority ORDER BY revenue DESC, o_orderkey LIMIT 100",
    // salting/bucketing change PARTITIONING only — the oracles are the
    // plain join / plain GROUP BY the utilities must be indistinguishable
    // from
    "sj_salted_join" ->
      "SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, s_name, s_nationkey FROM lineitem JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber",
    "sj_salted_agg" ->
      "SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, count(l_orderkey) AS ok, max(CAST(l_linenumber AS BIGINT)) AS ln FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "bj_bucketed_join" ->
      "SELECT o_orderkey, o_orderpriority, round(sum(l_extendedprice),2) AS rev FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey, o_orderpriority ORDER BY o_orderkey",
    "s9_auto_engine" ->
      scl("""WITH c AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks FROM c WHERE doc_id >= 100 AND doc_id < 120),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "m3_dispatch" ->
      scl("""SELECT vec_id, [round(list_sum(list_transform(range(1, len(embedding)+1), i -> CAST(embedding[i] AS DOUBLE) * (CASE WHEN (i-1)%2=0 THEN 1.0 ELSE -1.0 END))) + 0.25, 4)] AS vector FROM embeddings ORDER BY vec_id""",
        "vec_id" -> "", "vector" -> "d"),
    // SRP-LSH: exhaustive replay is exact because recall is pigeonhole-
    // exact at hamming <= bands-1 and signatures are formula-deterministic
    // exact SRP replay; candidates from 4-bit band equality over the
    // 16-bit signature — COMPLETE by pigeonhole (4 disjoint bands, <= 3
    // differing bits leave one band clean), hamming verified on the full
    // signature and cosine on raw vectors, so the result equals the old
    // all-pairs join while staying sf0.1-tractable. 48 bits / 6 bands of
    // 8 (256 buckets per band) mirror the pipe's scale-sane defaults.
    "dd_srp_cosine" ->
      """WITH raw AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |base AS (SELECT id, v FROM raw
        | UNION ALL SELECT id+10000, list_transform(range(0,64), t -> v[t+1] + ((t % 5) - 2) * 0.01) FROM raw WHERE id < 30),
        |sig AS (SELECT id, v,
        | list_sum(list_transform(range(0,60), b ->
        |  CASE WHEN list_sum(list_transform(range(0,64), t ->
        |    v[t+1] * ((((b*37 + t*11) % 21) - 10) / 10.0))) > 0
        |  THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS sg
        | FROM base),
        |bnd AS (SELECT id, CAST(sg AS BIGINT) AS sg, z.b AS b,
        |  (CAST(sg AS BIGINT) // (1::BIGINT << CAST(z.b*10 AS INT))) % 1024 AS bv
        | FROM sig, LATERAL (SELECT unnest(range(0, 6)) AS b) z),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sg AS sa, b.sg AS sb
        | FROM bnd a JOIN bnd b ON a.b = b.b AND a.bv = b.bv AND a.id < b.id),
        |ham AS (SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        | FROM cand WHERE bit_count(xor(sa, sb)) <= 5),
        |pairs AS (SELECT id_a, id_b, hamming,
        |  list_sum(list_transform(range(0,64), t -> a.v[t+1]*b.v[t+1]))
        |   / (sqrt(list_sum(list_transform(range(0,64), t -> a.v[t+1]*a.v[t+1])))
        |    * sqrt(list_sum(list_transform(range(0,64), t -> b.v[t+1]*b.v[t+1])))) AS cosine
        | FROM ham JOIN sig a ON a.id = ham.id_a JOIN sig b ON b.id = ham.id_b)
        |SELECT id_a, id_b, hamming, round(cosine,4) AS cosine FROM pairs
        |WHERE cosine >= 0.9 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    // wide two-word layout: bit packing, word-spanning band extraction,
    // two-word hamming — replayed verbatim
    "dd_srp_wide" ->
      """WITH raw AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |base AS (SELECT id, v FROM raw
        | UNION ALL SELECT id+10000, list_transform(range(0,64), t -> v[t+1] + ((t % 5) - 2) * 0.01) FROM raw WHERE id < 30),
        |bits AS (SELECT id, v, list_transform(range(0,120), b ->
        |  CASE WHEN list_sum(list_transform(range(0,64), t ->
        |    v[t+1] * ((((b*37 + t*11) % 21) - 10) / 10.0))) > 0 THEN 1 ELSE 0 END) AS bt
        | FROM base),
        |sig AS (SELECT id, v,
        |  CAST(list_sum(list_transform(range(0,60), b -> bt[b+1] * CAST(2**b AS BIGINT))) AS BIGINT) AS w0,
        |  CAST(list_sum(list_transform(range(60,120), b -> bt[b+1] * CAST(2**(b-60) AS BIGINT))) AS BIGINT) AS w1
        | FROM bits),
        |bnd AS (SELECT id, w0, w1, z.b AS b,
        |  CASE WHEN z.b < 3 THEN (w0 // (1::BIGINT << CAST(z.b*20 AS INT))) % 1048576
        |       ELSE (w1 // (1::BIGINT << CAST((z.b-3)*20 AS INT))) % 1048576 END AS bv
        | FROM sig, LATERAL (SELECT unnest(range(0, 6)) AS b) z),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.w0 AS a0, a.w1 AS a1, b.w0 AS b0, b.w1 AS b1
        | FROM bnd a JOIN bnd b ON a.b = b.b AND a.bv = b.bv AND a.id < b.id),
        |ham AS (SELECT id_a, id_b, CAST(bit_count(xor(a0,b0)) + bit_count(xor(a1,b1)) AS BIGINT) AS hamming
        | FROM cand WHERE bit_count(xor(a0,b0)) + bit_count(xor(a1,b1)) <= 5),
        |pairs AS (SELECT id_a, id_b, hamming,
        |  list_sum(list_transform(range(0,64), t -> a.v[t+1]*b.v[t+1]))
        |   / (sqrt(list_sum(list_transform(range(0,64), t -> a.v[t+1]*a.v[t+1])))
        |    * sqrt(list_sum(list_transform(range(0,64), t -> b.v[t+1]*b.v[t+1])))) AS cosine
        | FROM ham JOIN sig a ON a.id = ham.id_a JOIN sig b ON b.id = ham.id_b)
        |SELECT id_a, id_b, hamming, round(cosine,4) AS cosine FROM pairs
        |WHERE cosine >= 0.9 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    "pp_clean_pipeline" ->
      """WITH base AS (SELECT doc_id, text, lang FROM documents UNION ALL SELECT doc_id+10000, text, lang FROM documents WHERE doc_id < 50),
        |s AS (SELECT doc_id, text, lang, string_split(trim(text), ' ') AS toks, CAST(length(text) AS DOUBLE) AS nc FROM base),
        |lid AS (SELECT *,
        | len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for'))) AS s_en,
        | len(list_filter(toks, t -> t IN ('der','die','das','und','ist','von','mit','ein','zu','den'))) AS s_de,
        | len(list_filter(toks, t -> t IN ('el','la','los','y','de','un','es','en','que','por'))) AS s_es,
        | len(list_filter(toks, t -> t IN ('le','la','les','et','de','un','est','en','que','pour'))) AS s_fr,
        | len(list_filter(toks, t -> t IN ('de','shi','le','zai','he','you','wo','ta','men','bu'))) AS s_zh
        | FROM s),
        |pred AS (SELECT *, CASE
        | WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
        | WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
        | WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
        | WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
        | WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
        | ELSE 'zh' END AS lang_pred FROM lid),
        |qm AS (SELECT *, CAST(len(toks) AS BIGINT) AS nti,
        | CAST(greatest(length(text), 1) AS BIGINT) AS nci,
        | CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','that','it','for','der','die','das','und','ist','von','mit','ein','zu','den','el','la','los','y','de','un','es','en','que','por','le','les','et','est','pour','shi','zai','he','you','wo','ta','men','bu'))) AS BIGINT) AS si,
        | CAST(length(regexp_replace(text,'[0-9]','','g')) AS BIGINT) AS ldi,
        | CAST(length(regexp_replace(text,'[A-Z]','','g')) AS BIGINT) AS lui
        | FROM pred),
        |q AS (SELECT doc_id, text, lang, lang_pred,
        | CAST(floor(((80*least(nti,50)*nti*nci + 4000*least(4*si,nti)*nci + 1000*ldi*nti + 1000*lui*nti)*2 + nti*nci) / (nti*nci*2.0)) AS DOUBLE) / 10000.0 AS quality
        | FROM qm),
        |f AS (SELECT * FROM q WHERE quality >= 0.5 AND lang_pred = lang),
        |dd AS (SELECT text, lang, lang_pred, quality, min(doc_id) AS doc_id, count(*) AS dup_count
        | FROM f GROUP BY text, lang, lang_pred, quality)
        |SELECT doc_id, lang, lang_pred, quality, dup_count,
        | CAST(len(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
        | CAST(ceil(length(text)/4.0) AS INT) AS est_bpe_tokens
        |FROM dd ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // exact PQ ADC replay: formula codebook book(j,c,t) =
    // ((c*31+t*7+j*13) mod 10)*0.1 - 0.4; codes = argmin squared-L2 with
    // first-occurrence tie-break; score = sum_j dot(q_sub_j, book[j][code_j])
    "s10_pq_adc" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, v, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |    qs.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM qs CROSS JOIN codes),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // nprobe=nlist IVF-PQ == PQ ADC: same oracle as s10
    "s11_ivfpq_exact" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, v, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |    qs.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM qs CROSS JOIN codes),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // factory-string-built IVF8,PQ8x4 with nprobe=nlist + fixed books ==
    // the exhaustive ADC ranking: the SAME oracle as s10/s11 verbatim
    "s13_faiss_factory" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |codes AS (SELECT vec_id, v, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      v[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |    qs.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM qs CROSS JOIN codes),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // flat SQ8: the oracle replays the engine end-to-end — per-dim
    // min/max train over the corpus, 8-bit encode (round half-up, clamp,
    // constant dims -> 0), ADC score qmin + qd·codes, top-k
    "s15_sq8_dense" -> sqOracle(k = 10, qmax = 10),
    // recall measurement: BOTH engines replayed — the pruned candidate
    // (probe top-2 over the c*29+t*13 formula quantizer, member top-10)
    // and the exact brute-force truth top-10 — then the intersection
    // size and the remainder-stripped bp division
    "s31_recall_eval" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 20),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 2),
        |isc AS (SELECT pr.qid, cd.vec_id AS idx, list_dot_product(pr.qv, cd.v) AS score FROM pr JOIN cd ON pr.cid = cd.cid),
        |irk AS (SELECT qid, idx, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM isc),
        |ci AS (SELECT qid, list(idx ORDER BY r) AS cl FROM irk WHERE r <= 10 GROUP BY qid),
        |bsc AS (SELECT qs.qid, e.vec_id AS idx, list_dot_product(qs.qv, e.v) AS score FROM qs CROSS JOIN emb e),
        |brk AS (SELECT qid, idx, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM bsc),
        |ti AS (SELECT qid, list(idx ORDER BY r) AS tl FROM brk WHERE r <= 10 GROUP BY qid),
        |j AS (SELECT ci.qid, len(list_intersect(ci.cl, ti.tl)) AS hits, len(ti.tl) AS tk FROM ci JOIN ti USING (qid))
        |SELECT qid, CAST(hits AS INT) AS hits, CAST(tk AS INT) AS truth_k,
        | CAST(CASE WHEN tk > 0 THEN (hits*10000) // tk ELSE 10000 END AS INT) AS recall_bp
        |FROM j ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "hits" -> "", "truth_k" -> "", "recall_bp" -> ""),
    // incremental SQ add: stats trained on the base two thirds only;
    // the full-corpus encode against those pinned stats (saturating
    // clamp on out-of-range added components) must match the engine
    "s30_sq_add" -> sqOracle(k = 10, qmax = 10,
      trainWhere = "vec_id % 3 <> 0"),
    // IVF8,SQ8 with nprobe = nlist: candidate set is total, so the SAME
    // flat-SQ replay is exact (KMeans only picks list assignment)
    "s16_ivf_sq8" -> sqOracle(k = 8, qmax = 8),
    // LSH retrieval: replay the SRP signature formula (shared with
    // dd_srp_cosine), 6 bands of 8 bits, candidates = shared-bucket rows,
    // exact dot, top-10 with idx tie-break — no padding (the gate drops it)
    "s17_lsh_dense" ->
      scl("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |sig AS (SELECT vec_id,
        | list_sum(list_transform(range(0,48), b ->
        |  CASE WHEN list_sum(list_transform(range(1, length(ev)+1), t ->
        |    ev[t] * ((((b*37 + (t-1)*11) % 21) - 10) / 10.0))) > 0
        |  THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS sg FROM v),
        |bnd AS (SELECT vec_id, z.b AS b,
        |  (CAST(sg AS BIGINT) // (1::BIGINT << CAST(z.b*8 AS INT))) % 256 AS bv
        | FROM sig, LATERAL (SELECT unnest(range(0, 6)) AS b) z),
        |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS idx
        | FROM bnd q JOIN bnd c ON q.b = c.b AND q.bv = c.bv WHERE q.vec_id < 10),
        |sc AS (SELECT cand.qid, cand.idx, list_dot_product(a.ev, b.ev) AS score
        | FROM cand JOIN v a ON a.vec_id = cand.qid JOIN v b ON b.vec_id = cand.idx),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // multi-probe twin of s17: the query-side bucket set per band is
    // {bv, bv^1, bv^2} (probes=2, flipping band-hash bits 0 and 1)
    "s24_lsh_multiprobe" ->
      scl("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |sig AS (SELECT vec_id,
        | list_sum(list_transform(range(0,48), b ->
        |  CASE WHEN list_sum(list_transform(range(1, length(ev)+1), t ->
        |    ev[t] * ((((b*37 + (t-1)*11) % 21) - 10) / 10.0))) > 0
        |  THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS sg FROM v),
        |bnd AS (SELECT vec_id, z.b AS b,
        |  (CAST(sg AS BIGINT) // (1::BIGINT << CAST(z.b*8 AS INT))) % 256 AS bv
        | FROM sig, LATERAL (SELECT unnest(range(0, 6)) AS b) z),
        |qb AS (SELECT vec_id, b, unnest([bv, xor(bv, 1), xor(bv, 2)]) AS bv FROM bnd WHERE vec_id < 10),
        |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS idx
        | FROM qb q JOIN bnd c ON q.b = c.b AND q.bv = c.bv),
        |sc AS (SELECT cand.qid, cand.idx, list_dot_product(a.ev, b.ev) AS score
        | FROM cand JOIN v a ON a.vec_id = cand.qid JOIN v b ON b.vec_id = cand.idx),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // BM25(k=100) -> dense(k=3) cascade: replay bm25 top-100 (rounded, the
    // engine's roundScores), dense exact top-3, then the offset-merge —
    // merged = coalesce(bm, min_bm) + coalesce(dense, min_dense) over the
    // index union (algebraically identical to the engine's shift/sum/
    // unshift) — ranked desc with idx tie-break, cut to 3
    "s14_lexical_dense_cascade" ->
      scl("""WITH corp AS (SELECT d.doc_id AS idx, d.text, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |c AS (SELECT idx, string_split(trim(text), ' ') AS toks FROM corp),
        |dl AS (SELECT idx, len(toks) AS len FROM c),
        |post AS (SELECT idx, term, count(*) AS tf FROM (SELECT idx, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT idx) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT idx AS qid, toks[1:5] AS qtoks FROM c WHERE idx < 10),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |bm_sc AS (SELECT qt.qid, post.idx AS idx,
        |  round(sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ),4) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.idx = dl.idx CROSS JOIN tot GROUP BY 1,2),
        |bm AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM bm_sc) WHERE r <= 100),
        |qv AS (SELECT idx AS qid, v AS qv FROM corp WHERE idx < 10),
        |de_sc AS (SELECT qv.qid, corp.idx, list_dot_product(qv.qv, corp.v) AS score FROM qv CROSS JOIN corp),
        |de AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM de_sc) WHERE r <= 3),
        |mn AS (SELECT qid, min(score) AS minb FROM bm GROUP BY 1),
        |md AS (SELECT qid, min(score) AS mind FROM de GROUP BY 1),
        |u AS (SELECT coalesce(b.qid, d2.qid) AS qid, coalesce(b.idx, d2.idx) AS idx, b.score AS bs, d2.score AS ds
        |  FROM bm b FULL OUTER JOIN de d2 ON b.qid = d2.qid AND b.idx = d2.idx),
        |mg AS (SELECT u.qid, u.idx, coalesce(u.bs, mn.minb) + coalesce(u.ds, md.mind) AS score
        |  FROM u JOIN mn ON u.qid = mn.qid JOIN md ON u.qid = md.qid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM mg)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 3 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // BM25(k=20) -> SQ8(k=5) merge-cascade over the joined corpus: replay
    // bm25 top-20 (rounded), SQ8 train/encode/ADC top-5 (the s15 formulas
    // but trained on the JOINED corpus), then the same offset-merge
    // algebra as s14 — coalesce(bm, min_bm) + coalesce(sq, min_sq)
    "s18_bm25_sq_cascade" ->
      scl("""WITH corp AS (SELECT d.doc_id AS idx, d.text, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |c AS (SELECT idx, string_split(trim(text), ' ') AS toks FROM corp),
        |dl AS (SELECT idx, len(toks) AS len FROM c),
        |post AS (SELECT idx, term, count(*) AS tf FROM (SELECT idx, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT idx) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |qq AS (SELECT idx AS qid, toks[1:5] AS qtoks FROM c WHERE idx < 10),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM qq),
        |bm_sc AS (SELECT qt.qid, post.idx AS idx,
        |  round(sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ),4) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.idx = dl.idx CROSS JOIN tot GROUP BY 1,2),
        |bm AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM bm_sc) WHERE r <= 20),
        |dd AS (SELECT generate_subscripts(v, 1) AS p, unnest(v) AS x FROM corp),
        |st AS (SELECT p, min(x) AS mn, max(x) - min(x) AS df FROM dd GROUP BY p),
        |stl AS (SELECT list(mn ORDER BY p) AS vmin, list(df ORDER BY p) AS vdiff FROM st),
        |cd AS (SELECT idx, list_transform(range(1, length(v)+1), i -> CASE WHEN vdiff[i] <= 0 THEN CAST(0 AS DOUBLE) ELSE least(greatest(round((v[i]-vmin[i])/vdiff[i]*255, 0), 0), 255) END) AS codes FROM corp, stl),
        |qv AS (SELECT idx AS qid, list_dot_product(v, vmin) AS qmin, list_transform(range(1, length(v)+1), i -> v[i]*vdiff[i]/255) AS qd FROM corp, stl WHERE idx < 10),
        |de_sc AS (SELECT qv.qid, cd.idx, qv.qmin + list_dot_product(qv.qd, cd.codes) AS score FROM qv CROSS JOIN cd),
        |de AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM de_sc) WHERE r <= 5),
        |mn AS (SELECT qid, min(score) AS minb FROM bm GROUP BY 1),
        |md AS (SELECT qid, min(score) AS mind FROM de GROUP BY 1),
        |u AS (SELECT coalesce(b.qid, d2.qid) AS qid, coalesce(b.idx, d2.idx) AS idx, b.score AS bs, d2.score AS ds
        |  FROM bm b FULL OUTER JOIN de d2 ON b.qid = d2.qid AND b.idx = d2.idx),
        |mg AS (SELECT u.qid, u.idx, coalesce(u.bs, mn.minb) + coalesce(u.ds, md.mind) AS score
        |  FROM u JOIN mn ON u.qid = mn.qid JOIN md ON u.qid = md.qid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM mg)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 5 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // RRF: both rankings replayed rank-for-rank (BM25 ranks on the
    // 4-rounded score exactly as the engine does; dense on the raw dot),
    // fused = sum(1/(60+r)) over the engines that returned the candidate
    "s19_rrf_fusion" ->
      scl("""WITH corp AS (SELECT d.doc_id AS idx, d.text, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |c AS (SELECT idx, string_split(trim(text), ' ') AS toks FROM corp),
        |dl AS (SELECT idx, len(toks) AS len FROM c),
        |post AS (SELECT idx, term, count(*) AS tf FROM (SELECT idx, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT idx) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |qq AS (SELECT idx AS qid, toks[1:5] AS qtoks FROM c WHERE idx < 10),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM qq),
        |bm_sc AS (SELECT qt.qid, post.idx AS idx,
        |  round(sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ),4) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.idx = dl.idx CROSS JOIN tot GROUP BY 1,2),
        |br AS (SELECT qid, idx, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM bm_sc),
        |qv AS (SELECT idx AS qid, v AS qv FROM corp WHERE idx < 10),
        |de_sc AS (SELECT qv.qid, c2.idx, list_dot_product(qv.qv, c2.v) AS score FROM qv CROSS JOIN corp c2),
        |dr AS (SELECT qid, idx, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM de_sc),
        |fu AS (SELECT qid, idx, sum(1.0/(60+r)) AS score FROM (
        |  SELECT qid, idx, r FROM br WHERE r <= 20 UNION ALL SELECT qid, idx, r FROM dr WHERE r <= 20) GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM fu),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,6) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // incremental merge == full rebuild (disjoint halves), so the oracle
    // is the identical full-corpus BM25 replay as s3
    "s21_bm25_incremental" ->
      scl("""WITH c AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s22_jaccard_search" ->
      scl("""WITH c AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s FROM c),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |q0 AS (SELECT doc_id AS qid, array_to_string(toks[1:8], ' ') AS qtext FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, qtext, string_split(trim(qtext), ' ') AS toks FROM q0),
        |qsh AS (SELECT qid, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [qtext] END) AS s FROM qt),
        |qsz AS (SELECT qid, len(s) AS qn FROM qsh),
        |qinv AS (SELECT qid, unnest(s) AS g FROM qsh),
        |shr AS (SELECT qid, inv.doc_id AS idx, count(*) AS shd FROM qinv JOIN inv USING (g) GROUP BY 1, 2),
        |sc AS (SELECT shr.qid, shr.idx, round(shd::DOUBLE / (qsz.qn + szs.n - shd)::DOUBLE, 4) AS score
        | FROM shr JOIN qsz USING (qid) JOIN szs ON szs.doc_id = shr.idx),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(score ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // weighted fusion: both rankings replayed, each normalized min-max
    // WITHIN its returned top-20 list, fused 0.7/0.3
    "s23_weighted_fusion" ->
      scl("""WITH corp AS (SELECT d.doc_id AS idx, d.text, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |c AS (SELECT idx, string_split(trim(text), ' ') AS toks FROM corp),
        |dl AS (SELECT idx, len(toks) AS len FROM c),
        |post AS (SELECT idx, term, count(*) AS tf FROM (SELECT idx, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT idx) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |qq AS (SELECT idx AS qid, toks[1:5] AS qtoks FROM c WHERE idx < 10),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM qq),
        |bm_sc AS (SELECT qt.qid, post.idx AS idx,
        |  round(sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ),4) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.idx = dl.idx CROSS JOIN tot GROUP BY 1,2),
        |bm AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM bm_sc) WHERE r <= 20),
        |bmn AS (SELECT qid, min(score) AS mn, max(score) AS mx FROM bm GROUP BY 1),
        |bc AS (SELECT bm.qid, bm.idx,
        |  0.7 * (CASE WHEN bmn.mx > bmn.mn THEN (bm.score - bmn.mn)/(bmn.mx - bmn.mn) ELSE 1.0 END) AS score
        |  FROM bm JOIN bmn USING (qid)),
        |qv AS (SELECT idx AS qid, v AS qv FROM corp WHERE idx < 10),
        |de_sc AS (SELECT qv.qid, c2.idx, list_dot_product(qv.qv, c2.v) AS score FROM qv CROSS JOIN corp c2),
        |de AS (SELECT qid, idx, score FROM (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM de_sc) WHERE r <= 20),
        |dmn AS (SELECT qid, min(score) AS mn, max(score) AS mx FROM de GROUP BY 1),
        |dc AS (SELECT de.qid, de.idx,
        |  0.3 * (CASE WHEN dmn.mx > dmn.mn THEN (de.score - dmn.mn)/(dmn.mx - dmn.mn) ELSE 1.0 END) AS score
        |  FROM de JOIN dmn USING (qid)),
        |fu AS (SELECT qid, idx, sum(score) AS score FROM (
        |  SELECT * FROM bc UNION ALL SELECT * FROM dc) GROUP BY 1, 2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM fu),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,6) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "dd_keep_best" ->
      """WITH RECURSIVE planted AS (SELECT doc_id, text FROM documents UNION ALL
        | SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
        | FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM planted)),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b
        | FROM cand JOIN szs sa ON sa.doc_id = cand.id_a JOIN szs sb ON sb.doc_id = cand.id_b
        | WHERE shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(u, v) AS (SELECT u, v FROM edges UNION SELECT u, u FROM edges
        | UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cc AS (SELECT u AS id, min(v) AS cluster FROM reach GROUP BY u),
        |scored AS (SELECT p.doc_id AS id, coalesce(cc.cluster, p.doc_id) AS cluster,
        |  len(string_split(p.text, ' ')) AS score
        | FROM planted p LEFT JOIN cc ON p.doc_id = cc.id),
        |rk AS (SELECT id, cluster, score, row_number() OVER (PARTITION BY cluster ORDER BY score DESC, id) AS r FROM scored)
        |SELECT id AS doc_id, cluster, (r = 1) AS kept FROM rk ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "sp_split" ->
      """WITH h AS (SELECT doc_id, (doc_id*131 + 11) % 1000003 AS s1 FROM documents),
        |s AS (SELECT doc_id, (s1*s1 + s1) % 1000003 AS slot FROM h)
        |SELECT doc_id, CASE WHEN slot < 800002 THEN 'train'
        | WHEN slot < 900002 THEN 'val' ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "sp_split_leakfree" ->
      """WITH RECURSIVE planted AS (SELECT doc_id, text FROM documents UNION ALL
        | SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
        | FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM planted)),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b
        | FROM cand JOIN szs sa ON sa.doc_id = cand.id_a JOIN szs sb ON sb.doc_id = cand.id_b
        | WHERE shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(u, v) AS (SELECT u, v FROM edges UNION SELECT u, u FROM edges
        | UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cc AS (SELECT u AS id, min(v) AS cluster FROM reach GROUP BY u),
        |wc AS (SELECT p.doc_id, coalesce(cc.cluster, p.doc_id) AS cluster
        | FROM planted p LEFT JOIN cc ON p.doc_id = cc.id),
        |h AS (SELECT doc_id, cluster, (cluster*131 + 11) % 1000003 AS s1 FROM wc),
        |s AS (SELECT doc_id, cluster, (s1*s1 + s1) % 1000003 AS slot FROM h)
        |SELECT doc_id, cluster, CASE WHEN slot < 800002 THEN 'train'
        | WHEN slot < 900002 THEN 'val' ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "qa_quantiles" ->
      """SELECT lang, count(*) AS n,
        |round(quantile_cont(len(string_split(text, ' ')), 0.5), 4) AS p50,
        |round(quantile_cont(len(string_split(text, ' ')), 0.9), 4) AS p90,
        |round(quantile_cont(len(string_split(text, ' ')), 0.99), 4) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " "),
    "pr_profile" ->
      """WITH t AS (SELECT * FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, count(*) AS n_rows, count(*)-count(l_orderkey) AS n_null,
        |  count(DISTINCT l_orderkey) AS n_distinct, CAST(min(l_orderkey) AS VARCHAR) AS min_s, CAST(max(l_orderkey) AS VARCHAR) AS max_s FROM t
        |UNION ALL SELECT 'l_linenumber', count(*), count(*)-count(l_linenumber),
        |  count(DISTINCT l_linenumber), CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR) FROM t
        |UNION ALL SELECT 'l_returnflag', count(*), count(*)-count(l_returnflag),
        |  count(DISTINCT l_returnflag), CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR) FROM t
        |UNION ALL SELECT 'l_linestatus', count(*), count(*)-count(l_linestatus),
        |  count(DISTINCT l_linestatus), CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR) FROM t
        |ORDER BY col_name""".stripMargin.replace("\n", " "),
    // HLL twin: deterministic stats exact, the estimate via a sanity band
    "pr_profile_approx" ->
      """WITH t AS (SELECT * FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, count(*) AS n_rows, count(*)-count(l_orderkey) AS n_null,
        |  true AS nd_sane, CAST(min(l_orderkey) AS VARCHAR) AS min_s, CAST(max(l_orderkey) AS VARCHAR) AS max_s FROM t
        |UNION ALL SELECT 'l_linenumber', count(*), count(*)-count(l_linenumber),
        |  true, CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR) FROM t
        |UNION ALL SELECT 'l_returnflag', count(*), count(*)-count(l_returnflag),
        |  true, CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR) FROM t
        |UNION ALL SELECT 'l_linestatus', count(*), count(*)-count(l_linestatus),
        |  true, CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR) FROM t
        |ORDER BY col_name""".stripMargin.replace("\n", " "),
    // MaxSim: dense recall ranks replayed, then every max/sum term of the
    // late-interaction score over the shift-synthesized multi-vectors
    "s20_maxsim_rerank" ->
      scl("""WITH corp AS (SELECT vec_id AS idx, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mv AS (SELECT idx, [v, v[2:] || v[1:1], v[3:] || v[1:2]] AS dvs FROM corp),
        |qs AS (SELECT idx AS qid, v AS qv, [v, v[2:] || v[1:1]] AS qvs FROM corp WHERE idx < 10),
        |de_sc AS (SELECT qs.qid, c.idx, list_dot_product(qs.qv, c.v) AS score FROM qs CROSS JOIN corp c),
        |dr AS (SELECT qid, idx FROM (SELECT qid, idx, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM de_sc) WHERE r <= 20),
        |ms AS (SELECT dr.qid, dr.idx, round(list_sum(list_transform(q2.qvs, qv -> list_max(list_transform(mv.dvs, dv -> list_dot_product(qv, dv))))), 4) AS score
        |  FROM dr JOIN mv ON dr.idx = mv.idx JOIN qs q2 ON dr.qid = q2.qid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM ms),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(score ORDER BY r) AS ls FROM rk WHERE r <= 5 GROUP BY qid)
        |SELECT qid, li || list_transform(range(5 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(5 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "zo_zorder" ->
      """SELECT o_orderkey, CAST(list_sum(list_transform(range(8), j ->
        |  (((o_custkey % 256) >> j) & 1) * (CAST(1 AS BIGINT) << (2*j)) +
        |  (((o_orderkey % 256) >> j) & 1) * (CAST(1 AS BIGINT) << (2*j+1)))) AS BIGINT) AS zval
        |FROM orders ORDER BY zval, o_orderkey""".stripMargin.replace("\n", " "),
    "zo_zvalue_sql" ->
      """SELECT o_orderkey, CAST(list_sum(list_transform(range(8), j ->
        |  (((o_custkey % 256) >> j) & 1) * (CAST(1 AS BIGINT) << (2*j)) +
        |  (((o_orderkey % 256) >> j) & 1) * (CAST(1 AS BIGINT) << (2*j+1)))) AS BIGINT) AS zval
        |FROM orders ORDER BY zval, o_orderkey""".stripMargin.replace("\n", " "),
    "mg_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |ch AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, true FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, false FROM base WHERE o_orderkey%11=2),
        |kept AS (SELECT b.* FROM base b LEFT JOIN (SELECT DISTINCT o_orderkey AS ck FROM ch) c ON b.o_orderkey = c.ck WHERE c.ck IS NULL)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM kept
        |UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM ch WHERE NOT del
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // two sequential MERGEs = the two streamed micro-batches of
    // mg_upsert_stream; b1 deletes half of b0's inserts and updates the
    // other half, so the CTE order is load-bearing
    "mg_upsert_stream" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders),
        |b0 AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, false FROM base WHERE o_orderkey%11=2),
        |m1 AS (SELECT b.* FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM b0)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b0 WHERE NOT del),
        |b1 AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, true AS del FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, o_orderstatus, o_totalprice, true FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=0
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'X', o_totalprice + 5.0, false FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=1),
        |m2 AS (SELECT m.* FROM m1 m WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM b1)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b1 WHERE NOT del)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM m2
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // additive evolution: kept base rows carry NULL quality
    "mg_upsert_evolve" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |ch AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, (o_orderkey%100) / 100.0 AS quality, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 0.0, true FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, 1.0, false FROM base WHERE o_orderkey%11=2),
        |kept AS (SELECT b.* FROM base b LEFT JOIN (SELECT DISTINCT o_orderkey AS ck FROM ch) c ON b.o_orderkey = c.ck WHERE c.ck IS NULL)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, CAST(NULL AS DOUBLE) AS quality FROM kept
        |UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, quality FROM ch WHERE NOT del
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // the classified endpoint diff of the same merge replay
    "mg_version_diff" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders),
        |b0 AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, false FROM base WHERE o_orderkey%11=2),
        |m1 AS (SELECT b.* FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM b0)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b0 WHERE NOT del),
        |b1 AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, true AS del FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, o_orderstatus, o_totalprice, true FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=0
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'X', o_totalprice + 5.0, false FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=1),
        |m2 AS (SELECT m.* FROM m1 m WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM b1)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b1 WHERE NOT del)
        |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        | CASE WHEN a.o_orderkey IS NULL THEN 'insert' WHEN b.o_orderkey IS NULL THEN 'delete' ELSE 'update' END AS change,
        | a.o_orderstatus AS o_orderstatus_before, b.o_orderstatus AS o_orderstatus_after,
        | a.o_totalprice AS o_totalprice_before, b.o_totalprice AS o_totalprice_after
        |FROM base a FULL OUTER JOIN m2 b ON a.o_orderkey = b.o_orderkey
        |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
        | OR a.o_custkey IS DISTINCT FROM b.o_custkey
        | OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        | OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // the partitioned layout's manifest-reconstructed endpoints must
    // diff exactly like the flat layout's: identical change batches,
    // identical merge-replay + IS DISTINCT FROM oracle
    "mg_version_diff_partitioned" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders),
        |b0 AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, false FROM base WHERE o_orderkey%11=2),
        |m1 AS (SELECT b.* FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM b0)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b0 WHERE NOT del),
        |b1 AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, true AS del FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, o_orderstatus, o_totalprice, true FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=0
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'X', o_totalprice + 5.0, false FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=1),
        |m2 AS (SELECT m.* FROM m1 m WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM b1)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b1 WHERE NOT del)
        |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        | CASE WHEN a.o_orderkey IS NULL THEN 'insert' WHEN b.o_orderkey IS NULL THEN 'delete' ELSE 'update' END AS change,
        | a.o_orderstatus AS o_orderstatus_before, b.o_orderstatus AS o_orderstatus_after,
        | a.o_totalprice AS o_totalprice_before, b.o_totalprice AS o_totalprice_after
        |FROM base a FULL OUTER JOIN m2 b ON a.o_orderkey = b.o_orderkey
        |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
        | OR a.o_custkey IS DISTINCT FROM b.o_custkey
        | OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        | OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // the key-partitioned layout must be INVISIBLE to the merged result:
    // identical change batches, identical sequential-MERGE oracle
    "mg_upsert_partitioned" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders),
        |b0 AS (
        | SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, false AS del
        |   FROM base WHERE o_orderkey%7=3 AND o_orderkey%13<>5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'N', o_totalprice, false FROM base WHERE o_orderkey%11=2),
        |m1 AS (SELECT b.* FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM b0)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b0 WHERE NOT del),
        |b1 AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, true AS del FROM base WHERE o_orderkey%13=5
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, o_orderstatus, o_totalprice, true FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=0
        | UNION ALL SELECT o_orderkey+100000000, o_custkey, 'X', o_totalprice + 5.0, false FROM base WHERE o_orderkey%11=2 AND o_orderkey%2=1),
        |m2 AS (SELECT m.* FROM m1 m WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM b1)
        | UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM b1 WHERE NOT del)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM m2
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " "),
    // residual IVF-PQ: cid = argmin-L2 over formula centroids; codes =
    // argmin-L2 over formula books of rv = v - centroid[cid]; score =
    // q·centroid + ADC(q, codes) — every term replayed
    // pruned IVF replay over the union: argmin-L2 formula tagging, top-4
    // probe pruning (dot vs each formula centroid, ties by cid), member
    // top-k — incremental add must equal this bit for bit
    "s25_ivf_add" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, cd.vec_id AS idx, list_dot_product(pr.qv, cd.v) AS score FROM pr JOIN cd ON pr.cid = cd.cid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // the recall-drift loop replayed END TO END: brute truth over
    // base+drift, BOTH partial-probe evaluations (pinned formula A =
    // c*29+t*13; rebalanced formula B = c*31+t*7 with centroids 4-7
    // shifted +10 onto the drifted mass), and the RecallEval integer
    // arithmetic hits·10⁴ div truth_k — the recovery number itself is
    // under the oracle. Drift = float(x+10f), bit-identical both sides.
    "s41_recall_drift" ->
      """WITH corp AS (SELECT vec_id AS idx, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        | UNION ALL SELECT vec_id + 100000000, CAST(list_transform(embedding, x -> x + CAST(10 AS FLOAT)) AS DOUBLE[]) FROM embeddings),
        |qs AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |tr AS (SELECT qid, idx FROM (
        |  SELECT qs.qid, corp.idx, row_number() OVER (PARTITION BY qs.qid ORDER BY list_dot_product(qs.qv, corp.v) DESC, corp.idx) AS r
        |  FROM qs CROSS JOIN corp) WHERE r <= 10),
        |tk AS (SELECT qid, count(*) AS tn FROM tr GROUP BY qid),
        |cda AS (SELECT idx, v, list_position(ds, list_min(ds)) - 1 AS cid FROM (
        |  SELECT idx, v, list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))) AS ds FROM corp)),
        |pra AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 2),
        |caa AS (SELECT qid, idx FROM (
        |  SELECT pra.qid, cda.idx, row_number() OVER (PARTITION BY pra.qid ORDER BY list_dot_product(pra.qv, cda.v) DESC, cda.idx) AS r
        |  FROM pra JOIN cda ON pra.cid = cda.cid) WHERE r <= 10),
        |hba AS (SELECT caa.qid, count(tr.idx) AS hits FROM caa LEFT JOIN tr ON caa.qid = tr.qid AND caa.idx = tr.idx GROUP BY caa.qid),
        |cdb AS (SELECT idx, v, list_position(ds, list_min(ds)) - 1 AS cid FROM (
        |  SELECT idx, v, list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - ((((c*31 + t*7) % 17) - 8) * 0.05 + CASE WHEN c >= 4 THEN 10 ELSE 0 END)) * (v[t+1] - ((((c*31 + t*7) % 17) - 8) * 0.05 + CASE WHEN c >= 4 THEN 10 ELSE 0 END))))) AS ds FROM corp)),
        |prb AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*31 + t*7) % 17) - 8) * 0.05 + CASE WHEN cc.c >= 4 THEN 10 ELSE 0 END))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 2),
        |cab AS (SELECT qid, idx FROM (
        |  SELECT prb.qid, cdb.idx, row_number() OVER (PARTITION BY prb.qid ORDER BY list_dot_product(prb.qv, cdb.v) DESC, cdb.idx) AS r
        |  FROM prb JOIN cdb ON prb.cid = cdb.cid) WHERE r <= 10),
        |hbb AS (SELECT cab.qid, count(tr.idx) AS hits FROM cab LEFT JOIN tr ON cab.qid = tr.qid AND cab.idx = tr.idx GROUP BY cab.qid)
        |SELECT tk.qid, (coalesce(hba.hits, 0) * 10000) // tk.tn AS before_bp,
        | (coalesce(hbb.hits, 0) * 10000) // tk.tn AS after_bp
        |FROM tk LEFT JOIN hba ON tk.qid = hba.qid LEFT JOIN hbb ON tk.qid = hbb.qid
        |ORDER BY tk.qid""".stripMargin.replace("\n", " "),
    // post-rebalance search == the replay over the NEW quantizer formula
    // (c*31 + t*7): tagging, probe pruning, and member top-k over the
    // FULL corpus — the pre-rebalance (c*29 + t*13) lists must be gone
    "s27_ivf_rebalance" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05) * (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05) * (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*31 + t*7) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, cd.vec_id AS idx, list_dot_product(pr.qv, cd.v) AS score FROM pr JOIN cd ON pr.cid = cd.cid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-rebalance IVF-PQ == the full replay over the NEW coarse
    // formula (c*31 + t*7): re-tag, residual RE-ENCODE (rv and the ADC
    // coarse term both use the new centroids; codebooks unchanged),
    // probe pruning at nprobe=4, ADC top-k — the pre-rebalance
    // (c*29 + t*13) tags/codes must be gone for this to hash-match
    "s28_ivfpq_rebalance" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05) * (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05) * (v[t+1] - (((c*31 + t*7) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |res AS (SELECT vec_id, cid, list_transform(range(0,64), t -> v[t+1] - (((cid*31 + t*7) % 17) - 8) * 0.05) AS rv FROM cd),
        |codes AS (SELECT vec_id, cid, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM res),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*31 + t*7) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,64), t -> pr.qv[t+1] * ((((codes.cid*31 + t*7) % 17) - 8) * 0.05)))
        |  + list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |      pr.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM pr JOIN codes ON pr.cid = codes.cid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-delete IVF == the replay over ONLY the surviving rows
    // (vec_id % 5 <> 2): the removed rows' tags must be gone — queries
    // still come from the full table (deleted docs can still query)
    "s34_ivf_remove" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb WHERE vec_id % 5 <> 2),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, cd.vec_id AS idx, list_dot_product(pr.qv, cd.v) AS score FROM pr JOIN cd ON pr.cid = cd.cid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-delete residual IVF-PQ == the s12 replay over ONLY the
    // surviving rows: stale tags AND orphan codes both hash-fail
    "s35_ivfpq_remove" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb WHERE vec_id % 5 <> 2),
        |res AS (SELECT vec_id, cid, list_transform(range(0,64), t -> v[t+1] - (((cid*29 + t*13) % 17) - 8) * 0.05) AS rv FROM cd),
        |codes AS (SELECT vec_id, cid, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM res),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,64), t -> pr.qv[t+1] * ((((codes.cid*29 + t*13) % 17) - 8) * 0.05)))
        |  + list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |      pr.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM pr JOIN codes ON pr.cid = codes.cid),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-delete BM25 == the full rebuild replay over the surviving
    // docs (doc_id % 5 <> 2): df, n, avgdl all shift with the deletion;
    // queries still come from the full table
    "s36_bm25_remove" ->
      scl("""WITH call AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks FROM call WHERE doc_id % 5 <> 2),
        |dl AS (SELECT doc_id, len(toks) AS len FROM c),
        |post AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(toks) AS term FROM c) GROUP BY 1,2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY 1),
        |tot AS (SELECT count(*) AS n, avg(len) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS qid, toks[1:5] AS qtoks FROM call WHERE doc_id < 20),
        |qt AS (SELECT qid, unnest(qtoks) AS term FROM q),
        |sc AS (SELECT qt.qid, post.doc_id AS idx,
        |  sum( ln(1 + (tot.n - dfq.df + 0.5)/(dfq.df + 0.5)) * (post.tf*2.2)/(post.tf + 1.2*(0.25 + 0.75*dl.len/tot.avgdl)) ) AS score
        |  FROM qt JOIN post USING(term) JOIN dfq USING(term) JOIN dl ON post.doc_id = dl.doc_id CROSS JOIN tot GROUP BY 1,2),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY round(score,4) DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(round(score,4) ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-delete SQ8 == full train + encode replayed, scored over ONLY
    // the survivors (vec_id % 5 <> 2): stats stay pinned to the full
    // train, so a survivors-trained replay would hash-fail too
    "s37_sq_remove" -> sqOracle(k = 10, qmax = 10,
      scoreWhere = "cd.vec_id % 5 <> 2"),
    // post-delete IVF8,SQ8 at nprobe = nlist: candidate set is total, so
    // the same survivor-scored flat-SQ replay is exact (KMeans only
    // picks list assignment); stale tags or orphan codes add candidates
    "s38_ivfsq_remove" -> sqOracle(k = 8, qmax = 8,
      scoreWhere = "cd.vec_id % 5 <> 2"),
    // post-delete LSH == the s17 sign/band/score replay with the
    // CANDIDATE side restricted to survivors; queries from the full table
    "s39_lsh_remove" ->
      scl("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |sig AS (SELECT vec_id,
        | list_sum(list_transform(range(0,48), b ->
        |  CASE WHEN list_sum(list_transform(range(1, length(ev)+1), t ->
        |    ev[t] * ((((b*37 + (t-1)*11) % 21) - 10) / 10.0))) > 0
        |  THEN CAST(2**b AS BIGINT) ELSE 0 END)) AS sg FROM v),
        |bnd AS (SELECT vec_id, z.b AS b,
        |  (CAST(sg AS BIGINT) // (1::BIGINT << CAST(z.b*8 AS INT))) % 256 AS bv
        | FROM sig, LATERAL (SELECT unnest(range(0, 6)) AS b) z),
        |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS idx
        | FROM bnd q JOIN bnd c ON q.b = c.b AND q.bv = c.bv
        | WHERE q.vec_id < 10 AND c.vec_id % 5 <> 2),
        |sc AS (SELECT cand.qid, cand.idx, list_dot_product(a.ev, b.ev) AS score
        | FROM cand JOIN v a ON a.vec_id = cand.qid JOIN v b ON b.vec_id = cand.idx),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // post-delete Jaccard == the s22 shingle/join/score replay with the
    // inverted index and sizes restricted to survivors (doc_id % 5 <> 2)
    "s40_jaccard_remove" ->
      scl("""WITH c AS (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s FROM c),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh WHERE doc_id % 5 <> 2),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 5 <> 2),
        |q0 AS (SELECT doc_id AS qid, array_to_string(toks[1:8], ' ') AS qtext FROM c WHERE doc_id < 20),
        |qt AS (SELECT qid, qtext, string_split(trim(qtext), ' ') AS toks FROM q0),
        |qsh AS (SELECT qid, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [qtext] END) AS s FROM qt),
        |qsz AS (SELECT qid, len(s) AS qn FROM qsh),
        |qinv AS (SELECT qid, unnest(s) AS g FROM qsh),
        |shr AS (SELECT qid, inv.doc_id AS idx, count(*) AS shd FROM qinv JOIN inv USING (g) GROUP BY 1, 2),
        |sc AS (SELECT shr.qid, shr.idx, round(shd::DOUBLE / (qsz.qn + szs.n - shd)::DOUBLE, 4) AS score
        | FROM shr JOIN qsz USING (qid) JOIN szs ON szs.doc_id = shr.idx),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc),
        |g AS (SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS li, list(score ORDER BY r) AS ls FROM rk WHERE r <= 10 GROUP BY qid)
        |SELECT qid, li || list_transform(range(10 - len(li)), x -> CAST(-1 AS BIGINT)) AS "index.idx",
        | ls || list_transform(range(10 - len(ls)), x -> CAST('-infinity' AS DOUBLE)) AS "index.score"
        |FROM g ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // filtered IVF: probe pruning (nprobe=4 over the c*29+t*13 formula
    // quantizer) AND the label % 3 = 1 payload predicate both replayed —
    // member top-k over probed ∩ filtered only
    "s29_filtered_ivf" ->
      scl("""WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, label, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |pr AS (SELECT qid, qv, cid FROM (
        |  SELECT qs.qid, qs.qv, cc.c AS cid, row_number() OVER (PARTITION BY qs.qid
        |    ORDER BY list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((cc.c*29 + t*13) % 17) - 8) * 0.05))) DESC, cc.c) AS rn
        |  FROM qs CROSS JOIN (SELECT unnest(range(0,8)) AS c) cc) WHERE rn <= 4),
        |sc AS (SELECT pr.qid, cd.vec_id AS idx, list_dot_product(pr.qv, cd.v) AS score
        | FROM pr JOIN cd ON pr.cid = cd.cid WHERE cd.label % 3 = 1),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // incremental residual IVF-PQ == the s12 build-over-union replay
    "s26_ivfpq_add" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |res AS (SELECT vec_id, cid, list_transform(range(0,64), t -> v[t+1] - (((cid*29 + t*13) % 17) - 8) * 0.05) AS rv FROM cd),
        |codes AS (SELECT vec_id, cid, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM res),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((codes.cid*29 + t*13) % 17) - 8) * 0.05)))
        |  + list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |      qs.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM qs CROSS JOIN codes),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    "s12_ivfpq_residual" ->
      scl("""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cd AS (SELECT vec_id, v, list_position(
        |  list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))),
        |  list_min(list_transform(range(0,8), c -> list_sum(list_transform(range(0,64), t ->
        |    (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05) * (v[t+1] - (((c*29 + t*13) % 17) - 8) * 0.05)))))) - 1 AS cid
        | FROM emb),
        |res AS (SELECT vec_id, cid, list_transform(range(0,64), t -> v[t+1] - (((cid*29 + t*13) % 17) - 8) * 0.05) AS rv FROM cd),
        |codes AS (SELECT vec_id, cid, list_transform(range(0,8), j ->
        |  list_position(
        |    list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))),
        |    list_min(list_transform(range(0,16), c -> list_sum(list_transform(list_transform(range(0,8), t ->
        |      rv[j*8+t+1] - (((c*31 + t*7 + j*13) % 10) * 0.1 - 0.4)), dd -> dd*dd))))) - 1) AS cs
        | FROM res),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 10),
        |sc AS (SELECT qs.qid, codes.vec_id AS idx,
        |  list_sum(list_transform(range(0,64), t -> qs.qv[t+1] * ((((codes.cid*29 + t*13) % 17) - 8) * 0.05)))
        |  + list_sum(list_transform(range(0,8), j -> list_sum(list_transform(range(0,8), t ->
        |      qs.qv[j*8+t+1] * (((cs[j+1]*31 + t*7 + j*13) % 10) * 0.1 - 0.4))))) AS score
        | FROM qs CROSS JOIN codes),
        |rk AS (SELECT qid, idx, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, idx) AS r FROM sc)
        |SELECT qid, list(CAST(idx AS BIGINT) ORDER BY r) AS "index.idx", list(round(score,4) ORDER BY r) AS "index.score"
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin.replace("\n", " "),
        "qid" -> "", "index.idx" -> "i", "index.score" -> "d"),
    // Gopher-style repetition stats: sorted-bigram run lengths replayed as
    // an unnest+group count (identical math, different but equivalent shape)
    "cu_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg FROM tok),
        |c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1,2),
        |s AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS nbg, CAST(max(cnt) AS DOUBLE) AS top,
        |  CAST(coalesce(sum(cnt) FILTER (WHERE cnt>1),0) AS DOUBLE) AS dup FROM c GROUP BY 1)
        |SELECT tok.doc_id,
        | round(1 - len(list_distinct(t))*1.0/len(t), 4) AS dup_token_frac,
        | round(CASE WHEN coalesce(nbg,0) > 0 THEN top/nbg ELSE 0 END, 4) AS top_bigram_frac,
        | round(CASE WHEN coalesce(nbg,0) > 0 THEN dup/nbg ELSE 0 END, 4) AS dup_bigram_frac
        |FROM tok LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "cu_decontaminate" -> decontaminateOracle,
    "cu_overlap_frac" -> overlapFracOracle,
    "ev_stream_overlap_frac" -> overlapFracOracle,
    "cu_bloom_decontam" -> bloomDecontamOracle,
    "ev_stream_bloom_decontam" -> bloomDecontamOracle,
    "ev_stream_decontam" -> decontaminateOracle,
    "cu_pii" ->
      """WITH p AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
        | THEN text || ' contact user' || doc_id || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        | ELSE text END AS t2 FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
        | CAST(len(regexp_extract_all(t2, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ips,
        | regexp_replace(regexp_replace(regexp_replace(t2,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "cu_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id*131+7) % 1000003) % 10000 <
        |  CASE lang WHEN 'en' THEN 3500 WHEN 'de' THEN 8000 ELSE 6000 END
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "vb_vocab_encode" -> scl(
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |ex AS (SELECT doc_id, ln.i, t[ln.i] AS tok FROM tk, LATERAL (SELECT unnest(range(1, len(t)+1)) AS i) ln),
        |cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
        |voc AS (SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) - 1 AS INT) AS id
        |        FROM (SELECT * FROM cnt ORDER BY c DESC, tok LIMIT 25)),
        |enc AS (SELECT ex.doc_id,
        |         list(CAST(coalesce(voc.id, -1) AS BIGINT) ORDER BY ex.i) AS token_ids,
        |         CAST(sum(CASE WHEN voc.id IS NULL THEN 1 ELSE 0 END) AS INT) AS n_oov
        |        FROM ex LEFT JOIN voc USING (tok) GROUP BY ex.doc_id)
        |SELECT doc_id, token_ids, n_oov FROM enc ORDER BY doc_id""".stripMargin.replace("\n", " "),
      "doc_id" -> "", "token_ids" -> "i", "n_oov" -> ""),
    // per-token nll is fixed-point (x1e4 integers): exact order-free sums
    // make the mean bit-identical across engines and partitionings
    "ug_unigram_nll" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tk),
        |v AS (SELECT tok, CAST(round(-ln(count(*) / (SELECT total FROM n)) * 10000) AS BIGINT) AS f FROM tk GROUP BY tok),
        |sc AS (SELECT doc_id, CAST(floor((sum(f)*2 + count(*)) / (count(*) * 2.0)) AS DOUBLE) / 10000.0 AS unigram_nll
        |       FROM tk JOIN v USING (tok) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sc.unigram_nll, 0) AS unigram_nll
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "),
    // the crawl preset replayed stage by stage: planted pages -> indexed
    // first-occurrence line filter -> C4 battery + page floor -> Gopher
    // lexical counts on the cleaned page + floor -> whitespace tokens
    // the streaming twin replays the identical chain
    "ev_stream_crawl" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) || (CASE WHEN doc_id % 13 = 0 THEN '{ cfg }' || chr(10) ELSE '' END) || replace(replace(text, ' fast ', '.' || chr(10)), ' data ', '?' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Enable javascript to proceed now please.' ELSE '' END) AS text
        | FROM documents),
        |i0 AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines0 FROM s),
        |i1 AS (SELECT doc_id, text, len(lines0) AS nl0, list_filter(lines0, (l, i) -> list_position(lines0, l) = i) AS lines1 FROM i0),
        |i2 AS (SELECT doc_id, coalesce(array_to_string(lines1, chr(10)), '') AS text, CAST(nl0 - len(lines1) AS BIGINT) AS n_intra_removed FROM i1),
        |m AS (SELECT doc_id, text, n_intra_removed, string_split(text, chr(10)) AS lines FROM i2),
        |k AS (SELECT doc_id, text, n_intra_removed,
        | list_filter(lines, l -> regexp_matches(rtrim(l, ' ' || chr(9)), '[.!?"”]$') AND length(trim(rtrim(l, ' ' || chr(9)))) > 0 AND len(regexp_split_to_array(trim(rtrim(l, ' ' || chr(9))), '\s+')) >= 5 AND NOT contains(lower(rtrim(l, ' ' || chr(9))), 'javascript')) AS kept
        | FROM m),
        |c AS (SELECT doc_id, text, n_intra_removed, kept, coalesce(array_to_string(kept, chr(10)), '') AS clean FROM k),
        |f AS (SELECT doc_id, n_intra_removed, clean,
        | CAST(len(kept) AS BIGINT) AS kept_lines,
        | CAST(len(regexp_extract_all(clean, '[.!?]+')) AS BIGINT) AS n_sentences,
        | contains(lower(text), 'lorem ipsum') AS fl, contains(text, '{') AS fb
        | FROM c),
        |g AS (SELECT * FROM f WHERE n_sentences >= 3 AND NOT fl AND NOT fb),
        |t AS (SELECT doc_id, n_intra_removed, clean, kept_lines, n_sentences, regexp_split_to_array(trim(clean), '\s+') AS toks FROM g),
        |q AS (SELECT doc_id, n_intra_removed, clean, kept_lines, n_sentences,
        | CAST(len(toks) AS BIGINT) AS n_words,
        | CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        | CAST(len(list_distinct(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','that','it','for')))) AS BIGINT) AS distinct_stopwords,
        | CAST(len(toks) AS INTEGER) AS ws_tokens
        | FROM t)
        |SELECT doc_id, clean AS text, n_intra_removed, kept_lines, n_sentences, alpha_words, distinct_stopwords, ws_tokens
        |FROM q WHERE alpha_words*5 >= n_words*4 AND distinct_stopwords >= 2 ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "pp_crawl_v1" ->
      """WITH s AS (SELECT doc_id,
        | (CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) || (CASE WHEN doc_id % 13 = 0 THEN '{ cfg }' || chr(10) ELSE '' END) || replace(replace(text, ' fast ', '.' || chr(10)), ' data ', '?' || chr(10)) || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Enable javascript to proceed now please.' ELSE '' END) AS text
        | FROM documents),
        |i0 AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines0 FROM s),
        |i1 AS (SELECT doc_id, text, len(lines0) AS nl0, list_filter(lines0, (l, i) -> list_position(lines0, l) = i) AS lines1 FROM i0),
        |i2 AS (SELECT doc_id, coalesce(array_to_string(lines1, chr(10)), '') AS text, CAST(nl0 - len(lines1) AS BIGINT) AS n_intra_removed FROM i1),
        |m AS (SELECT doc_id, text, n_intra_removed, string_split(text, chr(10)) AS lines FROM i2),
        |k AS (SELECT doc_id, text, n_intra_removed,
        | list_filter(lines, l -> regexp_matches(rtrim(l, ' ' || chr(9)), '[.!?"”]$') AND length(trim(rtrim(l, ' ' || chr(9)))) > 0 AND len(regexp_split_to_array(trim(rtrim(l, ' ' || chr(9))), '\s+')) >= 5 AND NOT contains(lower(rtrim(l, ' ' || chr(9))), 'javascript')) AS kept
        | FROM m),
        |c AS (SELECT doc_id, text, n_intra_removed, kept, coalesce(array_to_string(kept, chr(10)), '') AS clean FROM k),
        |f AS (SELECT doc_id, n_intra_removed, clean,
        | CAST(len(kept) AS BIGINT) AS kept_lines,
        | CAST(len(regexp_extract_all(clean, '[.!?]+')) AS BIGINT) AS n_sentences,
        | contains(lower(text), 'lorem ipsum') AS fl, contains(text, '{') AS fb
        | FROM c),
        |g AS (SELECT * FROM f WHERE n_sentences >= 3 AND NOT fl AND NOT fb),
        |t AS (SELECT doc_id, n_intra_removed, clean, kept_lines, n_sentences, regexp_split_to_array(trim(clean), '\s+') AS toks FROM g),
        |q AS (SELECT doc_id, n_intra_removed, clean, kept_lines, n_sentences,
        | CAST(len(toks) AS BIGINT) AS n_words,
        | CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        | CAST(len(list_distinct(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','that','it','for')))) AS BIGINT) AS distinct_stopwords,
        | CAST(len(toks) AS INTEGER) AS ws_tokens
        | FROM t)
        |SELECT doc_id, clean AS text, n_intra_removed, kept_lines, n_sentences, alpha_words, distinct_stopwords, ws_tokens
        |FROM q WHERE alpha_words*5 >= n_words*4 AND distinct_stopwords >= 2 ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // the flagship cascade replayed stage by stage (shared with the
    // streaming twin — identical semantics, one micro-batch)
    "pp_ingest_v1" -> ingestOracle,
    "ev_stream_ingest" -> ingestOracle,
    "pp_curate_v2" ->
      """WITH t AS (SELECT doc_id, lang, regexp_replace(trim(text), '((?:\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g') AS txt FROM documents),
        |l0 AS (SELECT doc_id, lang, string_split(txt, chr(10)) AS ln FROM t),
        |l1 AS (SELECT doc_id, lang, ln, unnest(range(1, len(ln)+1)) AS i FROM l0),
        |l2 AS (SELECT doc_id, lang, i, ln[i] AS line FROM l1),
        |c AS (SELECT line, count(*) AS cnt FROM l2 GROUP BY 1),
        |cleaned AS (SELECT l2.doc_id, any_value(l2.lang) AS lang,
        |        coalesce(string_agg(CASE WHEN c.cnt <= 1 THEN l2.line END, chr(10) ORDER BY l2.i), '') AS text,
        |        CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
        |      FROM l2 JOIN c USING (line) GROUP BY l2.doc_id),
        |tok AS (SELECT *, string_split_regex(trim(text), '\s+') AS t2 FROM cleaned),
        |rep AS (SELECT doc_id, lang, n_lines_removed, CAST(len(t2) AS INT) AS ws_tokens,
        |        round(1 - len(list_distinct(t2))*1.0/len(t2), 4) AS dup_token_frac FROM tok),
        |fl AS (SELECT * FROM rep WHERE dup_token_frac <= 0.5),
        |st AS (SELECT * FROM fl WHERE ((doc_id*131+7) % 1000003) % 10000 <
        |        CASE lang WHEN 'en' THEN 5000 ELSE 9000 END)
        |SELECT doc_id, lang, n_lines_removed, dup_token_frac, ws_tokens
        |FROM st ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ur_url_filter" ->
      """WITH p AS (SELECT doc_id, CASE
        | WHEN doc_id % 4 = 0 THEN text || ' see http://ads' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/x'
        | WHEN doc_id % 4 = 1 THEN text || ' see https://ok.org/page'
        | WHEN doc_id % 4 = 2 THEN text || ' ref http://example.com'
        | ELSE text END AS t2 FROM documents),
        |h AS (SELECT doc_id, regexp_extract_all(t2, 'https?://([A-Za-z0-9.-]+)', 1) AS hosts FROM p)
        |SELECT doc_id, CAST(len(hosts) AS INT) AS n_urls,
        | len(list_filter(hosts, x -> x = 'example.com' OR ends_with(x, '.example.com'))) > 0 AS url_blocked
        |FROM h ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ld_line_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_replace(trim(text), '((?:\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g') AS txt FROM documents),
        |l0 AS (SELECT doc_id, string_split(txt, chr(10)) AS ln FROM t),
        |l1 AS (SELECT doc_id, ln, unnest(range(1, len(ln)+1)) AS i FROM l0),
        |l2 AS (SELECT doc_id, i, ln[i] AS line FROM l1),
        |c AS (SELECT line, count(*) AS cnt FROM l2 GROUP BY 1)
        |SELECT l2.doc_id,
        | coalesce(string_agg(CASE WHEN c.cnt <= 1 THEN l2.line END, chr(10) ORDER BY l2.i), '') AS text,
        | CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
        |FROM l2 JOIN c USING (line) GROUP BY l2.doc_id ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "ds_shuffle" ->
      """WITH s AS (SELECT doc_id, (doc_id*131+7) % 1000003 AS s1 FROM documents)
        |SELECT doc_id, (s1*s1 + s1) % 1000003 AS shuffle_slot
        |FROM s ORDER BY shuffle_slot, doc_id""".stripMargin.replace("\n", " "),
    // curriculum order: rank-exact phases + the quadratic-M31
    // within-phase shuffle replayed with window functions
    "cr_curriculum" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars NULLS FIRST, doc_id) - 1 AS r FROM documents),
        |b AS (SELECT doc_id, (r * 4) // (SELECT n FROM n) AS bucket FROM r),
        |sl AS (SELECT doc_id, bucket, ((s1*s1 + s1) % 2147483647) AS slot FROM (SELECT doc_id, bucket, (doc_id*131 + 29) % 2147483647 AS s1 FROM b))
        |SELECT doc_id, bucket AS curriculum_bucket,
        | row_number() OVER (ORDER BY bucket, slot, doc_id) - 1 AS curriculum_pos
        |FROM sl ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // quantile_cont == Spark's exact percentile (linear interpolation on
    // the sorted group)
    "cs_stats" ->
      """SELECT lang, count(n_chars) AS n, round(avg(n_chars),4) AS mean,
        | min(n_chars) AS min, max(n_chars) AS max,
        | round(quantile_cont(n_chars, 0.5),4) AS p50,
        | round(quantile_cont(n_chars, 0.9),4) AS p90,
        | round(quantile_cont(n_chars, 0.99),4) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " "),
    "pk_pack" ->
      """WITH c AS (SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok_cnt FROM documents),
        |p AS (SELECT doc_id, tok_cnt, CAST(coalesce(sum(tok_cnt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev FROM c)
        |SELECT doc_id, tok_cnt, prev // 256 AS pack_first,
        | CASE WHEN tok_cnt > 0 THEN (prev + tok_cnt - 1) // 256 ELSE prev // 256 END AS pack_last,
        | prev % 256 AS pack_pos
        |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "pk2_materialize" -> scl(
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |c AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM tk),
        |p AS (SELECT doc_id, t, CAST(coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM c),
        |e AS (SELECT doc_id, o + ln.i - 1 AS g, t[ln.i] AS tok
        | FROM p, LATERAL (SELECT unnest(range(1, len(t)+1)) AS i) ln),
        |pk AS (SELECT g // 256 AS pack_id, g, tok, doc_id FROM e)
        |SELECT pack_id, CAST(count(*) AS INT) AS n_tokens,
        | list(tok ORDER BY g) AS tokens, list(doc_id ORDER BY g) AS doc_ids
        |FROM pk GROUP BY pack_id ORDER BY pack_id""".stripMargin.replace("\n", " "),
      "pack_id" -> "", "n_tokens" -> "", "tokens" -> "s", "doc_ids" -> "i"),
    // nearest formula centroid (argmin squared-L2, first-min tie-break),
    // then per-cluster cap in quadratic-hash order — exact replay
    "cb_cluster_sample" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, list_transform(range(0,8), c ->
        |  list_sum(list_transform(list_transform(range(0,64), t ->
        |    v[t+1] - (((c*31 + t*7) % 10)*0.1 - 0.4)), dd -> dd*dd))) AS ds FROM emb),
        |cl AS (SELECT vec_id, CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cluster,
        |  (vec_id*131+7) % 1000003 AS s1 FROM a),
        |rk AS (SELECT vec_id, cluster,
        |  row_number() OVER (PARTITION BY cluster ORDER BY (s1*s1+s1) % 1000003, vec_id) AS r FROM cl)
        |SELECT vec_id, cluster FROM rk WHERE r <= 25 ORDER BY vec_id""".stripMargin.replace("\n", " "),
    "rl_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | count(*) OVER w AS rolling_cnt,
        | round(sum(value) OVER w, 4) AS rolling_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        | RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin.replace("\n", " "),
    // heap-mode twin: same oracle — results must be bit-identical
    "gt2_topk_heap" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS rank
        | FROM documents)
        |SELECT lang, doc_id, n_chars, rank FROM r WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin.replace("\n", " "),
    "gt_group_topk" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT) AS rank
        | FROM documents)
        |SELECT lang, doc_id, n_chars, rank FROM r WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin.replace("\n", " "),
    // the oracle is the NAIVE inequality join the binned plan must equal
    "rj_range" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type='click'),
        |w AS (SELECT event_id AS err_id, user_id, epoch_us(ts) AS wstart, epoch_us(ts) + 1800000000 AS wend FROM events WHERE event_type='error')
        |SELECT c.event_id, c.user_id, c.ts_us, w.err_id, w.wstart
        |FROM c JOIN w ON c.user_id = w.user_id AND c.ts_us >= w.wstart AND c.ts_us <= w.wend
        |ORDER BY c.event_id, w.err_id""".stripMargin.replace("\n", " "),
    // union+window replay of the tagged as-of scan: rights (side 0) sort
    // before lefts at equal ts, so a purchase at exactly click-ts is visible
    "aj_asof" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='click'),
        |r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type='purchase'),
        |u AS (SELECT user_id, ts, 1 AS side, NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val, event_id AS l_eid FROM l
        | UNION ALL SELECT user_id, ts, 0, event_id, value, NULL FROM r),
        |w AS (SELECT *,
        |  last_value(r_eid IGNORE NULLS) OVER win AS a_eid,
        |  last_value(r_val IGNORE NULLS) OVER win AS a_val,
        |  count(r_eid) OVER win AS np
        | FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, r_eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT w.l_eid AS event_id, w.user_id, epoch_us(w.ts) AS ts_us,
        | w.a_eid AS asof_event_id, w.a_val AS asof_value, CAST(w.np AS BIGINT) AS asof_n_prior
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin.replace("\n", " "),
    "io_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    // sketch-on-ingest must lose nothing: same oracle as hh_heavy_ngrams
    "ev_stream_heavy_ngrams" ->
      """WITH tok AS (SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
        |ng AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) ELSE [] END) AS gram FROM tok)
        |SELECT gram, count(*) AS n_occurrences FROM ng GROUP BY gram
        |HAVING count(*) >= 35 ORDER BY gram""".stripMargin.replace("\n", " "),
    // the sketch prunes, the exact count decides: plain GROUP BY HAVING
    "hh_heavy_ngrams" ->
      """WITH tok AS (SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
        |ng AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' ')) ELSE [] END) AS gram FROM tok)
        |SELECT gram, count(*) AS n_occurrences FROM ng GROUP BY gram
        |HAVING count(*) >= 35 ORDER BY gram""".stripMargin.replace("\n", " "),
    "io_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    "io_csv_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    // compaction preserves content exactly: identity replay over the
    // round-robin rewrite
    "io_compacted_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    // footer-only audit must recover the table's count/min/max exactly
    "io_footer_audit" ->
      "SELECT CAST(count(*) AS BIGINT) AS total_rows, CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc FROM documents",
    // nearest-neighbor resample out[i] = in[floor(i*n/32)], ASCII text so
    // byte positions equal char positions
    "mm_resize" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents)
        |SELECT doc_id,
        | CASE WHEN n > 0 THEN list_aggregate(list_transform(range(0, 32),
        |   i -> text[CAST((i*n - (i*n) % 32) / 32 AS INT) + 1]), 'string_agg', '')
        | ELSE '' END AS resized_text,
        | CAST(CASE WHEN n > 0 THEN 32 ELSE 0 END AS BIGINT) AS n_bytes
        |FROM t ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // stage-by-stage replay of the whole selection chain: substring dedup
    // -> DSIR weights (en target) -> floor -> sqrt-temperature mix ->
    // quadratic shuffle order -> fixed-size shard layout
    "pp_select_v3" ->
      """WITH tk0 AS (SELECT doc_id, lang, string_split_regex(trim(coalesce(text,'')), '\s+') AS toks FROM documents),
        |occ AS (SELECT doc_id, ln.i AS sp, array_to_string(toks[ln.i+1:ln.i+5], ' ') AS sh
        | FROM tk0, LATERAL (SELECT unnest(range(0, greatest(len(toks)-4, 0))) AS i) ln),
        |dup AS (SELECT sh FROM occ GROUP BY sh HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT occ.doc_id, u.p FROM occ JOIN dup USING (sh),
        | LATERAL (SELECT unnest(range(occ.sp, occ.sp+5)) AS p) u),
        |tok AS (SELECT doc_id, ln.i - 1 AS p, toks[ln.i] AS w
        | FROM tk0, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS i) ln),
        |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
        | LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p WHERE cov.p IS NULL),
        |rb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS clean, count(*) AS nk FROM kept GROUP BY doc_id),
        |cl AS (SELECT tk0.doc_id, tk0.lang, coalesce(rb.clean, '') AS text,
        |  CAST(len(tk0.toks) - coalesce(rb.nk, 0) AS BIGINT) AS n_tokens_removed
        | FROM tk0 LEFT JOIN rb USING (doc_id)),
        |tkh AS (SELECT doc_id, lang, n_tokens_removed, list_transform(string_split_regex(trim(coalesce(text,'')), '\s+'),
        |  t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))),
        |    (h, c) -> (h*31 + c) % 1000003)) AS th FROM cl),
        |f AS (SELECT doc_id, lang, unnest(list_transform(th, h -> h % 4096) ||
        |  CASE WHEN len(th) >= 2 THEN list_transform(range(0, len(th)-1),
        |    i -> ((th[i+1]*131 + th[i+2]) % 1000003) % 4096)
        |  ELSE CAST([] AS BIGINT[]) END) AS b FROM tkh),
        |rc AS (SELECT b, count(*) AS c FROM f GROUP BY b),
        |tc AS (SELECT b, count(*) AS c FROM f WHERE lang = 'en' GROUP BY b),
        |rn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
        |tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f WHERE lang = 'en'),
        |w AS (SELECT rc.b, CAST(round((ln((coalesce(tc.c, 0)+1) / ((SELECT n FROM tn)+4096))
        |  - ln((rc.c+1) / ((SELECT n FROM rn)+4096))) * 10000) AS BIGINT) AS w
        | FROM rc LEFT JOIN tc USING (b)),
        |sc AS (SELECT f.doc_id, round(CAST(sum(w.w) AS DOUBLE)/10000, 4) AS s
        | FROM f JOIN w USING (b) GROUP BY f.doc_id),
        |wt AS (SELECT cl.doc_id, cl.lang, cl.n_tokens_removed, coalesce(sc.s, 0) AS dsir_logweight
        | FROM cl LEFT JOIN sc USING (doc_id)),
        |sel AS (SELECT * FROM wt WHERE dsir_logweight > -1.0),
        |cnt AS (SELECT lang, count(*) AS n FROM sel GROUP BY lang),
        |mx AS (SELECT min(n) AS m FROM cnt),
        |rt AS (SELECT lang, CAST(round(sqrt(CAST((SELECT m FROM mx) AS DOUBLE) / n) * 10000) AS BIGINT) AS thr FROM cnt),
        |mix AS (SELECT sel.* FROM sel JOIN rt USING (lang)
        | WHERE ((sel.doc_id*131+7) % 1000003) % 10000 < rt.thr),
        |sl AS (SELECT *, (doc_id*131+7) % 1000003 AS s1 FROM mix),
        |sl2 AS (SELECT *, ((s1*s1 + s1) % 1000003) * 1048576 + doc_id AS ord FROM sl),
        |rk AS (SELECT *, row_number() OVER (ORDER BY ord) - 1 AS rkn FROM sl2)
        |SELECT doc_id, lang, n_tokens_removed, dsir_logweight,
        | rkn // 32 AS shard_id, rkn % 32 AS pos_in_shard
        |FROM rk ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // stage-by-stage replay of the training-data EPILOGUE chain: the
    // mx_domain_mixture quota plan + per-(id, epoch) draw, then the
    // cr_curriculum rank-slice buckets + quadratic within-phase order
    // over the MIXTURE copies (id = doc_id*8+epoch), then the pk_pack
    // prefix-sum packing and the sh_shard layout over the same order —
    // drift in ANY stage (or in how they compose) hash-fails
    "pp_train_order_v1" ->
      """WITH tot AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT 'src' || CAST(i AS VARCHAR) AS dom, CASE WHEN i = 19 THEN 200 WHEN i % 4 = 0 THEN 1 WHEN i % 4 = 1 THEN 11 WHEN i % 4 = 2 THEN 21 ELSE 60 END AS wt FROM (SELECT unnest(generate_series(0, 19)) AS i)),
        |cnt AS (SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
        |pl AS (SELECT c.dom, c.n, ((SELECT n FROM tot) * wt) // (SELECT sum(wt) FROM w) AS needed FROM cnt c JOIN w ON c.dom = w.dom),
        |p2 AS (SELECT dom, n, least(needed, n * 3) AS capped FROM pl WHERE least(needed, n * 3) > 0),
        |p3 AS (SELECT dom, n, capped // n AS fe, capped % n AS rem FROM p2),
        |p4 AS (SELECT dom, fe, CAST((CAST(rem AS HUGEINT) * 2147483647) // n AS BIGINT) AS thr FROM p3),
        |eps AS (SELECT CAST(unnest(generate_series(1, 4)) AS INTEGER) AS epoch),
        |ex AS (SELECT d.doc_id, d.n_chars, e.epoch, p.fe, p.thr FROM documents d JOIN p4 p ON d.source = p.dom CROSS JOIN eps e WHERE e.epoch <= p.fe + 1),
        |mx AS (SELECT doc_id, n_chars, epoch FROM (SELECT *, ((s1*s1 + s1) % 2147483647) AS slot FROM (SELECT *, (doc_id*131 + 23 + epoch*7919) % 2147483647 AS s1 FROM ex)) WHERE epoch <= fe OR slot < thr),
        |m2 AS (SELECT doc_id, n_chars, epoch, doc_id*8 + epoch AS mid FROM mx),
        |nn AS (SELECT count(*) AS n FROM m2),
        |rk AS (SELECT *, row_number() OVER (ORDER BY n_chars NULLS FIRST, mid) - 1 AS r FROM m2),
        |bk AS (SELECT *, (r * 4) // (SELECT n FROM nn) AS bucket FROM rk),
        |s2 AS (SELECT *, ((u1*u1 + u1) % 2147483647) AS slot2 FROM (SELECT *, (mid*131 + 29) % 2147483647 AS u1 FROM bk)),
        |po AS (SELECT *, row_number() OVER (ORDER BY bucket, slot2, mid) - 1 AS cpos FROM s2),
        |pk AS (SELECT *, CAST(coalesce(sum(coalesce(n_chars, 0)) OVER (ORDER BY cpos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev FROM po)
        |SELECT doc_id, epoch, bucket AS curriculum_bucket, cpos AS curriculum_pos,
        | prev // 2048 AS pack_first,
        | CASE WHEN coalesce(n_chars, 0) > 0 THEN (prev + n_chars - 1) // 2048 ELSE prev // 2048 END AS pack_last,
        | prev % 2048 AS pack_pos,
        | cpos // 32 AS shard_id, cpos % 32 AS pos_in_shard
        |FROM pk ORDER BY doc_id, epoch""".stripMargin.replace("\n", " "),
    // realized-vs-owed audit: quota math (needed/cap/fe) joined to what
    // the mixture actually emitted, outage domains kept at emitted 0
    "mx_mixture_report" ->
      """WITH tot AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT 'src' || CAST(i AS VARCHAR) AS dom, CASE WHEN i = 19 THEN 200 WHEN i % 4 = 0 THEN 1 WHEN i % 4 = 1 THEN 11 WHEN i % 4 = 2 THEN 21 ELSE 60 END AS wt FROM (SELECT unnest(generate_series(0, 19)) AS i)),
        |cnt AS (SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
        |pl AS (SELECT c.dom, c.n, ((SELECT n FROM tot) * wt) // (SELECT sum(wt) FROM w) AS needed FROM cnt c JOIN w ON c.dom = w.dom),
        |p2 AS (SELECT dom, n, needed, least(needed, n * 3) AS capped FROM pl WHERE least(needed, n * 3) > 0),
        |p3 AS (SELECT dom, n, needed, capped, capped // n AS fe, capped % n AS rem FROM p2),
        |p4 AS (SELECT dom, fe, CAST((CAST(rem AS HUGEINT) * 2147483647) // n AS BIGINT) AS thr FROM p3),
        |eps AS (SELECT CAST(unnest(generate_series(1, 4)) AS INTEGER) AS epoch),
        |ex AS (SELECT d.doc_id, d.source, e.epoch, p.fe, p.thr FROM documents d JOIN p4 p ON d.source = p.dom CROSS JOIN eps e WHERE e.epoch <= p.fe + 1),
        |mx AS (SELECT doc_id, source, epoch FROM (SELECT *, ((s1*s1 + s1) % 2147483647) AS slot FROM (SELECT *, (doc_id*131 + 23 + epoch*7919) % 2147483647 AS s1 FROM ex)) WHERE epoch <= fe OR slot < thr),
        |rz AS (SELECT source AS dom, count(*) AS emitted, count(DISTINCT doc_id) AS distinct_docs, max(epoch) AS max_epoch FROM mx GROUP BY 1),
        |ow AS (SELECT w.dom, ((SELECT n FROM tot) * w.wt) // (SELECT sum(wt) FROM w) AS needed, coalesce(c.n, 0) AS n FROM w LEFT JOIN cnt c ON w.dom = c.dom),
        |o2 AS (SELECT dom, needed, least(needed, n * 3) AS capped, CASE WHEN n > 0 THEN least(needed, n * 3) // n ELSE 0 END AS fe FROM ow)
        |SELECT o2.dom AS source, CAST(o2.needed AS BIGINT) AS needed,
        | CAST(o2.capped AS BIGINT) AS capped, CAST(o2.fe AS BIGINT) AS fe,
        | coalesce(rz.emitted, 0) AS emitted,
        | coalesce(rz.distinct_docs, 0) AS distinct_docs,
        | CAST(coalesce(rz.max_epoch, 0) AS INTEGER) AS max_epoch,
        | CAST(CASE WHEN o2.capped > 0 THEN (coalesce(rz.emitted, 0) * 10000) // o2.capped
        |      WHEN o2.needed = 0 THEN 10000 ELSE 0 END AS BIGINT) AS quota_fill_bp
        |FROM o2 LEFT JOIN rz ON o2.dom = rz.dom ORDER BY source""".stripMargin.replace("\n", " "),
    // exhaustive-jaccard pairs + dense-rank negative arithmetic, with the
    // anchor/pos collision fallback replayed via the 3-candidate CASE
    "tp_triplets" ->
      """WITH planted AS (SELECT doc_id, text FROM documents UNION ALL
        | SELECT doc_id+10000, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ')
        | FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM planted)),
        |szs AS (SELECT doc_id, len(s) AS n FROM sh),
        |inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cnd AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        | FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |mh AS (SELECT id_a, id_b
        | FROM cnd JOIN szs sa ON sa.doc_id = cnd.id_a JOIN szs sb ON sb.doc_id = cnd.id_b
        | WHERE shared::DOUBLE / (sa.n + sb.n - shared)::DOUBLE >= 0.5),
        |rk AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r FROM planted),
        |nn AS (SELECT count(*) AS n FROM planted),
        |cand AS (SELECT id_a AS anchor_id, id_b AS pos_id,
        |  (id_a*131 + id_b*31 + 7) % (SELECT n FROM nn) AS s0 FROM mh),
        |cj AS (SELECT c.anchor_id, c.pos_id, r0.doc_id AS c0, r1.doc_id AS c1, r2.doc_id AS c2
        | FROM cand c
        | JOIN rk r0 ON r0.r = c.s0
        | JOIN rk r1 ON r1.r = (c.s0 + 1) % (SELECT n FROM nn)
        | JOIN rk r2 ON r2.r = (c.s0 + 2) % (SELECT n FROM nn))
        |SELECT anchor_id, pos_id,
        | CASE WHEN c0 <> anchor_id AND c0 <> pos_id THEN c0
        |      WHEN c1 <> anchor_id AND c1 <> pos_id THEN c1
        |      ELSE c2 END AS neg_id
        |FROM cj ORDER BY anchor_id, pos_id""".stripMargin.replace("\n", " "),
    // replay: per-source dense ranks -> fixed-point inverse-weight keys ->
    // global rank over the unique (key*1000 + source) order
    "il_interleave" ->
      """WITH en AS (SELECT doc_id, lang, 0 AS source_idx,
        |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) * 333333 * 1000 + 0 AS o
        | FROM documents WHERE lang = 'en'),
        |re AS (SELECT doc_id, lang, 1 AS source_idx,
        |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) * 1000000 * 1000 + 1 AS o
        | FROM documents WHERE lang <> 'en'),
        |u AS (SELECT * FROM en UNION ALL SELECT * FROM re)
        |SELECT doc_id, lang, source_idx,
        | row_number() OVER (ORDER BY o) - 1 AS interleave_pos
        |FROM u ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // keep rate (n_min/n_s)^(1-alpha): surviving counts ~ n_s^alpha;
    // IEEE sqrt is correctly rounded -> thresholds replay bit-for-bit
    "tm_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT lang, greatest(CAST(round(sqrt(CAST((SELECT mn FROM m) AS DOUBLE) / n) * 10000) AS BIGINT), 1) AS thr FROM c)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE ((d.doc_id*131+7) % 1000003) % 10000 < r.thr ORDER BY d.doc_id""".stripMargin.replace("\n", " "),
    // domain-mixture with bounded repetition: the full quota plan
    // (integer needed/cap/fe/rem, HUGEINT threshold) + the quadratic-M31
    // per-(id, epoch) draw replayed relationally
    "mx_domain_mixture" ->
      """WITH tot AS (SELECT count(*) AS n FROM documents),
        |w AS (SELECT 'src' || CAST(i AS VARCHAR) AS dom, CASE WHEN i = 19 THEN 200 WHEN i % 4 = 0 THEN 1 WHEN i % 4 = 1 THEN 11 WHEN i % 4 = 2 THEN 21 ELSE 60 END AS wt FROM (SELECT unnest(generate_series(0, 19)) AS i)),
        |cnt AS (SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
        |pl AS (SELECT c.dom, c.n, ((SELECT n FROM tot) * wt) // (SELECT sum(wt) FROM w) AS needed FROM cnt c JOIN w ON c.dom = w.dom),
        |p2 AS (SELECT dom, n, least(needed, n * 3) AS capped FROM pl WHERE least(needed, n * 3) > 0),
        |p3 AS (SELECT dom, n, capped // n AS fe, capped % n AS rem FROM p2),
        |p4 AS (SELECT dom, fe, CAST((CAST(rem AS HUGEINT) * 2147483647) // n AS BIGINT) AS thr FROM p3),
        |eps AS (SELECT CAST(unnest(generate_series(1, 4)) AS INTEGER) AS epoch),
        |ex AS (SELECT d.doc_id, d.source, e.epoch, p.fe, p.thr FROM documents d JOIN p4 p ON d.source = p.dom CROSS JOIN eps e WHERE e.epoch <= p.fe + 1),
        |sl AS (SELECT doc_id, source, epoch, fe, thr, ((s1*s1 + s1) % 2147483647) AS slot FROM (SELECT *, (doc_id*131 + 23 + epoch*7919) % 2147483647 AS s1 FROM ex))
        |SELECT doc_id, source, epoch FROM sl WHERE epoch <= fe OR slot < thr ORDER BY doc_id, epoch""".stripMargin.replace("\n", " "),
    // the token-budget twin: identical chain with per-domain n_chars
    // SUMS in place of row counts (budget = total corpus chars)
    "mx_token_mixture" ->
      """WITH tot AS (SELECT sum(n_chars) AS n FROM documents),
        |w AS (SELECT 'src' || CAST(i AS VARCHAR) AS dom, CASE WHEN i = 19 THEN 200 WHEN i % 4 = 0 THEN 1 WHEN i % 4 = 1 THEN 11 WHEN i % 4 = 2 THEN 21 ELSE 60 END AS wt FROM (SELECT unnest(generate_series(0, 19)) AS i)),
        |cnt AS (SELECT source AS dom, sum(n_chars) AS n FROM documents GROUP BY 1),
        |pl AS (SELECT c.dom, c.n, ((SELECT n FROM tot) * wt) // (SELECT sum(wt) FROM w) AS needed FROM cnt c JOIN w ON c.dom = w.dom WHERE c.n > 0),
        |p2 AS (SELECT dom, n, least(needed, n * 3) AS capped FROM pl WHERE least(needed, n * 3) > 0),
        |p3 AS (SELECT dom, n, capped // n AS fe, capped % n AS rem FROM p2),
        |p4 AS (SELECT dom, fe, CAST((CAST(rem AS HUGEINT) * 2147483647) // n AS BIGINT) AS thr FROM p3),
        |eps AS (SELECT CAST(unnest(generate_series(1, 4)) AS INTEGER) AS epoch),
        |ex AS (SELECT d.doc_id, d.source, e.epoch, p.fe, p.thr FROM documents d JOIN p4 p ON d.source = p.dom CROSS JOIN eps e WHERE e.epoch <= p.fe + 1),
        |sl AS (SELECT doc_id, source, epoch, fe, thr, ((s1*s1 + s1) % 2147483647) AS slot FROM (SELECT *, (doc_id*131 + 23 + epoch*7919) % 2147483647 AS s1 FROM ex))
        |SELECT doc_id, source, epoch FROM sl WHERE epoch <= fe OR slot < thr ORDER BY doc_id, epoch""".stripMargin.replace("\n", " "),
    // add-one-smoothed conditional bigram table replayed in fixed point
    "bg_bigram_nll" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(coalesce(text,'')), '\s+') AS t FROM documents),
        |bg AS (SELECT doc_id, t[ln.i+1] AS p, t[ln.i+2] AS c
        | FROM tk, LATERAL (SELECT unnest(range(0, greatest(len(t)-1, 0))) AS i) ln),
        |un AS (SELECT doc_id, unnest(t) AS p FROM tk),
        |v AS (SELECT count(DISTINCT p) AS vs FROM un),
        |uc AS (SELECT p, count(*) AS u FROM un GROUP BY p),
        |bc AS (SELECT p, c, count(*) AS bn FROM bg GROUP BY p, c),
        |w AS (SELECT bc.p, bc.c, CAST(round(-ln((bc.bn+1) / CAST(uc.u + (SELECT vs FROM v) AS DOUBLE)) * 10000) AS BIGINT) AS f
        | FROM bc JOIN uc USING (p)),
        |sc AS (SELECT bg.doc_id, CAST(floor((sum(w.f)*2 + count(*)) / (count(*) * 2.0)) AS DOUBLE) / 10000.0 AS s
        | FROM bg JOIN w ON bg.p = w.p AND bg.c = w.c GROUP BY bg.doc_id)
        |SELECT d.doc_id, coalesce(sc.s, 0) AS bigram_nll
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "),
    "u5_assign_row_id" ->
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS row_idx
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),
    "sh_shard_assign" ->
      """WITH s AS (SELECT doc_id, (doc_id*131+7) % 1000003 AS s1 FROM documents),
        |o AS (SELECT doc_id, ((s1*s1+s1) % 1000003) * 1048576 + doc_id AS ord FROM s),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY ord) - 1 AS rk FROM o)
        |SELECT doc_id, rk // 64 AS shard_id, rk % 64 AS pos_in_shard
        |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " "),
    // full replay of the hashed unigram+bigram feature space (char-fold
    // token hash as in ta_fingerprint) and the fixed-point weight table
    "ir_dsir" ->
      """WITH tk AS (SELECT doc_id, lang, list_transform(string_split_regex(trim(coalesce(text,'')), '\s+'),
        |  t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))),
        |    (h, c) -> (h*31 + c) % 1000003)) AS th FROM documents),
        |f AS (SELECT doc_id, lang, unnest(list_transform(th, h -> h % 4096) ||
        |  CASE WHEN len(th) >= 2 THEN list_transform(range(0, len(th)-1),
        |    i -> ((th[i+1]*131 + th[i+2]) % 1000003) % 4096)
        |  ELSE CAST([] AS BIGINT[]) END) AS b FROM tk),
        |rc AS (SELECT b, count(*) AS c FROM f GROUP BY b),
        |tc AS (SELECT b, count(*) AS c FROM f WHERE lang = 'en' GROUP BY b),
        |rn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
        |tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f WHERE lang = 'en'),
        |w AS (SELECT rc.b, CAST(round((ln((coalesce(tc.c, 0)+1) / ((SELECT n FROM tn)+4096))
        |  - ln((rc.c+1) / ((SELECT n FROM rn)+4096))) * 10000) AS BIGINT) AS w
        | FROM rc LEFT JOIN tc USING (b)),
        |sc AS (SELECT f.doc_id, round(CAST(sum(w.w) AS DOUBLE)/10000, 4) AS s
        | FROM f JOIN w USING (b) GROUP BY f.doc_id)
        |SELECT d.doc_id, coalesce(sc.s, 0) AS dsir_logweight
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "),
    // formula weights w_fp(b) = (((b*13+5) mod 21) - 10) * 1000; bias 0.05
    "qc_hash_score" ->
      """WITH tk AS (SELECT doc_id, list_transform(string_split_regex(trim(coalesce(text,'')), '\s+'),
        |  t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(range(1, length(t)+1), i -> CAST(unicode(t[i]) AS BIGINT))),
        |    (h, c) -> (h*31 + c) % 1000003)) AS th FROM documents),
        |f AS (SELECT doc_id, unnest(list_transform(th, h -> h % 4096) ||
        |  CASE WHEN len(th) >= 2 THEN list_transform(range(0, len(th)-1),
        |    i -> ((th[i+1]*131 + th[i+2]) % 1000003) % 4096)
        |  ELSE CAST([] AS BIGINT[]) END) AS b FROM tk),
        |sc AS (SELECT doc_id, 500 + sum((((b*13+5) % 21) - 10) * 1000) AS fp FROM f GROUP BY doc_id)
        |SELECT d.doc_id, round(CAST(coalesce(sc.fp, 500) AS DOUBLE)/10000, 4) AS quality_logit,
        | coalesce(sc.fp, 500) > 0 AS quality_keep
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin.replace("\n", " "),
    // coverage replay: every position under a k=5 shingle occurring >= 2x
    // anywhere is deleted; text reassembled from survivors in order
    "dd_substring" ->
      """WITH p AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |  THEN text || ' subscribe to our newsletter for updates today' ELSE text END AS t FROM documents),
        |tk AS (SELECT doc_id, string_split_regex(trim(t), '\s+') AS toks FROM p),
        |occ AS (SELECT doc_id, ln.i AS sp, array_to_string(toks[ln.i+1:ln.i+5], ' ') AS sh
        |  FROM tk, LATERAL (SELECT unnest(range(0, greatest(len(toks)-4, 0))) AS i) ln),
        |dup AS (SELECT sh FROM occ GROUP BY sh HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT occ.doc_id, u.p FROM occ JOIN dup USING (sh),
        |  LATERAL (SELECT unnest(range(occ.sp, occ.sp+5)) AS p) u),
        |tok AS (SELECT doc_id, ln.i - 1 AS p, toks[ln.i] AS w
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS i) ln),
        |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
        |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p WHERE cov.p IS NULL),
        |rb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS clean, count(*) AS nk FROM kept GROUP BY doc_id),
        |n0 AS (SELECT doc_id, len(toks) AS n FROM tk)
        |SELECT n0.doc_id, coalesce(rb.clean, '') AS text,
        | CAST(n0.n - coalesce(rb.nk, 0) AS BIGINT) AS n_tokens_removed
        |FROM n0 LEFT JOIN rb USING (doc_id) ORDER BY n0.doc_id""".stripMargin.replace("\n", " "),
    // exhaustive cross-corpus Jaccard the banded pipe must equal (shingle
    // Jaccard over strings == over xxhash64 values modulo collisions)
    // stateless stream-vs-corpus twin: the cross half of dd_incremental's
    // pair set restricted to the %10 mutation (same inverted-index form)
    "ev_stream_corpus_dedup" ->
      """WITH arr AS (SELECT doc_id+200000 AS arr_id, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS text
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 10 = 0)),
        |sa AS (SELECT arr_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT arr_id, text, string_split_regex(trim(text), '\s+') AS toks FROM arr)),
        |sc AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)),
        |sza AS (SELECT arr_id, len(s) AS n FROM sa),
        |szc AS (SELECT doc_id, len(s) AS n FROM sc),
        |inva AS (SELECT arr_id, unnest(s) AS g FROM sa),
        |invc AS (SELECT doc_id, unnest(s) AS g FROM sc),
        |cand AS (SELECT a.arr_id AS id_a, c.doc_id AS id_b, count(*) AS inter
        | FROM inva a JOIN invc c USING (g) GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (sa2.n + sc2.n - inter) AS j
        | FROM cand JOIN sza sa2 ON sa2.arr_id = cand.id_a
        |  JOIN szc sc2 ON sc2.doc_id = cand.id_b)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    // exact-complete inverted-index Jaccard (a qualifying pair shares a
    // shingle for any threshold > 0) over cross + within-batch pair sets
    "dd_incremental" ->
      """WITH batch AS (
        | SELECT doc_id+200000 AS doc_id, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 10 = 0)
        | UNION ALL
        | SELECT doc_id+300000 AS doc_id, array_to_string(toks[1:greatest(len(toks)-1,1)], ' ') AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 20 = 0)),
        |shb AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM batch)),
        |shc AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)),
        |szb AS (SELECT doc_id, len(s) AS n FROM shb),
        |szc AS (SELECT doc_id, len(s) AS n FROM shc),
        |invb AS (SELECT doc_id, unnest(s) AS g FROM shb),
        |invc AS (SELECT doc_id, unnest(s) AS g FROM shc),
        |crossp AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b, count(*) AS inter
        | FROM invb a JOIN invc c USING (g) GROUP BY 1, 2),
        |crossj AS (SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j, 'cross' AS pair_src
        | FROM crossp JOIN szb sa ON sa.doc_id = crossp.id_a
        |  JOIN szc sb ON sb.doc_id = crossp.id_b),
        |batp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        | FROM invb a JOIN invb b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |batj AS (SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j, 'batch' AS pair_src
        | FROM batp JOIN szb sa ON sa.doc_id = batp.id_a
        |  JOIN szb sb ON sb.doc_id = batp.id_b)
        |SELECT id_a, id_b, round(j, 4) AS jaccard, pair_src
        |FROM (SELECT * FROM crossj UNION ALL SELECT * FROM batj)
        |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
    // r11: inverted-index form (was CROSS JOIN over |docs|x|eval| shingle
    // lists — intractable at sf1). Lossless: a j >= 0.5 pair shares a
    // shingle, so the shared-shingle join is candidate-complete and
    // |union| = n_a + n_b - |intersection| needs no list materialization.
    "cu_cross_contam" ->
      """WITH ev AS (SELECT doc_id+100000 AS eval_id, array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS text
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 10 = 0)),
        |sa AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents)),
        |sb AS (SELECT eval_id, list_distinct(CASE WHEN len(toks) >= 3
        |  THEN list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        |  ELSE [text] END) AS s
        | FROM (SELECT eval_id, text, string_split_regex(trim(text), '\s+') AS toks FROM ev)),
        |sza AS (SELECT doc_id, len(s) AS n FROM sa),
        |szb AS (SELECT eval_id, len(s) AS n FROM sb),
        |inva AS (SELECT doc_id, unnest(s) AS g FROM sa),
        |invb AS (SELECT eval_id, unnest(s) AS g FROM sb),
        |cand AS (SELECT a.doc_id AS id_a, b.eval_id AS id_b, count(*) AS inter
        | FROM inva a JOIN invb b USING (g) GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (sa2.n + sb2.n - inter) AS j
        | FROM cand JOIN sza sa2 ON sa2.doc_id = cand.id_a
        |  JOIN szb sb2 ON sb2.eval_id = cand.id_b)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin.replace("\n", " "),
  )

  /** SQL front ends of shared kernels: the gate output must equal the
    * pipe gate's bytes exactly, so the oracle IS the base gate's oracle.
    */
  val oracleSql: Map[String, String] = oracleBase ++ Map(
    "tx_html_extract_sql" -> oracleBase("tx_html_extract"),
    "ta_langid_sql" -> oracleBase("ta_langid"),
    "ta_fingerprint_sql" -> oracleBase("ta_fingerprint"),
    // incremental add == full build EXACTLY for the signature index
    // (formula hyperplanes, nothing trained) and the lexical inverted
    // index (per-doc shingles, no corpus statistics) — the full-build
    // oracles apply VERBATIM to the incrementally-built engines
    "s32_lsh_add" -> oracleBase("s17_lsh_dense"),
    "s33_jaccard_add" -> oracleBase("s22_jaccard_search"),
    // the stream's expansion is the batch pipe's map-only half against
    // the identical static quota plan — bit-identical rows/epochs
    "ev_stream_domain_mixture" -> oracleBase("mx_domain_mixture"),
    // the materialized shard dir must round-trip the capstone frame
    // exactly — SAME oracle (file-per-shard + in-file order are the
    // spec's half, invisible to SQL)
    "io_train_shards" -> oracleBase("pp_train_order_v1"))
}
