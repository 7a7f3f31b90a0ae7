package graft.text

import org.apache.spark.sql.SparkSession

/** Import/export of PUBLIC-format tokenizer state, so a tokenizer trained
  * elsewhere applies here without re-learning (the reference hands this to
  * HF `AutoTokenizer.from_pretrained`, warp_pipes/pipes/tokenizer.py:13-55;
  * this is the Spark-side equivalent for the two classic file shapes):
  *
  *   - `merges.txt`: one merge per line, `"a b"`, PRIORITY = line order,
  *     optional `#version` header and comment/blank lines — feeds
  *     [[BpeEncodePipe]];
  *   - `vocab.json` (one JSON object `{token: id}`) or vocab JSONL (one
  *     `{"token": ..., "id": ...}` per line) — feeds
  *     [[TokenizerPipe]]'s explicit-vocab override.
  *
  * All reads go through the driver via Hadoop FS (works for local paths
  * and cluster filesystems alike): these tables are KB-to-MB scale and are
  * embedded into the plan as literals by the consuming pipes — reading
  * them as distributed datasets would only lose the line order that
  * defines merge priority.
  */
object PretrainedVocab {

  private def readLines(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Load a merges.txt: `"a b"` per line in priority order. Only a
    * LEADING `#version` line is a header — byte-level BPE tables learned
    * on code legitimately contain merges whose first symbol starts with
    * `#` (e.g. `"# #"`), so a blanket comment filter would silently drop
    * merges and shift every later priority. Blank lines are skipped; any
    * other line that is not exactly two space-separated symbols is an
    * error (silently mis-splitting a merge table corrupts every encoding
    * after it).
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] = {
    val all = readLines(spark, path)
    val body = all match {
      case head +: rest if head.startsWith("#version") => rest
      case other => other
    }
    body.filterNot(_.isEmpty).map { l =>
      l.split(" ", -1) match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ => throw new IllegalArgumentException(
          s"malformed merges line '$l' in $path (expected 'a b')")
      }
    }
  }

  /** Load a vocab file: either ONE JSON object `{token: id, ...}` (the
    * classic vocab.json) or JSONL with `{"token": ..., "id": ...}` rows.
    * Detection is by PARSING, not string prefixes: it is JSONL iff every
    * line parses as an object carrying token+id fields; otherwise the
    * whole content must parse as a single all-integer object — anything
    * else (near-miss rows, concatenated objects, non-integer ids) raises
    * instead of silently producing a garbage vocab.
    */
  def loadVocab(spark: SparkSession, path: String): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def tryParse(s: String): Option[com.fasterxml.jackson.databind.JsonNode] =
      try Some(mapper.readTree(s)) catch { case _: Exception => None }
    val lines = readLines(spark, path).filterNot(_.trim.isEmpty)
    require(lines.nonEmpty, s"empty vocab file $path")
    val rowNodes = lines.map(l => tryParse(l.trim))
    // A minified single-line vocab.json can itself contain tokens literally
    // named "token" and "id" (true of real GPT-2/RoBERTa vocabs) — the
    // whole object then has both fields and would masquerade as one JSONL
    // row. Disambiguate on the 1-line case by the field TYPES: a JSONL row
    // carries a textual `token`, a vocab object maps every token to an int.
    val isJsonl = rowNodes.forall(_.exists(n =>
      n.isObject && n.has("token") && n.has("id"))) &&
      (lines.length > 1 ||
        rowNodes.head.exists(n => n.get("token").isTextual))
    if (isJsonl) {
      rowNodes.flatten.map { n =>
        require(n.get("id").isIntegralNumber,
          s"non-integer id in JSONL vocab $path: $n")
        n.get("token").asText() -> n.get("id").asInt()
      }.toMap
    } else {
      val content = lines.mkString("\n")
      // strict single-document parse: trailing concatenated objects are
      // an error, not silently ignored
      val parser = mapper.getFactory.createParser(content)
      val node = mapper.readTree[com.fasterxml.jackson.databind.JsonNode](parser)
      require(parser.nextToken() == null,
        s"trailing content after the vocab object in $path")
      require(node != null && node.isObject,
        s"vocab file $path is neither token/id JSONL nor a JSON object")
      val it = node.fields()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      while (it.hasNext) {
        val e = it.next()
        require(e.getValue.isIntegralNumber,
          s"non-integer id for token '${e.getKey}' in $path")
        buf += (e.getKey -> e.getValue.asInt)
      }
      buf.toMap
    }
  }

  /** Write merges in the public format (round-trips [[loadMerges]]). */
  def saveMerges(
      spark: SparkSession, path: String, merges: Seq[(String, String)]): Unit =
    writeText(spark, path,
      ("#version: 0.2" +: merges.map { case (a, b) => s"$a $b" })
        .mkString("", "\n", "\n"))

  /** Write a vocab as JSONL (round-trips [[loadVocab]]). */
  def saveVocab(
      spark: SparkSession, path: String, vocab: Map[String, Int]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    writeText(spark, path,
      vocab.toSeq.sortBy(_._2).map { case (t, i) =>
        val n = mapper.createObjectNode()
        n.put("token", t); n.put("id", i)
        mapper.writeValueAsString(n)
      }.mkString("", "\n", "\n"))
  }

  private def writeText(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
