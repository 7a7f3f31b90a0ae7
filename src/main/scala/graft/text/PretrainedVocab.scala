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

  /** Load a merges.txt: `"a b"` per line in priority order. Lines that are
    * blank, `#`-comments, or the `#version` header are skipped; a line
    * with anything but exactly two space-separated symbols is an error
    * (silently mis-splitting a merge table corrupts every encoding after
    * it).
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    readLines(spark, path)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        l.split(" ", -1) match {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
          case _ => throw new IllegalArgumentException(
            s"malformed merges line '$l' in $path (expected 'a b')")
        }
      }

  /** Load a vocab file: either ONE JSON object `{token: id, ...}`
    * (the classic vocab.json) or JSONL with `{"token": ..., "id": ...}`
    * rows — distinguished by the first non-blank character sequence
    * parsing as a complete object per line or not.
    */
  def loadVocab(spark: SparkSession, path: String): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = readLines(spark, path).filterNot(_.trim.isEmpty)
    def entries(node: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Int)] = {
      val it = node.fields()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue.asInt) }
      buf.toSeq
    }
    val isJsonl = lines.size > 1 ||
      (lines.size == 1 && lines.head.trim.startsWith("{\"token\""))
    if (isJsonl && lines.forall(l => l.trim.startsWith("{") && l.trim.endsWith("}"))
        && mapper.readTree(lines.head).has("token")) {
      lines.map { l =>
        val n = mapper.readTree(l)
        require(n.has("token") && n.has("id"),
          s"JSONL vocab row missing token/id in $path: $l")
        n.get("token").asText() -> n.get("id").asInt()
      }.toMap
    } else {
      entries(mapper.readTree(lines.mkString("\n"))).toMap
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
