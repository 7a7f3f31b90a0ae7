package graft.core

/** Reproducibility manifest for a pipe tree: the full lineage —
  * name, parameters, per-node and root fingerprints — rendered as
  * deterministic JSON. This is the operational answer to "what exactly
  * produced this dataset?": persist the manifest next to the output
  * (or compare two manifests) and a re-run is byte-auditable before a
  * single row is read, because the root fingerprint is the same value
  * [[CachedStage]] keys persisted state on.
  *
  * Rendering is pure driver-side string work over the existing
  * [[Pipe.fingerprint]] tree — no Spark jobs, no data access.
  */
object Manifest {

  /** Deterministic JSON for the pipe tree (keys sorted, stable child
    * order — two structurally-equal pipes render identical text).
    */
  def json(p: Pipe): String = render(p, 0)

  /** One line per node: `indent name fingerprint-prefix key=value ...` —
    * the human-scan form for logs and review comments.
    */
  def outline(p: Pipe): String = {
    def walk(n: Pipe, depth: Int): Seq[String] = {
      val ps = n.params.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      val head = ("  " * depth) + n.name + " @" + n.fingerprint.take(12) +
        (if (ps.isEmpty) "" else ps.mkString(" [", " ", "]"))
      head +: n.children.flatMap(walk(_, depth + 1))
    }
    walk(p, 0).mkString("\n")
  }

  private def render(p: Pipe, depth: Int): String = {
    val pad = "  " * depth
    val pad1 = "  " * (depth + 1)
    val params = p.params.toSeq.sorted
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val kids =
      if (p.children.isEmpty) "[]"
      else p.children.map(render(_, depth + 1))
        .mkString("[\n", ",\n", s"\n$pad1]")
    s"""$pad{
       |$pad1"name": ${q(p.name)},
       |$pad1"fingerprint": ${q(p.fingerprint)},
       |$pad1"params": $params,
       |$pad1"children": $kids
       |$pad}""".stripMargin
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
