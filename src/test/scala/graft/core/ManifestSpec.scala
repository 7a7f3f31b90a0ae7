package graft.core

import graft.SparkSpec
import graft.pipes._

class ManifestSpec extends SparkSpec {

  private def tree: Pipe = SequentialPipe(Seq(
    graft.llm.TextNormalizePipe("text"),
    graft.llm.ExactDedupPipe(Seq("text_norm"), "doc_id")))

  test("manifest json is deterministic and carries the cache-key fingerprint") {
    val a = Manifest.json(tree)
    val b = Manifest.json(tree)
    assert(a == b)
    // root fingerprint in the manifest IS Pipe.fingerprint (the
    // CachedStage key basis) — auditable without re-instantiating
    assert(a.contains(tree.fingerprint))
    // children render nested, params sorted
    assert(a.contains("\"TextNormalizePipe\"") &&
      a.contains("\"ExactDedupPipe\""))
    val json = a
    // structurally valid JSON (cheap check: balanced braces/brackets)
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.count(_ == '[') == json.count(_ == ']'))
  }

  test("outline is one line per node with fingerprint prefixes") {
    val o = Manifest.outline(tree)
    val lines = o.linesIterator.toSeq
    assert(lines.length == 3) // Sequential + 2 children
    assert(lines(0).startsWith("SequentialPipe @"))
    assert(lines(1).trim.startsWith("TextNormalizePipe @"))
    assert(lines(2).trim.startsWith("ExactDedupPipe @"))
    // a param change changes the child fingerprint shown
    val o2 = Manifest.outline(SequentialPipe(Seq(
      graft.llm.TextNormalizePipe("text", stripPunct = false),
      graft.llm.ExactDedupPipe(Seq("text_norm"), "doc_id"))))
    assert(o != o2)
  }
}
