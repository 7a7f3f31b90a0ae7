package graft.core

import java.security.MessageDigest

/** Deterministic content-hashing for pipes and cached stages.
  *
  * Mirrors the reference's `Fingerprintable` scheme (recursive hash of a
  * JSON-like struct of the object tree: class name + sorted params + child
  * fingerprints — reference: warp_pipes/core/fingerprintable.py:142-156,
  * warp_pipes/support/fingerprint.py:19-87) without any pickle/dill
  * machinery: pipe parameters are restricted to stringly-typed primitives so
  * hashing is trivially stable across JVMs and runs.
  */
object Fingerprint {

  /** Stable 16-hex-char digest of a string (first 8 bytes of SHA-256). */
  def hash(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Hash of a (class name, params, children) struct — the recursive scheme.
    * Params are sorted by key so map ordering never leaks into the hash.
    */
  def ofStruct(
      className: String,
      params: Map[String, String],
      childFingerprints: Seq[String] = Nil): String = {
    val p = params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString(",")
    hash(s"$className{$p}[${childFingerprints.mkString(",")}]")
  }

  /** Combine an upstream (data) fingerprint with a pipe fingerprint —
    * the dataset-level cache key (reference: core/pipe.py:223-243).
    */
  def combine(fps: String*): String = hash(fps.mkString("|"))
}
