package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the input string-array's elements that are members of a
  * fixed key set — the exact-membership workhorse behind the
  * decontamination paths once the eval n-gram set outgrows an in-plan
  * literal.
  *
  * The relational alternatives are per-row linear in |keys|:
  * `arrays_overlap(doc, lit(keys))` scans the literal until a hit (a
  * CLEAN doc walks all of it) and `size(array_intersect(doc,
  * lit(keys)))` builds a |keys|-entry hash set PER ROW (measured 1.25
  * s·core/doc at 1M keys). Here each row pays O(#docGrams) hash
  * lookups, independent of |keys|.
  *
  * Memory shape — the part that actually bites at 1M keys: the keys
  * ride in a [[Broadcast]] (ONE torrent-fetched copy per executor JVM;
  * embedding the array in the expression would deserialize a private
  * copy PER TASK — 32 concurrent tasks × ~350 MB built sets OOM'd an
  * 8 GiB local run), and the built UTF8String hash set is shared
  * across tasks through a broadcast-id-keyed JVM cache, so an executor
  * holds exactly one set per distinct eval corpus regardless of
  * task/stage count.
  *
  * Membership is UTF8String byte equality — exactly Spark's string
  * equality, so `count > 0` ≡ `arrays_overlap` and, over a DISTINCT
  * input array, `count` ≡ `size(array_intersect)` bit-for-bit. NULL
  * array elements never match (the relational twins skip them too).
  */
case class StringSetCountExpr(
    child: Expression,
    keys: Broadcast[Array[String]],
    keysFp: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "string_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    StringSetCountExpr.setFor(keys)

  /** Plan strings / canonicalization must not render (or hash) a
    * million keys — the content fingerprint stands in (the
    * [[BloomGramPositionsExpr]] convention). The broadcast id rides
    * along so canonical equality never merges two expressions probing
    * DIFFERENT key sets on a 64-bit fp collision: same broadcast ⇒
    * same set by construction, and common-subexpression reuse within a
    * plan (one pipe, one broadcast) still fires.
    */
  override def flatArguments: Iterator[Any] = Iterator(child, keysFp, keys.id)
  override def stringArgs: Iterator[Any] =
    Iterator(child, f"fp=$keysFp%016x")

  def count(arr: ArrayData): Int = {
    val s = set
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && s.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setCountExpr", this,
      classOf[StringSetCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StringSetCountExpr =
    copy(child = newChild)
}

object StringSetCountExpr {
  /** One built set per (JVM, broadcast), shared by every task of every
    * stage that probes it. Keyed by the BROADCAST id, not the content
    * fingerprint: a broadcast id is unique per SparkContext by
    * construction, so two distinct eval corpora can never alias one
    * cache slot (a 64-bit fp collision would serve the WRONG membership
    * set — silently wrong flags), while every expression holding the
    * same broadcast — all tasks, all stages — still shares one built
    * set. Bounded by LRU: a JVM juggling more than [[MaxCachedSets]]
    * DISTINCT broadcasts evicts only the least-recently-USED entry (a
    * multi-tenant decontamination service rotating 9 eval corpora
    * rebuilds one ~1M-key set per rotation, not all 8 — the ADVICE r18
    * clear-all thrash), so a long-lived executor can't accrete
    * unbounded eval sets while hot sets stay built. An evicted set
    * rebuilds from the broadcast on demand — a re-hash, never a
    * correctness event.
    */
  val MaxCachedSets = 8
  // access-order LinkedHashMap = the LRU; all access under its monitor
  // (lookups are O(1) and rare — once per task at codegen-reference
  // resolution, not per row), set BUILDS happen outside the lock so a
  // slow 1M-key build never serializes other corpora's lookups (two
  // tasks racing the same absent id may both build; first put wins)
  private val cache =
    new java.util.LinkedHashMap[Long, java.util.HashSet[UTF8String]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, java.util.HashSet[UTF8String]]): Boolean =
        size() > MaxCachedSets
    }

  private[graft] def setFor(
      keys: Broadcast[Array[String]]): java.util.HashSet[UTF8String] = {
    val hit = cache.synchronized(cache.get(keys.id))
    if (hit != null) return hit
    val ks = keys.value
    val built = new java.util.HashSet[UTF8String](
      math.max(16, (ks.length / 0.75).toInt + 1))
    var i = 0
    while (i < ks.length) {
      built.add(UTF8String.fromString(ks(i)))
      i += 1
    }
    cache.synchronized {
      val again = cache.get(keys.id)
      if (again != null) again
      else { cache.put(keys.id, built); built }
    }
  }

  /** FNV-1a over the keys — the content fingerprint plan strings and
    * pipe fingerprints carry instead of the key text. Each key's LENGTH
    * is folded in ahead of its characters as a FIXED-WIDTH 4-byte
    * little-endian prefix, so key boundaries are unambiguous:
    * `["foo" + U+001F + "bar"]` and `["foo","bar"]` hash apart. Fixed
    * width matters: a variable-width length (dropping leading zero
    * bytes) aliases its own bytes with the character stream — e.g. a
    * length byte 0x1f is indistinguishable from a U+001F character, a
    * collision the ADVICE r18 review demonstrated — while a fixed
    * 4-byte prefix makes the encoding prefix-free (Int lengths cannot
    * exceed 4 bytes). Display/fingerprint only — set identity is the
    * broadcast id, never this hash.
    */
  def fingerprint(keys: Seq[String]): Long = {
    var h = 0xcbf29ce484222325L
    keys.foreach { k =>
      var shift = 0
      while (shift < 32) {
        h = (h ^ ((k.length >>> shift) & 0xff)) * 0x100000001b3L
        shift += 8
      }
      var i = 0
      while (i < k.length) { h = (h ^ k.charAt(i)) * 0x100000001b3L; i += 1 }
    }
    h
  }
}
