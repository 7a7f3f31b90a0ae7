package graft.llm

/** Automatic SRP/LSH signature-layout sizing from the corpus count.
  *
  * Band-candidate volume grows with bucket occupancy² where occupancy is
  * `n / 2^r` (r = bits per band) — the knob that was hand-fixed twice
  * after superlinear walls (16/4 at 20k vectors in r8, 60/6 at the
  * 200k-vector audit in r14). This helper computes the layout from `n`
  * instead of leaving the wall to be rediscovered: pick the smallest
  * valid r whose expected occupancy is at or under `targetOccupancy`
  * (default 1 — candidate volume then stays ~linear in n).
  *
  * Layout validity mirrors [[SRPCosineDedupPipe]]'s constraints:
  * narrow layouts (nBits <= 62, one long) keep the historical 60/6
  * default as their FLOOR so existing persisted signature caches and
  * oracles replay unchanged; wide layouts pack 60-bit words, so r must
  * divide 60 — the ladder is 10, 12, 15, 20, 30, 60 bits per band
  * (with 6 bands: 60, 72, 90, 120, 180, 360-bit signatures; 2^60
  * buckets per band covers any corpus).
  */
object SrpLayout {

  /** A valid SRP signature layout (satisfies the pipe's requires). */
  final case class Layout(nBits: Int, bands: Int, maxHamming: Int) {
    def bitsPerBand: Int = nBits / bands
    def wide: Boolean = nBits > 62
  }

  /** r ladder: 10 is the historical narrow floor (60/6); every wider
    * step divides 60 so no band spans a packed-word boundary.
    */
  private val ladder = Seq(10, 12, 15, 20, 30, 60)

  /** Bits per band for `n` vectors at `targetOccupancy` expected rows
    * per bucket: the smallest ladder step with `n / 2^r <=` target.
    */
  def bitsPerBand(n: Long, targetOccupancy: Double = 1.0): Int = {
    require(n >= 0, "corpus count must be non-negative")
    require(targetOccupancy > 0, "target occupancy must be positive")
    val needed =
      if (n == 0) 0
      else math.ceil(math.log(n / targetOccupancy) / math.log(2)).toInt
    ladder.find(_ >= needed).getOrElse(ladder.last)
  }

  /** Full layout for `n` vectors: `bands * r` bits, `maxHamming =
    * bands - 1` (the pigeonhole-exact maximum).
    */
  def forCorpus(n: Long, bands: Int = 6, targetOccupancy: Double = 1.0): Layout = {
    require(bands >= 2, "need at least 2 bands for pigeonhole recall")
    val r = bitsPerBand(n, targetOccupancy)
    Layout(r * bands, bands, bands - 1)
  }

  /** Layout capped to a single-long signature (nBits <= 62) for
    * consumers that need one — the occupancy-chosen r capped at
    * `62 / bands`. [[graft.search.LSHDenseEngine]] reads the packed wide
    * layouts natively since r16, so its `sized` uses [[forCorpus]]; this
    * stays for callers that pin the narrow representation.
    */
  def forCorpusNarrow(n: Long, bands: Int = 6, targetOccupancy: Double = 1.0): Layout = {
    require(bands >= 2, "need at least 2 bands for pigeonhole recall")
    val r = math.min(bitsPerBand(n, targetOccupancy), 62 / bands)
    Layout(r * bands, bands, bands - 1)
  }
}
