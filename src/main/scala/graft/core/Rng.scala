package graft.core

/** Deterministic RNG primitives replicating the reference's permutation
  * scheme (cuulee/postgeoda `postgeoda/src/proxy.cpp:339-348`, the
  * ThomasWangHashDouble integer hash). Pure functions — safe to call from
  * any executor thread; the per-row seed (`seed + rowIdx`) makes every
  * observation's permutation stream independent of partitioning, which is
  * what lets the permutation stage run shuffle-free and bit-deterministic
  * on a cluster of any size.
  */
object Rng {

  /** Exact C `(double)(uint64_t)x` conversion (single rounding).
    * Uses the round-to-odd ("sticky low bit") trick so the 63-bit
    * intermediate rounds identically to a direct 64-bit conversion.
    */
  @inline def u64ToDouble(x: Long): Double =
    if (x >= 0L) x.toDouble
    else ((x >>> 1) | (x & 1L)).toDouble * 2.0

  /** Thomas Wang 64-bit mix hash mapped to [0,1).
    * Bit-for-bit the reference's `ThomasWangHashDouble`
    * (`postgeoda/src/proxy.cpp:339-348`): Scala `Long` ops are the same
    * two's-complement ops as C `uint64_t`.
    */
  def thomasWangHashDouble(key0: Long): Double = {
    var key = key0
    key = (~key) + (key << 21)
    key = key ^ (key >>> 24)
    key = (key + (key << 3)) + (key << 8)
    key = key ^ (key >>> 14)
    key = (key + (key << 2)) + (key << 4)
    key = key ^ (key >>> 28)
    key = key + (key << 31)
    5.42101086242752217e-20 * u64ToDouble(key)
  }

  /** C `int` round-half-away-from-zero used by the reference when mapping
    * the hash to an observation id (`proxy.cpp:420`).
    */
  @inline def roundHalfAway(v: Double): Int =
    (if (v < 0.0) math.ceil(v - 0.5) else math.floor(v + 0.5)).toInt

  /** Membership-tracked int set with O(1) Belongs/Push, replicating
    * libgeoda's `GeoDaSet` rejection-sampling helper [public].
    * Not thread-safe; allocate one per kernel invocation.
    */
  final class IntSet(capacity: Int) {
    private val flags = new Array[Boolean](capacity)
    private val stack = new Array[Int](capacity)
    private var top = 0
    @inline def belongs(v: Int): Boolean = flags(v)
    @inline def push(v: Int): Unit =
      if (!flags(v)) { stack(top) = v; top += 1; flags(v) = true }
    @inline def size: Int = top
    /** Empty the set, writing members into `out(0..size-1)`. */
    def drainTo(out: Array[Int]): Int = {
      val n = top
      var i = 0
      while (i < n) { val v = stack(i); out(i) = v; flags(v) = false; i += 1 }
      top = 0
      n
    }
  }

  /** Draw `nDraw` distinct ids from [0, numObs-1] excluding `selfIdx`,
    * advancing the integer seed counter exactly as the reference does
    * (`proxy.cpp:415-429`: one hash per attempt, rejection on self or
    * duplicate). Returns the new counter value; ids land in `out`.
    * The counter is C `int` — kept as Int to replicate overflow behavior;
    * the hash sees the sign-extended 64-bit value, identical to C's
    * int→uint64_t conversion.
    */
  def drawDistinct(seedStart: Int, numObs: Int, selfIdx: Int, nDraw: Int,
                   work: IntSet, out: Array[Int]): Int = {
    if (nDraw <= 32) {
      // duplicate check by linear scan of the drawn-so-far array: the
      // same accept/reject sequence as GeoDaSet membership, without the
      // O(numObs) flags array (whose random access is a guaranteed cache
      // miss per draw at web scale)
      val maxRand = numObs - 1
      var seed = seedStart
      var got = 0
      while (got < nDraw) {
        val rng = thomasWangHashDouble(seed.toLong) * maxRand
        seed += 1
        val cand = roundHalfAway(rng)
        if (cand != selfIdx) {
          var dup = false
          var j = 0
          while (j < got) { if (out(j) == cand) { dup = true; j = got } else j += 1 }
          if (!dup) { out(got) = cand; got += 1 }
        }
      }
      seed
    } else {
      val maxRand = numObs - 1
      var seed = seedStart
      var got = 0
      while (got < nDraw) {
        val rng = thomasWangHashDouble(seed.toLong) * maxRand
        seed += 1
        val cand = roundHalfAway(rng)
        if (cand != selfIdx && !work.belongs(cand)) {
          work.push(cand)
          got += 1
        }
      }
      work.drainTo(out)
      seed
    }
  }
}
