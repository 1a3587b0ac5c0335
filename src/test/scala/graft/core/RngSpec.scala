package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact parity with the reference's ThomasWangHashDouble
  * (`postgeoda/src/proxy.cpp:339-348`). Expected values pinned from a
  * direct C compilation of the reference code.
  */
class RngSpec extends AnyFunSuite {
  test("thomasWangHashDouble matches C reference bit-for-bit") {
    assert(Rng.thomasWangHashDouble(0L) == 4.68011971315817010e-01)
    assert(Rng.thomasWangHashDouble(1L) == 3.58558440980761506e-01)
    assert(Rng.thomasWangHashDouble(42L) == 5.95355143582147958e-02)
    assert(Rng.thomasWangHashDouble(123456789L) == 8.98909580344706582e-01)
    assert(Rng.thomasWangHashDouble(123456790L) == 2.53535910591215830e-01)
    // full-width unsigned: 2^64-1 as Long is -1
    assert(Rng.thomasWangHashDouble(-1L) == 1.23186137119371542e-01)
    assert(Rng.thomasWangHashDouble(9999999999L) == 2.75029903047058419e-02)
  }

  test("roundHalfAway matches C (int)(v<0?ceil(v-.5):floor(v+.5))") {
    assert(Rng.roundHalfAway(0.5) == 1)
    assert(Rng.roundHalfAway(-0.5) == -1)
    assert(Rng.roundHalfAway(1.4999) == 1)
    assert(Rng.roundHalfAway(2.5) == 3)
    assert(Rng.roundHalfAway(-2.5) == -3)
    assert(Rng.roundHalfAway(0.0) == 0)
  }

  test("draw loop replicates reference rejection sampling (C-pinned)") {
    // seed 123456789, num_obs=3, idx=0: C trace gives candidates
    // 2,1,0,2,0 — first draw of 1 id accepts 2
    val work = new Rng.IntSet(3)
    val out = new Array[Int](2)
    val seedAfter = Rng.drawDistinct(123456789, 3, 0, 1, work, out)
    assert(out(0) == 2)
    assert(seedAfter == 123456790)
    // drawing 2 distinct ids for idx=0: candidates 2 then 1
    val seed2 = Rng.drawDistinct(123456789, 3, 0, 2, work, out)
    assert(out.take(2).toSet == Set(2, 1))
    assert(seed2 == 123456791)
  }
}
