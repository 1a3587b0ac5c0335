package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Kernel exactness against values pinned from a direct C compilation of
  * the reference permutation algorithm (`postgeoda/src/proxy.cpp:350-458`)
  * on the FIXTURES.md §6 toy graphs.
  */
class LisaKernelsSpec extends AnyFunSuite {
  private def scratch(n: Int) = new LisaKernels.Scratch(n, 16)

  test("path-graph toy: I and p match C reference (seed 123456789, 99 perms)") {
    val z = Array(-1.0, 0.0, 1.0)
    val nbrs = Array(Array(1), Array(0, 2), Array(1))
    val s = scratch(3)
    val r0 = LisaKernels.moran(0, nbrs(0), z, 99, 123456789, 0.05, s)
    val r1 = LisaKernels.moran(1, nbrs(1), z, 99, 123456789, 0.05, s)
    val r2 = LisaKernels.moran(2, nbrs(2), z, 99, 123456789, 0.05, s)
    assert(r0.stat == -0.0 && r0.p == 0.37)
    assert(r1.stat == 0.0 && r1.p == 0.01)
    assert(r2.stat == 0.0 && r2.p == 0.34999999999999998)
  }

  test("ring-graph toy: I and p match C reference (999 perms)") {
    val v = Array.tabulate(10)(_.toDouble)
    graft.core.Stat0.standardize(v)
    val expI = Array(-0.24545454545454531, 1.3363636363636362,
      0.68181818181818188, 0.24545454545454545, 0.027272727272727268,
      0.027272727272727268, 0.24545454545454545, 0.68181818181818188,
      1.3363636363636362, -0.24545454545454531)
    val expP = Array(0.48599999999999999, 0.027, 0.063, 0.223, 0.442,
      0.42899999999999999, 0.21199999999999999, 0.071999999999999995,
      0.029000000000000001, 0.48299999999999998)
    val s = scratch(10)
    for (i <- 0 until 10) {
      val nb = Array((i + 9) % 10, (i + 1) % 10)
      val r = LisaKernels.moran(i, nb, v, 999, 123456789, 0.05, s)
      assert(r.stat == expI(i), s"I at $i")
      assert(r.p == expP(i), s"p at $i")
    }
  }

  test("moran cluster labels") {
    val z = Array(2.0, 1.5, -2.0, -1.5, 0.1)
    val s = scratch(5)
    // neighborless
    assert(LisaKernels.moran(0, Array.empty, z, 99, 1, 0.05, s).c == 5.0)
    // HH quadrant when significant: force cutoff=1.0 so any p passes
    val hh = LisaKernels.moran(0, Array(1), z, 99, 1, 1.0, s)
    assert(hh.c == 1.0)
    val ll = LisaKernels.moran(2, Array(3), z, 99, 1, 1.0, s)
    assert(ll.c == 2.0)
    val lh = LisaKernels.moran(2, Array(1), z, 99, 1, 1.0, s)
    assert(lh.c == 3.0)
    val hl = LisaKernels.moran(0, Array(3), z, 99, 1, 1.0, s)
    assert(hl.c == 4.0)
  }

  test("local G and G* formulas") {
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val sum = 10.0
    val s = scratch(4)
    val g = LisaKernels.localG(0, Array(1, 2), x, sum, 99, 1, 1.0, s)
    assert(g.stat == (2.0 + 3.0) / (10.0 - 1.0))
    val gs = LisaKernels.localGStar(0, Array(1, 2), x, sum, 99, 1, 1.0, s)
    assert(gs.stat == (2.0 + 3.0 + 1.0) / 10.0)
  }

  test("geary formula: mean squared z-difference over neighbors") {
    val z = Array(-1.0, 0.0, 1.0)
    val s = scratch(3)
    val r = LisaKernels.geary(1, Array(0, 2), z, 99, 1, 1.0, s)
    assert(r.stat == ((0.0 - (-1.0)) * (0.0 - (-1.0)) + (0.0 - 1.0) * (0.0 - 1.0)) / 2)
  }

  test("join count: p only for x=1 rows") {
    val x = Array(1.0, 1.0, 0.0, 1.0)
    val s = scratch(4)
    val r1 = LisaKernels.joinCount(0, Array(1, 3), x, 99, 123456789, s)
    assert(r1.stat == 2.0 && r1.c == 2.0 && r1.p > 0)
    val r0 = LisaKernels.joinCount(2, Array(0, 1), x, 99, 123456789, s)
    assert(r0.stat == 0.0 && r0.p == -1.0)
  }

  test("permutation determinism: same seed+idx → same p at any call order") {
    val z = Array.tabulate(50)(i => math.sin(i.toDouble))
    val s1 = scratch(50); val s2 = scratch(50)
    val nb = Array(3, 7, 11)
    val a = LisaKernels.moran(5, nb, z, 999, 42, 0.05, s1)
    // interleave other rows on scratch s2 then recompute row 5
    LisaKernels.moran(9, Array(1, 2), z, 999, 42, 0.05, s2)
    LisaKernels.moran(17, Array(30), z, 999, 42, 0.05, s2)
    val b = LisaKernels.moran(5, nb, z, 999, 42, 0.05, s2)
    assert(a == b)
  }

  test("geary cluster rule: permutation-mean split makes all labels reachable") {
    // mixed-sign positive association → Other Positive (3): zi=0.1 sits
    // close to its (negative) neighbors, everything else is far away, so
    // c_i << E_perm[c_i] while the quadrant is mixed-sign
    val z1 = Array(0.1, -0.05, -0.05) ++
      Array.tabulate(17)(i => if (i % 2 == 0) 2.0 else -2.0)
    val r3 = LisaKernels.geary(0, Array(1, 2), z1, 999, 123456789, 0.05,
      scratch(z1.length))
    assert(r3.p <= 0.05 && r3.c == 3.0, s"got $r3")
    // negative association (4): zi far from its neighbors relative to the
    // permutation distribution → c_i > E_perm[c_i]
    val z2 = Array(3.0, -3.0, -3.0) ++ Array.tabulate(17)(i => (i % 5) * 0.01)
    val r4 = LisaKernels.geary(0, Array(1, 2), z2, 999, 123456789, 0.05,
      scratch(z2.length))
    assert(r4.p <= 0.05 && r4.c == 4.0, s"got $r4")
    // HH (1): positive z tightly matched by positive neighbors
    val z3 = Array(2.0, 2.01, 1.99) ++
      Array.tabulate(17)(i => if (i % 2 == 0) -2.0 else 0.5)
    val r1 = LisaKernels.geary(0, Array(1, 2), z3, 999, 123456789, 0.05,
      scratch(z3.length))
    assert(r1.p <= 0.05 && r1.c == 1.0, s"got $r1")
  }

  test("lookup table: deterministic, distinct, self-skipped draws") {
    val lt = new LisaKernels.LookupTable(100, 8, 99, 123456789)
    val lt2 = new LisaKernels.LookupTable(100, 8, 99, 123456789)
    assert(lt.table.sameElements(lt2.table))
    // each permutation's k entries are distinct and within [0, numObs-2]
    for (p <- 0 until 99) {
      val row = lt.table.slice(p * 8, p * 8 + 8)
      assert(row.distinct.length == 8)
      assert(row.forall(v => v >= 0 && v <= 98))
    }
    // self-skip shift (>= idx → +1) keeps draws distinct and never self:
    // verified through a kernel run with lookup scratch
    val z = Array.tabulate(100)(i => math.cos(i.toDouble))
    val s = new LisaKernels.Scratch(100, 16, lt)
    val r = LisaKernels.moran(50, Array(49, 51), z, 99, 123456789, 0.05, s)
    assert(!r.p.isNaN && r.p > 0)
  }
}
